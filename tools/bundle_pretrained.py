"""Bundle a trained checkpoint into the in-package pretrained registry.

The reference ships named pretrained weights inside the package
(``/root/reference/graphs4cfd/nn/mus_gnn.py:43-48`` → ``nn/weights/``);
its own binaries are Git-LFS stubs upstream, so this framework bundles
checkpoints *it trained itself* (the synthetic-advection and
Taylor–Green capability models) under framework-native version names.

Strips the optimiser state and re-saves arrays as float32 NumPy so the
bundled file is inference-sized.

Usage: python tools/bundle_pretrained.py <src.chk> <relpath-under-weights>
e.g.   python tools/bundle_pretrained.py synthadv.chk \
           AdvMuSGNN/AdvOneScaleGNN_synthadv_tpu.chk
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bundle(src: str, relpath: str) -> str:
    from graphs4cfd_tpu.training.checkpoint import (load_checkpoint,
                                                    save_checkpoint)
    from graphs4cfd_tpu.nn.model import bundled_checkpoint_path
    state = load_checkpoint(src)
    dst = bundled_checkpoint_path(relpath)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    save_checkpoint(dst, arch=state["arch"], weights=state["weights"],
                    opt_state=None, n_out=state.get("n_out", 1),
                    lr=state.get("lr"), epoch=state.get("epoch", 0))
    return dst


if __name__ == "__main__":
    print("bundled:", bundle(sys.argv[1], sys.argv[2]))
