"""REMuS step-time attribution (profiling only; results in BASELINE.md).

Variants at the bench_families REMuS workload (batch 4 x 5000 nodes, k=5):

* ``l1only``   — 1-level graph + 8 L1 EdgeMP layers + encoders/decoder
                 (drops down/up/L2/L3 entirely).
* ``l1noasg``  — ``l1only`` with GRAPHS4CFD_ABLATE=zero_vsg set *before*
                 launch (drops the angle-source gather; numerics wrong,
                 timing attribution only).

The full 3-scale baseline comes from tools/bench_families.py.
Usage: [GRAPHS4CFD_ABLATE=zero_vsg] python tools/bench_remus_ablate.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp
    import graphs4cfd_tpu as gfd
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.loader import collate
    from graphs4cfd_tpu.nn.losses import GraphLoss
    from graphs4cfd_tpu.utils import Compose
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_families", os.path.join(os.path.dirname(__file__),
                                       "bench_families.py"))
    bf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bf)

    rng = np.random.default_rng(0)
    W = 128
    emp = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))

    def cloud(n, nf, n_in=1):
        g = Graph()
        g.pos = (rng.random((n, 2)) * np.array([4.0, 2.0])).astype(np.float32)
        g.glob = np.full((n, 1), 0.5, np.float32)
        g.field = rng.normal(size=(n, nf * n_in)).astype(np.float32)
        g.target = rng.normal(size=(n, nf * 10)).astype(np.float32)
        g.omega = (rng.random((n, 1)) < 0.1).astype(np.float32)
        g.bound = np.zeros(n, np.uint8)
        return g

    log("REMuS L1-only (8 EdgeMP layers), batch 4 x 5000, k=5, ablate=%r"
        % os.environ.get("GRAPHS4CFD_ABLATE", ""))
    tf = Compose([T.SpatialSort(),
                  T.BuildRemusGraph(num_levels=1, k=5,
                                    scale_edge_length=(0.1,))])
    gs = [tf(cloud(5000, 2, n_in=1)) for _ in range(4)]
    batch = collate(gs, node_bucket=512, edge_bucket=1024)
    arch = {
        "angle_encoder": (4, (W, W), True),
        "edge_encoder": (3, (W, W), True),
        "mp111": emp, "mp112": emp, "mp113": emp, "mp114": emp,
        "mp121": emp, "mp122": emp, "mp123": emp, "mp124": emp,
        "decoder": (W, (W, 1), False),
    }
    model = gfd.nn.REMuSGNN(arch=arch, compute_dtype=jnp.bfloat16)
    dt = bf.bench_step(model, batch, GraphLoss())
    edges = int(np.asarray(batch.edge_mask).sum())
    log(f"  L1-only: {dt*1e3:.1f} ms/step, {edges/dt:.3e} edges/s")
    print('{"metric": "remus_l1only_step_ms", "value": %.2f}' % (dt * 1e3))


if __name__ == "__main__":
    main()
