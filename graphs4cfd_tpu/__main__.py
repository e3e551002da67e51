"""Thin CLI for the framework (the reference has none — SURVEY §5 config).

Usage:
    python -m graphs4cfd_tpu info
    python -m graphs4cfd_tpu bench
    python -m graphs4cfd_tpu scaling [--devices N]
    python -m graphs4cfd_tpu convert SRC.chk DST.chk
    python -m graphs4cfd_tpu train SCRIPT.py
"""
from __future__ import annotations

import argparse
import runpy
import sys


def cmd_info(_args):
    import jax
    import graphs4cfd_tpu as gfd
    print(f"graphs4cfd_tpu {gfd.__version__}")
    print(f"jax {jax.__version__}, backend: {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device: {d.platform} {getattr(d, 'device_kind', '')}")
    from graphs4cfd_tpu.config import pallas_enabled
    print(f"pallas fused kernels: {pallas_enabled()}")
    try:
        from graphs4cfd_tpu import native
        print(f"native C++ kernels: {native.knn_neighbors is not None}")
    except Exception:
        print("native C++ kernels: unavailable")


def cmd_bench(_args):
    import bench
    bench.main()


def cmd_scaling(args):
    import bench_scaling
    bench_scaling.main(args.devices)


def cmd_convert(args):
    from graphs4cfd_tpu.training.checkpoint import convert_reference_checkpoint
    out = convert_reference_checkpoint(args.src, args.dst)
    print(f"converted {args.src} -> {args.dst} "
          f"({len(out['arch'])} arch entries)")


def cmd_train(args):
    sys.argv = [args.script] + args.rest
    runpy.run_path(args.script, run_name="__main__")


def main():
    p = argparse.ArgumentParser(prog="graphs4cfd_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("info", help="environment and build info")
    sub.add_parser("bench", help="headline TPU benchmark (one JSON line)")
    sp = sub.add_parser("scaling", help="multi-device scaling benchmark")
    sp.add_argument("--devices", type=int, default=None)
    sp = sub.add_parser("convert",
                        help="convert a reference PyTorch .chk checkpoint")
    sp.add_argument("src")
    sp.add_argument("dst")
    sp = sub.add_parser("train", help="run a training script")
    sp.add_argument("script")
    sp.add_argument("rest", nargs="*")
    args = p.parse_args()
    {"info": cmd_info, "bench": cmd_bench, "scaling": cmd_scaling,
     "convert": cmd_convert, "train": cmd_train}[args.cmd](args)


if __name__ == "__main__":
    main()
