"""Probe: does Mosaic compile a dynamic row-gather from VMEM?

Tries ``table[idx]`` (jnp.take along axis 0) inside a Pallas TPU kernel,
with a VMEM-resident table and an int32 index vector.  If this lowers, the
sender gather can move inside the fused GN-block kernel (windowed via
scalar prefetch); if not, the gather stays an XLA op.  Result recorded in
BASELINE.md's optimisation ledger either way.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    W, B, H = 1024, 256, 128   # window rows, gathered rows, features

    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]                       # [B, 1] int32 in VMEM
        idx2 = jnp.broadcast_to(idx, (B, H))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx2, axis=0)

    table = jnp.asarray(np.random.default_rng(0).normal(
        size=(W, H)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(
        0, W, size=(B, 1)).astype(np.int32))

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
    )
    try:
        t0 = time.time()
        out = fn(table, idx)
        ok = np.allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])
        print(f"dynamic VMEM row-gather: COMPILES in {time.time()-t0:.1f}s, "
              f"correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"dynamic VMEM row-gather: FAILS — {type(e).__name__}: "
              f"{str(e)[:500]}")

    # If it works, time it against the XLA gather at workload scale.
    V, E = 40960, 245760
    vs = jnp.asarray(np.random.default_rng(2).normal(
        size=(V, H)).astype(np.float32)).astype(jnp.bfloat16)
    snd = jnp.asarray(np.random.default_rng(3).integers(
        0, V, size=E).astype(np.int32))
    # time only via a scalar host transfer (the axon tunnel's
    # block_until_ready is unreliable; a full-array transfer would swamp
    # the measurement) — chain N dependent gathers inside one jit.
    N = 40

    def chained(a, i):
        s = jnp.bfloat16(0)
        for _ in range(N):
            r = (a + s)[i]
            s = r[0, 0]
        return s

    def baseline(a, i):
        # same scalar-dependency chain without the gather
        s = jnp.bfloat16(0)
        for _ in range(N):
            r = a + s
            s = r[0, 0]
        return s

    for name, fn in [("gather+add", chained), ("add only", baseline)]:
        f = jax.jit(fn)
        _ = float(f(vs, snd))
        t0 = time.time()
        _ = float(f(vs, snd))
        dt = (time.time() - t0) / N
        mb = E * H * 2 / 1e6 if name == "gather+add" else V * H * 2 / 1e6
        print(f"XLA {name} x{N} [E={E},H={H}] bf16: {dt*1e3:.3f} ms/op "
              f"({mb/dt/1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
