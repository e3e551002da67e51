"""Multi-device scaling benchmark: edges/s efficiency at N devices.

BASELINE.md target: ≥80% edges/s scaling efficiency at N hosts.  On real
multi-chip hardware this measures ICI-backed data-parallel training; in
this environment (one real TPU chip) it runs on a virtual CPU device mesh,
which validates the collective machinery and measures the *relative*
parallel efficiency of the shard_map program (CPU wall times are not TPU
wall times, but the comm/compute structure is identical).

Prints one JSON line per device count plus a summary efficiency line.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(x):
    return float(np.asarray(x))


def measure(n_devices: int, samples, model, criterion, n_out=1, iters=5):
    import jax
    import jax.numpy as jnp
    import optax
    from graphs4cfd_tpu.loader import collate_sharded
    from graphs4cfd_tpu.parallel import make_mesh, make_dp_train_step

    sharded = collate_sharded(samples[:n_devices], n_devices,
                              node_bucket=64, edge_bucket=128)
    mesh = make_mesh(num_data=n_devices)
    step = make_dp_train_step(model.apply, criterion, model.num_fields,
                              n_out, 1.0, mesh)
    opt_state = optax.scale_by_adam().init(model.params)
    g = sharded.to_device()
    lr, clip = jnp.float32(1e-4), jnp.bool_(True)
    params = model.params
    params, opt_state, loss, _ = step(params, opt_state, g, lr, clip)
    _sync(loss)
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss, _ = step(params, opt_state, g, lr, clip)
    _sync(loss)
    dt = (time.time() - t0) / iters
    edges = int(np.asarray(sharded.edge_mask).sum()) * n_out
    return edges / dt, dt


def main(max_devices=None):
    import jax
    if jax.default_backend() != "tpu" and len(jax.devices()) < 2:
        log("NOTE: run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
            "JAX plat cpu for a virtual mesh")
    import graphs4cfd_tpu as g4c
    from graphs4cfd_tpu.nn.losses import GraphLoss
    from __graft_entry__ import _flagship_arch, _make_samples

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= (max_devices or n_avail)]
    model = g4c.nn.NsThreeScaleGNN(arch=_flagship_arch(w=64))
    criterion = GraphLoss(lambda_d=0.25)
    log(f"devices available: {n_avail} ({jax.default_backend()}); "
        f"measuring {counts}")
    samples = _make_samples(max(counts), 600, seed=3, k=4, cells=(0.3, 0.6))

    results = {}
    for n in counts:
        rate, dt = measure(n, samples, model, criterion)
        results[n] = rate
        log(f"devices={n}: {dt*1e3:.1f} ms/step, {rate:.3e} edges/s")
    base = results[counts[0]]
    for n in counts:
        eff = results[n] / (base * n)
        print(json.dumps({
            "metric": f"dp_scaling_edges_per_s_{n}dev",
            "value": round(results[n], 1), "unit": "edges/s",
            "vs_baseline": round(eff, 3)}))
    if len(counts) > 1:
        n = counts[-1]
        log(f"scaling efficiency at {n} devices: "
            f"{results[n] / (base * n) * 100:.1f}%")


if __name__ == "__main__":
    main()
