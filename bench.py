"""Headline benchmark: training edges/sec/chip on MuS-GNN 3-scale.

Workload per BASELINE.md: NsCircle-like mesh, k=6, cell sizes (0.15, 0.30),
batch 8, 128-wide MLPs, 16 MP + 2 Down + 2 Up layers, Adam, grad clip.
Measures the full jitted training step (forward + backward + per-t update)
and reports level-1 edges processed per second per chip.

Prints ONE JSON line on stdout; progress goes to stderr.
"""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# First real-TPU measurement of this workload (round 1, TPU v5e 1 chip)
# becomes the recorded baseline; vs_baseline = value / BASELINE_EDGES_PER_S.
BASELINE_EDGES_PER_S = 1818627.5  # round-1 first TPU v5e measurement


def main():
    import jax
    import jax.numpy as jnp
    import optax
    import graphs4cfd_tpu as g4c
    from graphs4cfd_tpu.loader import collate
    from graphs4cfd_tpu.nn.losses import GraphLoss
    from graphs4cfd_tpu.training.trainer import make_train_step, _adam_opt
    from __graft_entry__ import _flagship_arch, _make_samples

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    batch_size = 8
    n_nodes = 5000
    n_out = 1
    bf16 = dev.platform == "tpu"

    log("building graphs (host)...")
    t0 = time.time()
    samples = _make_samples(batch_size, n_nodes, seed=7)
    graph = collate(samples, node_bucket=512, edge_bucket=1024)
    log(f"graph build: {time.time() - t0:.1f}s  "
        f"V={graph.num_nodes} E={graph.num_edges} "
        f"V2={graph.data['pos_2'].shape[0]} E2={graph.data['senders_2'].shape[0]} "
        f"V3={graph.data['pos_3'].shape[0]} E3={graph.data['senders_3'].shape[0]}")

    model = g4c.nn.NsThreeScaleGNN(
        arch=_flagship_arch(),
        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    log(f"params: {model.num_params}")

    criterion = GraphLoss(lambda_d=0.25)
    step = make_train_step(model.apply, criterion, model.num_fields,
                           n_out, 1.0)
    opt_state = _adam_opt().init(model.params)
    g = graph.to_device()
    params = model.params
    lr = jnp.float32(1e-4)
    clip = jnp.bool_(True)

    log("compiling...")
    t0 = time.time()
    params, opt_state, loss, gn = step(params, opt_state, g, lr, clip)
    _ = float(loss)  # host transfer = true sync (block_until_ready on the
    # remote-TPU tunnel returns before execution completes)
    log(f"first step (compile): {time.time() - t0:.1f}s loss={float(loss):.4e}")

    # warmup
    for _ in range(2):
        params, opt_state, loss, gn = step(params, opt_state, g, lr, clip)
    _ = float(loss)

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss, gn = step(params, opt_state, g, lr, clip)
    _ = float(loss)  # sync the dependent chain
    dt = (time.time() - t0) / iters

    valid_edges = int(np.asarray(graph.edge_mask).sum())
    edges_per_s = valid_edges * n_out / dt
    log(f"step time: {dt*1e3:.2f} ms  valid L1 edges: {valid_edges}  "
        f"edges/s: {edges_per_s:.3e}")

    vs = (edges_per_s / BASELINE_EDGES_PER_S
          if BASELINE_EDGES_PER_S else 1.0)
    from graphs4cfd_tpu.config import fast_path_report
    print(json.dumps({
        "metric": "training_edges_per_sec_per_chip_mus3",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3),
        # dispatch observability: plans attached + kernels engaged by the
        # traced step; a silent fallback shows up as :none/:unfused here
        "fast_paths": fast_path_report(),
    }))


if __name__ == "__main__":
    main()
