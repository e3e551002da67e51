"""Secondary benchmarks: gMuS-GNN and REMuS-GNN training-step throughput.

Complements bench.py (the headline MuS-GNN 3-scale metric) with the other
two model families at their reference workloads (gMuS: NsCircle batch 8,
k=6; REMuS: NsEllipse batch 4, k=5, 3 levels).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_step(model, graph, criterion, iters=20):
    import jax
    import jax.numpy as jnp
    from graphs4cfd_tpu.training.trainer import make_train_step, _adam_opt
    step = make_train_step(model.apply, criterion, model.num_fields, 1, 1.0)
    opt_state = _adam_opt().init(model.params)
    g = graph.to_device()
    params = model.params
    lr, clip = jnp.float32(1e-4), jnp.bool_(True)
    t0 = time.time()
    params, opt_state, loss, _ = step(params, opt_state, g, lr, clip)
    _ = float(loss)
    log(f"  compile {time.time() - t0:.0f}s loss={float(loss):.3e}")
    for _ in range(2):
        params, opt_state, loss, _ = step(params, opt_state, g, lr, clip)
    _ = float(loss)
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss, _ = step(params, opt_state, g, lr, clip)
    _ = float(loss)
    return (time.time() - t0) / iters


def main():
    import jax.numpy as jnp
    import graphs4cfd_tpu as gfd
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.loader import collate
    from graphs4cfd_tpu.nn.losses import GraphLoss
    from graphs4cfd_tpu.utils import Compose

    rng = np.random.default_rng(0)
    W = 128
    mp = ((W + 2 * W, (W, W, W), True), (W + W, (W, W, W), True))
    emp = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))

    def cloud(n, nf, n_in=1, with_glob=True):
        g = Graph()
        g.pos = (rng.random((n, 2)) * np.array([4.0, 2.0])).astype(np.float32)
        if with_glob:
            g.glob = np.full((n, 1), 0.5, np.float32)
        g.field = rng.normal(size=(n, nf * n_in)).astype(np.float32)
        g.target = rng.normal(size=(n, nf * 10)).astype(np.float32)
        g.omega = (rng.random((n, 1)) < 0.1).astype(np.float32)
        g.bound = np.zeros(n, np.uint8)
        return g

    results = []
    only = os.environ.get("GRAPHS4CFD_BENCH_FAMILY", "")  # "", "gmus", "remus"

    # ---- gMuS 3-scale (NsCircle workload) ----------------------------------
    if only in ("", "gmus"):
        _bench_gmus(gfd, T, Compose, collate, GraphLoss, jnp,
                    cloud, W, mp, results)
    if only in ("", "remus"):
        _bench_remus(gfd, T, Compose, collate, GraphLoss, jnp,
                     cloud, W, emp, results)

    for name, rate, dt in results:
        print(json.dumps({"metric": name, "value": round(rate, 1),
                          "unit": "edges/s",
                          "step_ms": round(dt * 1e3, 2)}))


def _bench_gmus(gfd, T, Compose, collate, GraphLoss, jnp, cloud, W, mp,
                results):
    log("gMuS-GNN 3-scale, batch 8 x 5000 nodes, k=6")
    tf = Compose([T.SpatialSort(), T.GuillardCoarseningAndConnectKNN(
        k=[6, 6, 6], scale_edge_attr=(0.1, 0.25, 0.5)),
        T.BuildKnnInterpWeights(6)])
    gs = [tf(cloud(5000, 3)) for _ in range(8)]
    batch = collate(gs, node_bucket=512, edge_bucket=1024)
    arch = {
        "edge_encoder": (2, (W, W, W), False),
        "edge_encoder2": (2, (W, W, W), False),
        "edge_encoder3": (2, (W, W, W), False),
        "node_encoder": (5, (W, W, W), False),
        "mp111": mp, "mp112": mp, "mp113": mp, "mp114": mp,
        "mp211": mp, "mp212": mp,
        "mp31": mp, "mp32": mp, "mp33": mp, "mp34": mp,
        "mp221": ((W + 2 * 2 * W, (W, W, W), True),
                  (W + 2 * W, (W, W, W), True)), "mp222": mp,
        "mp121": ((W + 2 * 2 * W, (W, W, W), True),
                  (W + 2 * W, (W, W, W), True)),
        "mp122": mp, "mp123": mp, "mp124": mp,
        "decoder": (W, (W, W, 3), False),
    }
    model = gfd.nn.NsThreeGuillardScaleGNN(arch=arch,
                                           compute_dtype=jnp.bfloat16)
    dt = bench_step(model, batch, GraphLoss(lambda_d=0.25))
    edges = int(np.asarray(batch.edge_mask).sum())
    results.append(("gmus3_train_edges_per_sec", edges / dt, dt))
    log(f"  gMuS: {dt*1e3:.1f} ms/step, {edges/dt:.3e} edges/s")


def _bench_remus(gfd, T, Compose, collate, GraphLoss, jnp, cloud, W, emp,
                 results):
    # ---- REMuS 3-scale (NsEllipse workload) --------------------------------
    log("REMuS-GNN 3-scale, batch 4 x 5000 nodes, k=5")
    tf = Compose([T.SpatialSort(),
                  T.BuildRemusGraph(num_levels=3, k=5,
                                    scale_edge_length=(0.1, 0.2, 0.4)),
                  T.BuildKnnInterpWeights(5)])
    gs = [tf(cloud(5000, 2, n_in=1)) for _ in range(4)]
    batch = collate(gs, node_bucket=512, edge_bucket=1024)
    arch = {
        "angle_encoder": (4, (W, W), True),
        "angle_encoder12": (4, (W, W), True),
        "angle_encoder2": (4, (W, W), True),
        "angle_encoder23": (4, (W, W), True),
        "angle_encoder3": (4, (W, W), True),
        "edge_encoder": (3, (W, W), True),
        "edge_encoder2": (3, (W, W), True),
        "edge_encoder3": (3, (W, W), True),
        "mp111": emp, "mp112": emp, "mp113": emp, "mp114": emp,
        "down_mp12": emp,
        "mp211": emp, "mp212": emp,
        "down_mp23": emp,
        "mp31": emp, "mp32": emp, "mp33": emp, "mp34": emp,
        "up_mp32": (W + W, (W, W, W), True),
        "mp221": emp, "mp222": emp,
        "up_mp21": (W + W, (W, W, W), True),
        "mp121": emp, "mp122": emp, "mp123": emp, "mp124": emp,
        "decoder": (W, (W, 1), False),
    }
    model = gfd.nn.NsRotEquiThreeScaleGNN(arch=arch,
                                          compute_dtype=jnp.bfloat16)
    dt = bench_step(model, batch, GraphLoss(lambda_d=0.25))
    edges = int(np.asarray(batch.edge_mask).sum())
    results.append(("remus3_train_edges_per_sec", edges / dt, dt))
    log(f"  REMuS: {dt*1e3:.1f} ms/step, {edges/dt:.3e} edges/s")


if __name__ == "__main__":
    main()
