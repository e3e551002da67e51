"""Folded line-graph EdgeMP kernel (ops/pallas_edgemp.py) in interpreter
mode: forward + custom-VJP gradients vs the XLA edge_mp path, rolling and
median-window plans, with and without the fused output SELU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphs4cfd_tpu.nn.mlp import init_mlp
from graphs4cfd_tpu.nn import blocks
from graphs4cfd_tpu.ops.window_plan import build_window_gather_plan
from graphs4cfd_tpu.ops import pallas_edgemp as pf


def _make_case(rng, V=64, k=5, H=128, stride=0):
    E = V * k
    senders = rng.integers(0, V, size=E).astype(np.int32)
    # canonical layout: angle_src[e] = senders[e]*k + arange(k)
    angle_src = senders[:, None] * k + np.arange(k)[None, :]
    a = rng.normal(size=(E, k, H)).astype(np.float32)
    e = rng.normal(size=(E, H)).astype(np.float32)
    params = {
        "angle_mlp": init_mlp(jax.random.key(0), 3 * H, (H, H), True),
        "edge_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H), True),
    }
    plan = build_window_gather_plan(senders, V, block_rows=k * 8,
                                    window=32, stride=stride,
                                    max_miss_frac=1.0)
    assert plan is not None
    return (jnp.asarray(a), jnp.asarray(e), jnp.asarray(senders),
            jnp.asarray(angle_src), params, plan)


@pytest.mark.parametrize("out_act,stride,ring", [
    (None, 0, False), ("selu", 0, False), ("selu", 8, False),
    # ring-buffer window maintenance (rolling plans only)
    ("selu", 8, True), (None, 8, True),
])
def test_folded_edgemp_matches_xla(rng, out_act, stride, ring,
                                   monkeypatch):
    monkeypatch.setenv("GRAPHS4CFD_FOLD_RING", "1" if ring else "0")
    V, k, H = 64, 5, 128
    a, e, senders, angle_src, params, plan = _make_case(
        rng, V=V, k=k, H=H, stride=stride)
    assert pf.supports_folded(plan, params["angle_mlp"],
                              params["edge_mlp"], V * k, V, k, H, H)

    def ref(p, a, e):
        return blocks.edge_mp(p, e, a, angle_src)   # XLA path (no plans)

    def fold(p, a, e):
        w1 = p["angle_mlp"]["layers"][0]["w"]
        es = e @ w1[H:2 * H]
        tab = es.reshape(V, k * H)
        return pf.edge_mp_folded(p["angle_mlp"], p["edge_mlp"], a, tab,
                                 e, k, plan, interpret=True,
                                 out_activation=out_act)

    re_, ra = ref(params, a, e)
    if out_act == "selu":
        re_, ra = jax.nn.selu(re_), jax.nn.selu(ra)
    fe_, fa_ = fold(params, a, e)
    np.testing.assert_allclose(np.asarray(fe_), np.asarray(re_),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fa_), np.asarray(ra),
                               rtol=1e-4, atol=1e-5)

    g_e = jnp.asarray(rng.normal(size=re_.shape).astype(np.float32))
    g_a = jnp.asarray(rng.normal(size=ra.shape).astype(np.float32))

    def loss_ref(p, a, e):
        r_e, r_a = ref(p, a, e)
        if out_act == "selu":
            r_e, r_a = jax.nn.selu(r_e), jax.nn.selu(r_a)
        return (r_e * g_e).sum() + (r_a * g_a).sum()

    def loss_fold(p, a, e):
        f_e, f_a = fold(p, a, e)
        return (f_e * g_e).sum() + (f_a * g_a).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, a, e)
    gf = jax.grad(loss_fold, argnums=(0, 1, 2))(params, a, e)
    for pa, pb in zip(jax.tree_util.tree_leaves(gr),
                      jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                                   rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize("out_act,stride,ring", [
    ("selu", 8, True), ("selu", 0, False),
])
def test_folded_edgemp_skip_a_out(rng, out_act, stride, ring, monkeypatch):
    """skip_a_out: e′ and all input grads must equal the XLA path under a
    zero a′ cotangent (the last layer of a level's final MP group)."""
    monkeypatch.setenv("GRAPHS4CFD_FOLD_RING", "1" if ring else "0")
    V, k, H = 64, 5, 128
    a, e, senders, angle_src, params, plan = _make_case(
        rng, V=V, k=k, H=H, stride=stride)

    def ref(p, a, e):
        return blocks.edge_mp(p, e, a, angle_src)   # XLA path (no plans)

    def fold(p, a, e):
        w1 = p["angle_mlp"]["layers"][0]["w"]
        es = e @ w1[H:2 * H]
        tab = es.reshape(V, k * H)
        return pf.edge_mp_folded(p["angle_mlp"], p["edge_mlp"], a, tab,
                                 e, k, plan, interpret=True,
                                 out_activation=out_act, skip_a_out=True)

    re_, _ = ref(params, a, e)
    if out_act == "selu":
        re_ = jax.nn.selu(re_)
    fe_, fa_ = fold(params, a, e)
    assert fa_ is None                  # LOUD dead-output contract
    np.testing.assert_allclose(np.asarray(fe_), np.asarray(re_),
                               rtol=1e-4, atol=1e-5)

    g_e = jnp.asarray(rng.normal(size=re_.shape).astype(np.float32))

    def loss_ref(p, a, e):
        r_e, _ = ref(p, a, e)
        if out_act == "selu":
            r_e = jax.nn.selu(r_e)
        return (r_e * g_e).sum()

    def loss_fold(p, a, e):
        f_e, _ = fold(p, a, e)
        return (f_e * g_e).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, a, e)
    gf = jax.grad(loss_fold, argnums=(0, 1, 2))(params, a, e)
    for pa, pb in zip(jax.tree_util.tree_leaves(gr),
                      jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                                   rtol=2e-3, atol=5e-4)


def _device_plan(plan):
    return (jnp.asarray(plan.starts), jnp.asarray(plan.lidx),
            jnp.asarray(plan.exc_pos), jnp.asarray(plan.exc_idx),
            plan.window, plan.block_rows, jnp.asarray(plan.exc_lpos),
            jnp.asarray(plan.exc_nidx), plan.stride)


def test_edge_mp_routes_folded(rng):
    """blocks.edge_mp must route through the folded kernel when a folded
    plan is passed and Pallas is enabled — values and grads unchanged."""
    from graphs4cfd_tpu import config as g4c_config

    V, k, H = 64, 5, 128
    a, e, senders, angle_src, params, plan = _make_case(
        rng, V=V, k=k, H=H, stride=8)
    dp = _device_plan(plan)

    def run(p, a, e, fp):
        return blocks.edge_mp(p, e, a, angle_src, folded_plan=fp,
                              out_activation="selu")

    old = g4c_config.use_pallas
    g4c_config.use_pallas = False
    try:
        rv, ra = run(params, a, e, None)
        g4c_config.use_pallas = True
        fv, fa_ = run(params, a, e, dp)
        np.testing.assert_allclose(np.asarray(fv), np.asarray(rv),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fa_), np.asarray(ra),
                                   rtol=1e-4, atol=1e-5)

        g_e = jnp.asarray(rng.normal(size=rv.shape).astype(np.float32))
        g_a = jnp.asarray(rng.normal(size=ra.shape).astype(np.float32))

        def loss(p, a, e, fp):
            ev, av = run(p, a, e, fp)
            return (ev * g_e).sum() + (av * g_a).sum()

        g4c_config.use_pallas = False
        gr = jax.grad(loss, argnums=(0, 1, 2))(params, a, e, None)
        g4c_config.use_pallas = True
        gf = jax.grad(loss, argnums=(0, 1, 2))(params, a, e, dp)
        for x, y in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=2e-3, atol=5e-4)
    finally:
        g4c_config.use_pallas = old


def test_loader_attaches_folded_plan(rng):
    """REMuS-style collate output carries the wg_fold_* plan and the
    engine-visible extractor returns it."""
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.loader import collate

    g = Graph()
    g.pos = (rng.random((600, 2)) * np.array([4.0, 2.0])).astype(np.float32)
    g.glob = np.full((600, 1), 0.5, np.float32)
    g.field = rng.normal(size=(600, 2)).astype(np.float32)
    g.target = rng.normal(size=(600, 20)).astype(np.float32)
    g.omega = np.zeros((600, 1), np.float32)
    g.bound = np.zeros(600, np.uint8)
    tf = T.BuildRemusGraph(num_levels=2, k=5,
                           scale_edge_length=[0.1, 0.2])
    batch = collate([tf(g), tf(g)], node_bucket=64)
    plan = blocks.folded_plan_of(batch)
    assert plan is not None
    E = batch.data["senders"].shape[0]
    assert E % int(plan[5]) == 0
    # folded plan reproduces the gather: table[senders] by blocks
    from graphs4cfd_tpu.ops.window_plan import (WindowGatherPlan,
                                                apply_plan_numpy)
    V = batch.data["pos"].shape[0]
    tab = rng.normal(size=(V, 8)).astype(np.float32)
    np_plan = WindowGatherPlan(
        np.asarray(plan[0]), np.asarray(plan[1]), np.asarray(plan[2]),
        np.asarray(plan[3]), int(plan[4]), int(plan[5]),
        np.asarray(plan[6]), np.asarray(plan[7]), int(plan[8]))
    got = apply_plan_numpy(tab, np_plan)
    np.testing.assert_array_equal(got,
                                  tab[np.asarray(batch.data["senders"])])


def test_remus_engine_uses_coarse_level_folded_plans(rng, monkeypatch):
    """collate attaches folded plans for EVERY fixed-k level; the REMuS
    engine must consume them (interpret-mode kernel) and match the plain
    XLA forward exactly."""
    from graphs4cfd_tpu import config as g4c_config
    import graphs4cfd_tpu as g4c
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu.loader import collate

    monkeypatch.setenv("GRAPHS4CFD_FOLD_WINDOW", "64")
    monkeypatch.setenv("GRAPHS4CFD_FOLD_BLOCK", "8")

    r = np.random.default_rng(5)
    g = Graph()
    n = 600
    g.pos = r.random((n, 2)).astype(np.float32)
    g.glob = r.random((n, 1)).astype(np.float32)
    g.field = r.normal(size=(n, 2)).astype(np.float32)
    g.target = r.normal(size=(n, 4)).astype(np.float32)
    g.omega = (r.random((n, 1)) < 0.1).astype(np.float32)
    g.bound = np.zeros(n, np.uint8)
    g = T.SpatialSort()(g)
    g = T.BuildRemusGraph(num_levels=2, k=5,
                          scale_edge_length=(0.02, 0.04))(g)
    g = T.BuildKnnInterpWeights(3)(g)
    batch = collate([g], node_bucket=8, edge_bucket=40)
    assert batch.has("wg_fold_starts")
    assert batch.has("wg_fold2_starts"), \
        "coarse-level folded plan was not attached"

    H = 128
    emp = ((H + 2 * H, (H, H), True), (H + H, (H, H), True))
    arch = {"angle_encoder": (4, (H, H), True),
            "angle_encoder12": (4, (H, H), True),
            "angle_encoder2": (4, (H, H), True),
            "edge_encoder": (3, (H, H), True),
            "edge_encoder2": (3, (H, H), True),
            "mp111": emp, "down_mp12": emp, "mp211": emp,
            "up_mp21": (H + H, (H, H), True),
            "mp121": emp,
            "decoder": (H, (H, 1), False)}
    model = g4c.nn.REMuSGNN(arch=arch, seed=2)

    monkeypatch.setattr(g4c_config, "use_pallas", False)
    ref = np.asarray(model.forward(batch.to_device()))
    monkeypatch.setattr(g4c_config, "use_pallas", True)
    out = np.asarray(model.forward(batch.to_device()))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
