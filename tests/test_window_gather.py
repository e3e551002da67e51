"""Windowed one-hot MXU gather: plan builder + Pallas kernel vs plain gather.

The op must be bit-exact with ``table[indices]`` in f32 (one-hot matmul
selects exactly one row), forward and VJP, including out-of-window
exception rows and plan padding.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphs4cfd_tpu.ops.window_plan import (build_window_gather_plan,
                                            apply_plan_numpy)
from graphs4cfd_tpu.ops.pallas_gather import windowed_take, supports


def _mk(rng, N=1024, M=2048, H=128, spread=200, block_rows=512, window=512,
        stride=0):
    """Indices clustered around each block's centre (Morton-like), with a
    sprinkle of far-away senders to exercise the exception path."""
    base = np.repeat(np.linspace(0, N - 1, M // block_rows,
                                 dtype=np.int64), block_rows)
    idx = np.clip(base + rng.integers(-spread, spread, M), 0, N - 1)
    far = rng.random(M) < 0.02
    idx[far] = rng.integers(0, N, far.sum())
    plan = build_window_gather_plan(idx, N, block_rows=block_rows,
                                    window=window, stride=stride)
    assert plan is not None
    table = rng.normal(size=(N, H)).astype(np.float32)
    return table, idx.astype(np.int32), plan


def test_plan_numpy_roundtrip(rng):
    table, idx, plan = _mk(rng)
    np.testing.assert_array_equal(apply_plan_numpy(table, plan), table[idx])


def test_plan_rejects_unsorted(rng):
    # fully random indices -> too many misses -> fallback signal
    idx = rng.integers(0, 100_000, 6144)
    assert build_window_gather_plan(idx, 100_000, block_rows=1536,
                                    window=1024) is None


def test_plan_divisibility_and_empty(rng):
    assert build_window_gather_plan(np.arange(7), 10, block_rows=4) is None
    assert build_window_gather_plan(np.arange(0), 10, block_rows=4) is None


def test_windowed_take_forward(rng):
    table, idx, plan = _mk(rng)
    out = windowed_take(jnp.asarray(table), _device_plan(plan),
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(out), table[idx])


def test_windowed_take_grad(rng):
    table, idx, plan = _mk(rng, N=512, M=1024, H=128, block_rows=256,
                           window=256, spread=60)
    dp = _device_plan(plan)
    g = jnp.asarray(rng.normal(size=(1024, 128)).astype(np.float32))

    def loss_fused(t):
        return (windowed_take(t, dp, interpret=True) * g).sum()

    def loss_ref(t):
        return (t[idx] * g).sum()

    t = jnp.asarray(table)
    gf = jax.grad(loss_fused)(t)
    gr = jax.grad(loss_ref)(t)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-6, atol=1e-6)


def test_supports_gate():
    assert supports(2048, 3072, 1024, 1536)
    assert not supports(512, 3072, 1024, 1536)   # table smaller than window
    assert not supports(2048, 3071, 1024, 1536)  # non-divisible M


def _device_plan(plan):
    return (jnp.asarray(plan.starts), jnp.asarray(plan.lidx),
            jnp.asarray(plan.exc_pos), jnp.asarray(plan.exc_idx),
            plan.window, plan.block_rows,
            jnp.asarray(plan.exc_lpos), jnp.asarray(plan.exc_nidx),
            plan.stride)


def test_windowed_take_rolling(rng):
    """Standalone windowed_take with a rolling (stride) plan: forward must
    stay bit-exact and the rolling-accumulator VJP must match the plain
    gather transpose."""
    table, idx, plan = _mk(rng, N=1024, M=4096, H=64, block_rows=512,
                           window=512, stride=128, spread=150)
    assert plan.stride == 128
    dp = _device_plan(plan)
    out = windowed_take(jnp.asarray(table), dp, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), table[idx])

    g = jnp.asarray(rng.normal(size=(4096, 64)).astype(np.float32))
    gf = jax.grad(lambda t: (windowed_take(t, dp, interpret=True)
                             * g).sum())(jnp.asarray(table))
    gr = jax.grad(lambda t: (t[idx] * g).sum())(jnp.asarray(table))
    # rolling accumulation reassociates the f32 sums → not bit-identical
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_rolling_plan_monotone(rng):
    """stride-mode starts must be monotone with diffs in {0, stride} and
    still reproduce the exact gather."""
    table, idx, plan = _mk(rng, N=1024, M=4096, H=16, block_rows=512,
                           window=512, stride=128, spread=150)
    assert plan.stride == 128
    d = np.diff(plan.starts.astype(np.int64))
    assert set(d.tolist()) <= {0, 128}
    np.testing.assert_array_equal(apply_plan_numpy(table, plan), table[idx])


def test_gn_block_with_window_plan(rng):
    """gn_block(window_plan=...) must match the plain-gather gn_block,
    values and gradients, through the fused-kernel path (interpret)."""
    from graphs4cfd_tpu.nn import blocks
    from graphs4cfd_tpu.nn.mlp import init_mlp
    from graphs4cfd_tpu import config as g4c_config

    V, k, H = 512, 4, 128
    table_dummy, idx, plan = _mk(rng, N=V, M=V * k, H=H, block_rows=256,
                                 window=256, spread=60)
    senders = jnp.asarray(idx)
    receivers = jnp.asarray(np.repeat(np.arange(V, dtype=np.int32), k))
    v = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(V * k, H)).astype(np.float32))
    params = {"edge_mlp": init_mlp(jax.random.key(0), 3 * H, (H, H, H), True),
              "node_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H, H), True)}
    dp = _device_plan(plan)

    old = g4c_config.use_pallas
    g4c_config.use_pallas = True   # exercise the fused branch (interpret)
    try:
        rv, re = blocks.gn_block(params, v, e, senders, receivers,
                                 fixed_k=k, out_activation="selu")
        wv, we = blocks.gn_block(params, v, e, senders, receivers,
                                 fixed_k=k, out_activation="selu",
                                 window_plan=dp)
        np.testing.assert_allclose(np.asarray(wv), np.asarray(rv),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(we), np.asarray(re),
                                   rtol=1e-5, atol=1e-5)

        g_v = jnp.asarray(rng.normal(size=rv.shape).astype(np.float32))

        def loss(p, v, wp):
            av, _ = blocks.gn_block(p, v, e, senders, receivers, fixed_k=k,
                                    out_activation="selu", window_plan=wp)
            return (av * g_v).sum()

        gr = jax.grad(loss, argnums=(0, 1))(params, v, None)
        gw = jax.grad(loss, argnums=(0, 1))(params, v, dp)
        for a, b in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gw)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-3, atol=5e-4)
    finally:
        g4c_config.use_pallas = old


def test_collate_attaches_plan(rng, monkeypatch):
    """loader.collate builds a wg_ plan for spatially sorted k-NN batches."""
    monkeypatch.setenv("GRAPHS4CFD_GATHER_WINDOW", "256")
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.loader import collate
    from graphs4cfd_tpu.ops.window_plan import apply_plan_numpy, \
        WindowGatherPlan

    def sample(seed):
        r = np.random.default_rng(seed)
        g = Graph()
        g.pos = r.random((300, 2)).astype(np.float32)
        g.field = r.normal(size=(300, 3)).astype(np.float32)
        for t in [T.SpatialSort(), T.ConnectKNN(k=4)]:
            g = t(g)
        return g

    batch = collate([sample(0), sample(1)], node_bucket=256,
                    edge_bucket=256)
    assert batch.has("wg_starts"), "plan should attach for sorted batches"
    plan = WindowGatherPlan(
        np.asarray(batch.data["wg_starts"]), np.asarray(batch.data["wg_lidx"]),
        np.asarray(batch.data["wg_exc_pos"]),
        np.asarray(batch.data["wg_exc_idx"]),
        batch.data["wg_window"], batch.data["wg_block_rows"],
        np.asarray(batch.data["wg_exc_lpos"]),
        np.asarray(batch.data["wg_exc_nidx"]))
    table = np.random.default_rng(9).normal(
        size=(batch.num_nodes, 8)).astype(np.float32)
    np.testing.assert_array_equal(apply_plan_numpy(table, plan),
                                  table[np.asarray(batch.senders)])


def test_collate_honors_wg_pref(rng):
    """A graph-build transform can pin its own (window, block) via the
    static ``wg_pref`` key (REMuS does); collate and collate_sharded must
    honor it, and batches without it keep the (512, 128) default."""
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.loader import collate, collate_sharded

    def sample(seed, pref):
        r = np.random.default_rng(seed)
        g = Graph()
        g.pos = (r.random((1500, 2)) * np.array([4.0, 2.0])).astype(
            np.float32)
        g.field = r.normal(size=(1500, 3)).astype(np.float32)
        for t in [T.SpatialSort(), T.ConnectKNN(k=6)]:
            g = t(g)
        if pref is not None:
            g.data["wg_pref"] = pref
        return g

    gs = [sample(i, (1024, 256)) for i in range(4)]
    b = collate(gs, node_bucket=512, edge_bucket=1024)
    assert b.data["wg_window"] == 1024
    assert b.data["wg_block_rows"] == 6 * 256
    bs = collate_sharded(gs, 2, node_bucket=512, edge_bucket=1024)
    assert bs.data["wg_window"] == 1024
    assert bs.data["wg_block_rows"] == 6 * 256
    b_def = collate([sample(i, None) for i in range(2)],
                    node_bucket=512, edge_bucket=1024)
    assert b_def.data["wg_window"] == 512
    assert b_def.data["wg_block_rows"] == 6 * 128


def test_remus_transform_sets_wg_pref(rng):
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu import transforms as T
    r = np.random.default_rng(3)
    g = Graph()
    g.pos = (r.random((600, 2)) * np.array([4.0, 2.0])).astype(np.float32)
    g.field = r.normal(size=(600, 2)).astype(np.float32)
    g = T.SpatialSort()(g)
    g = T.BuildRemusGraph(num_levels=1, k=5, scale_edge_length=(0.1,))(g)
    assert g.data["wg_pref"] == (1024, 256)


def test_edge_mp_with_window_plan(rng):
    """REMuS angle gather via the [V, k·H] reshape + windowed plan must
    match es[angle_src] exactly (values and grads)."""
    from graphs4cfd_tpu.nn import blocks
    from graphs4cfd_tpu.nn.mlp import init_mlp

    V, k, H, FA = 512, 4, 128, 4
    _, senders, plan = _mk(rng, N=V, M=V * k, H=H, block_rows=256,
                           window=256, spread=60)
    E = V * k
    angle_src = (senders.astype(np.int64)[:, None] * k
                 + np.arange(k)[None, :]).astype(np.int32)
    dp = _device_plan(plan)
    e = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(E, k, FA)).astype(np.float32))
    params = {"angle_mlp": init_mlp(jax.random.key(0), FA + 2 * H,
                                    (H, H), True),
              "edge_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H), True)}

    rv, ra = blocks.edge_mp(params, e, a, jnp.asarray(angle_src))
    wv, wa = blocks.edge_mp(params, e, a, jnp.asarray(angle_src),
                            window_plan=dp)
    np.testing.assert_allclose(np.asarray(wv), np.asarray(rv),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wa), np.asarray(ra),
                               rtol=1e-5, atol=1e-5)

    g = jnp.asarray(rng.normal(size=rv.shape).astype(np.float32))

    def loss(p, e, wp):
        ev, _ = blocks.edge_mp(p, e, a, jnp.asarray(angle_src),
                               window_plan=wp)
        return (ev * g).sum()

    gr = jax.grad(loss, argnums=(0, 1))(params, e, None)
    gw = jax.grad(loss, argnums=(0, 1))(params, e, dp)
    for x, y in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gw)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-3, atol=5e-4)


@pytest.mark.parametrize("stride", [0, 128])
def test_edge_mp_fused_matches(rng, stride):
    """edge_mp through the fused GN-block kernel (EdgeMP ≡ GN block on the
    line graph) must match the XLA path, values and gradients, with and
    without a rolling window plan (interpret)."""
    from graphs4cfd_tpu.nn import blocks
    from graphs4cfd_tpu.nn.mlp import init_mlp
    from graphs4cfd_tpu import config as g4c_config

    V, k, H = 512, 4, 128
    _, senders, plan = _mk(rng, N=V, M=V * k, H=H, block_rows=256,
                           window=256, spread=60, stride=stride)
    dp = _device_plan(plan)
    E = V * k
    angle_src = (senders.astype(np.int64)[:, None] * k
                 + np.arange(k)[None, :]).astype(np.int32)
    e = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(E, k, H)).astype(np.float32))
    params = {"angle_mlp": init_mlp(jax.random.key(0), 3 * H,
                                    (H, H), True),
              "edge_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H), True)}

    def run(p, e, a, wp):
        return blocks.edge_mp(p, e, a, jnp.asarray(angle_src),
                              window_plan=wp, out_activation="selu")

    old = g4c_config.use_pallas
    g4c_config.use_pallas = False
    try:
        rv, ra = run(params, e, a, None)
        g4c_config.use_pallas = True
        for wp in (None, dp):
            wv, wa = run(params, e, a, wp)
            np.testing.assert_allclose(np.asarray(wv), np.asarray(rv),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(wa), np.asarray(ra),
                                       rtol=1e-5, atol=1e-5)

        g_e = jnp.asarray(rng.normal(size=rv.shape).astype(np.float32))
        g_a = jnp.asarray(rng.normal(size=ra.shape).astype(np.float32))

        def loss(p, e, a, wp):
            ev, av = run(p, e, a, wp)
            return (ev * g_e).sum() + (av * g_a).sum()

        g4c_config.use_pallas = False
        gr = jax.grad(loss, argnums=(0, 1, 2))(params, e, a, None)
        g4c_config.use_pallas = True
        gw = jax.grad(loss, argnums=(0, 1, 2))(params, e, a, dp)
        for x, y in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gw)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=2e-3, atol=5e-4)
    finally:
        g4c_config.use_pallas = old


def test_blocked_exceptions_consistent(rng):
    """Blocked exception arrays must list exactly the global misses."""
    _, idx, plan = _mk(rng)
    M = plan.lidx.shape[0]
    live = plan.exc_pos < M
    from_blocked = []
    for b in range(plan.exc_lpos.shape[0]):
        for x in range(plan.exc_lpos.shape[1]):
            if plan.exc_lpos[b, x] < plan.block_rows:
                from_blocked.append((b * plan.block_rows
                                     + plan.exc_lpos[b, x],
                                     plan.exc_nidx[b, x]))
    expect = sorted(zip(plan.exc_pos[live].tolist(),
                        plan.exc_idx[live].tolist()))
    assert sorted(from_blocked) == expect


@pytest.mark.parametrize("stride,ring", [(0, False), (128, False),
                                         (128, True)])
def test_gn_block_fused_wg_matches(rng, stride, ring, monkeypatch):
    """Mode-B (in-kernel windowed gather) gn_block must match the plain
    path, values and gradients, including exception rows (interpret).
    ``stride=128`` exercises the rolling-accumulator backward; ``ring``
    the ring-buffer window maintenance."""
    from graphs4cfd_tpu.nn import blocks
    from graphs4cfd_tpu.nn.mlp import init_mlp
    from graphs4cfd_tpu.ops import pallas_gnblock as pg
    from graphs4cfd_tpu import config as g4c_config

    monkeypatch.setenv("GRAPHS4CFD_WG_RING", "1" if ring else "0")
    V, k, H = 512, 4, 128
    _, idx, plan = _mk(rng, N=V, M=V * k, H=H, block_rows=k * 128,
                       window=256, spread=60, stride=stride)
    assert plan.stride == stride
    dp = _device_plan(plan)
    assert pg.supports_wg(dp, V, k)
    senders = jnp.asarray(idx)
    receivers = jnp.asarray(np.repeat(np.arange(V, dtype=np.int32), k))
    v = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(V * k, H)).astype(np.float32))
    params = {"edge_mlp": init_mlp(jax.random.key(0), 3 * H, (H, H, H), True),
              "node_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H, H), True)}

    old = g4c_config.use_pallas
    g4c_config.use_pallas = True
    try:
        rv, re = blocks.gn_block(params, v, e, senders, receivers,
                                 fixed_k=k, out_activation="selu")
        wv, we = blocks.gn_block(params, v, e, senders, receivers,
                                 fixed_k=k, out_activation="selu",
                                 window_plan=dp)
        np.testing.assert_allclose(np.asarray(wv), np.asarray(rv),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(we), np.asarray(re),
                                   rtol=1e-5, atol=1e-5)

        g_v = jnp.asarray(rng.normal(size=rv.shape).astype(np.float32))
        g_e = jnp.asarray(rng.normal(size=re.shape).astype(np.float32))

        def loss(p, v, e, wp):
            av, ae = blocks.gn_block(p, v, e, senders, receivers,
                                     fixed_k=k, out_activation="selu",
                                     window_plan=wp)
            return (av * g_v).sum() + (ae * g_e).sum()

        gr = jax.grad(loss, argnums=(0, 1, 2))(params, v, e, None)
        gw = jax.grad(loss, argnums=(0, 1, 2))(params, v, e, dp)
        for x, y in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gw)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=2e-3, atol=5e-4)
    finally:
        g4c_config.use_pallas = old


@pytest.mark.parametrize("stride,ring", [(128, True), (0, False)])
def test_gn_block_fused_wg_skip_e_out(rng, stride, ring, monkeypatch):
    """skip_e_out: v′ and all input grads must equal the plain path under
    a zero e′ cotangent (last MP layer before an up/decoder)."""
    from graphs4cfd_tpu.nn import blocks
    from graphs4cfd_tpu.nn.mlp import init_mlp
    from graphs4cfd_tpu.ops import pallas_gnblock as pg
    from graphs4cfd_tpu import config as g4c_config

    monkeypatch.setenv("GRAPHS4CFD_WG_RING", "1" if ring else "0")
    V, k, H = 512, 4, 128
    _, idx, plan = _mk(rng, N=V, M=V * k, H=H, block_rows=k * 128,
                       window=256, spread=60, stride=stride)
    dp = _device_plan(plan)
    assert pg.supports_wg(dp, V, k)
    senders = jnp.asarray(idx)
    receivers = jnp.asarray(np.repeat(np.arange(V, dtype=np.int32), k))
    v = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(V * k, H)).astype(np.float32))
    params = {"edge_mlp": init_mlp(jax.random.key(0), 3 * H, (H, H, H), True),
              "node_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H, H), True)}

    old = g4c_config.use_pallas
    g4c_config.use_pallas = True
    try:
        rv, _ = blocks.gn_block(params, v, e, senders, receivers,
                                fixed_k=k, out_activation="selu")
        wv, we = blocks.gn_block(params, v, e, senders, receivers,
                                fixed_k=k, out_activation="selu",
                                window_plan=dp, skip_e_out=True)
        assert we is None               # LOUD dead-output contract
        np.testing.assert_allclose(np.asarray(wv), np.asarray(rv),
                                   rtol=1e-5, atol=1e-5)

        g_v = jnp.asarray(rng.normal(size=rv.shape).astype(np.float32))

        def loss(p, v, e, wp, skip):
            av, _ = blocks.gn_block(p, v, e, senders, receivers,
                                    fixed_k=k, out_activation="selu",
                                    window_plan=wp, skip_e_out=skip)
            return (av * g_v).sum()

        gr = jax.grad(loss, argnums=(0, 1, 2))(params, v, e, None, False)
        gw = jax.grad(loss, argnums=(0, 1, 2))(params, v, e, dp, True)
        for x, y in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gw)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=2e-3, atol=5e-4)
    finally:
        g4c_config.use_pallas = old


def test_supports_gates_on_lane_aligned_width():
    """Mosaic rejects window DMAs whose feature width is not a multiple of
    the 128-lane tile (only on real hardware — interpret mode skips the
    proof), so ``supports`` must decline narrow tables (round-4: width-64
    models crashed the TPU compile once the window ladder attached plans
    on them)."""
    from graphs4cfd_tpu.ops import pallas_gather as pg
    assert pg.supports(1024, 512, 256, 64, 128)
    assert pg.supports(1024, 512, 256, 64, 256)
    assert not pg.supports(1024, 512, 256, 64, 64)
    assert not pg.supports(1024, 512, 256, 64, 96)
