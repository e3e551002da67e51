"""Transform-level unit tests: scaling stride semantics, flips, subsets,
re-meshing, Compose, and the rotation convention vs the reference formula.
"""
import numpy as np
import pytest

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.graph import Graph
from graphs4cfd_tpu import transforms as T
from graphs4cfd_tpu.utils import Compose


def _ns_graph(rng, n=40, frames=3, fmt="uvp"):
    nf = 3 if fmt == "uvp" else 2
    g = Graph()
    g.pos = rng.random((n, 2)).astype(np.float32)
    g.glob = rng.random((n, 1)).astype(np.float32) * 500 + 500
    g.field = rng.normal(size=(n, nf * frames)).astype(np.float32)
    g.target = rng.normal(size=(n, nf * frames)).astype(np.float32)
    g.omega = np.zeros((n, 1), np.float32)
    g.bound = np.zeros(n, np.uint8)
    return g


def test_scale_ns_strided(rng):
    g = _ns_graph(rng)
    orig_field = np.array(g.field)
    orig_glob = np.array(g.glob)
    scaling = {"u": (-2.0, 2.0), "v": (-1.0, 3.0), "p": (-4.0, 2.0),
               "Re": (500, 1000)}
    T.ScaleNs(scaling, format="uvp")(g)
    # u: c=0, d=2 ; v: c=1, d=2 ; p: c=-1, d=3 (scale.py:33-81)
    np.testing.assert_allclose(g.field[:, 0::3], orig_field[:, 0::3] / 2.0,
                               rtol=1e-6)
    np.testing.assert_allclose(g.field[:, 1::3],
                               (orig_field[:, 1::3] - 1.0) / 2.0, rtol=1e-5)
    np.testing.assert_allclose(g.field[:, 2::3],
                               (orig_field[:, 2::3] + 1.0) / 3.0, rtol=1e-5)
    np.testing.assert_allclose(g.glob, (orig_glob - 750) / 250, rtol=1e-5)


def test_rotation_matches_reference_formula(rng):
    """Reference applies (R*x.unsqueeze(-1)).sum(1) == x @ R with
    R=[[c,s],[-s,c]] (geometric.py:63,77)."""
    import torch
    g = _ns_graph(rng, fmt="uv")
    g.field = g.field[:, :4]
    g.target = g.target[:, :4]
    pos0 = torch.tensor(np.array(g.pos))
    theta = 37.0
    T.GraphRotation(theta, eq="ns", format="uv")(g)
    th = np.deg2rad(theta)
    R = torch.tensor([[np.cos(th), np.sin(th)],
                      [-np.sin(th), np.cos(th)]], dtype=torch.float32)
    ref = (R * pos0.unsqueeze(-1)).sum(dim=1).numpy()
    np.testing.assert_allclose(g.pos, ref, atol=1e-5)


def test_flip_graph(rng):
    g = _ns_graph(rng, fmt="uv")
    g.loc = rng.normal(size=(40, 2)).astype(np.float32)
    pos0, field0 = np.array(g.pos), np.array(g.field)
    T.flip_graph_dim(g, 0, eq="ns", format="uv")
    np.testing.assert_allclose(g.pos[:, 0], -pos0[:, 0])
    np.testing.assert_allclose(g.pos[:, 1], pos0[:, 1])
    np.testing.assert_allclose(g.field[:, 0::2], -field0[:, 0::2])
    np.testing.assert_allclose(g.field[:, 1::2], field0[:, 1::2])
    with pytest.raises(ValueError):
        T.flip_graph_dim(g, 2, eq="ns", format="uv")


def test_node_subset(rng):
    g = _ns_graph(rng)
    T.NodeSubset([0, 5, 7])(g)
    assert g.pos.shape == (3, 2) and g.field.shape[0] == 3
    g2 = _ns_graph(rng)
    T.RandomNodeSubset(0.5, seed=0)(g2)
    assert g2.pos.shape[0] == 20


def test_interpolate_nodes(rng):
    """scipy re-meshing preserves a linear field exactly (interior)."""
    pytest.importorskip("scipy")
    g = Graph()
    xs = np.linspace(0, 1, 12)
    xx, yy = np.meshgrid(xs, xs)
    g.pos = np.stack([xx.ravel(), yy.ravel()], 1).astype(np.float32)
    lin = (2 * g.pos[:, :1] + 3 * g.pos[:, 1:2]).astype(np.float32)
    g.field = lin
    g.target = lin * 2
    g.omega = np.ones((g.pos.shape[0], 1), np.float32)
    g.bound = np.zeros(g.pos.shape[0], np.uint8)
    new_pos = (0.1 + 0.8 * rng.random((50, 2))).astype(np.float32)
    T.InterpolateNodes(new_pos)(g)
    expect = 2 * new_pos[:, :1] + 3 * new_pos[:, 1:2]
    np.testing.assert_allclose(g.field, expect, atol=1e-4)
    np.testing.assert_allclose(g.target, 2 * expect, atol=1e-4)
    assert (g.omega == 1).all()


def test_compose_order(rng):
    calls = []
    t1 = lambda g: (calls.append(1), g)[1]
    t2 = lambda g: (calls.append(2), g)[1]
    Compose([t1, t2])(Graph())
    assert calls == [1, 2]


def test_spatial_sort(rng):
    """Morton renumbering: a permutation that clusters neighbours and
    leaves (pos, field) rows consistently co-permuted."""
    from graphs4cfd_tpu.ops.order import morton_code, spatial_sort_perm
    g = _ns_graph(rng, n=256)
    pos0, field0 = np.array(g.pos), np.array(g.field)
    T.SpatialSort()(g)
    # it's a permutation of the original rows
    perm = spatial_sort_perm(pos0)
    np.testing.assert_allclose(g.pos, pos0[perm])
    np.testing.assert_allclose(g.field, field0[perm])
    # Morton keys are non-decreasing after the sort
    keys = morton_code(np.asarray(g.pos))
    assert (np.diff(keys.astype(np.int64)) >= 0).all()
    # locality: mean distance between consecutive nodes shrinks a lot
    d_before = np.linalg.norm(np.diff(pos0, axis=0), axis=1).mean()
    d_after = np.linalg.norm(np.diff(np.asarray(g.pos), axis=0),
                             axis=1).mean()
    assert d_after < 0.5 * d_before
    # must come before connectivity
    g2 = _ns_graph(rng)
    T.ConnectKNN(k=4)(g2)
    with pytest.raises(AssertionError):
        T.SpatialSort()(g2)


def test_morton_3d(rng):
    from graphs4cfd_tpu.ops.order import spatial_sort_perm
    pos = rng.random((128, 3)).astype(np.float32)
    perm = spatial_sort_perm(pos)
    assert sorted(perm.tolist()) == list(range(128))
    d_before = np.linalg.norm(np.diff(pos, axis=0), axis=1).mean()
    d_after = np.linalg.norm(np.diff(pos[perm], axis=0), axis=1).mean()
    assert d_after < d_before


def test_batch_grid_clustering_matches_reference_semantics():
    """BatchGridClustering (the compat switch for the reference's
    whole-batch voxel_grid with batch=zeros, transforms/mus.py:25) must
    cluster ALL samples' nodes on one shared grid: its parent assignment
    equals clustering the concatenated positions directly, and samples
    sharing a cell pool into the SAME coarse node."""
    import numpy as np
    import graphs4cfd_tpu as g4c
    from graphs4cfd_tpu import transforms as T
    from graphs4cfd_tpu.loader import collate
    from graphs4cfd_tpu.graph import Graph
    from graphs4cfd_tpu.ops.voxel import voxel_grid

    rng = np.random.default_rng(0)
    gs = []
    for n in (90, 70):
        g = Graph()
        g.pos = rng.random((n, 2)).astype(np.float32)
        g.loc = rng.normal(size=(n, 2)).astype(np.float32)
        g.field = rng.normal(size=(n, 2)).astype(np.float32)
        g.target = rng.normal(size=(n, 2)).astype(np.float32)
        g.omega = np.zeros((n, 1), np.float32)
        g.bound = np.zeros(n, np.uint8)
        g = T.ConnectKNN(k=4)(g)
        g = T.ScaleEdgeAttr(0.02)(g)
        gs.append(g)
    batch = collate(gs, node_bucket=16, edge_bucket=32)
    batch = T.BatchGridClustering([0.3], node_bucket=8, edge_bucket=16)(batch)

    mask = np.asarray(batch.node_mask)
    pos = np.asarray(batch.pos)[mask]
    # reference emulation: one voxel grid over the whole batch
    cluster = voxel_grid(pos, 0.3)
    _, parent_ref = np.unique(cluster, return_inverse=True)
    np.testing.assert_array_equal(np.asarray(batch.parent_2)[mask],
                                  parent_ref)
    # cross-sample sharing actually happens (samples overlap in [0,1]^2)
    b = np.asarray(batch.batch)[mask]
    p = parent_ref
    shared = set(p[b == 0]) & set(p[b == 1])
    assert shared, "expected samples to share coarse cells"

    # the model runs on the batch-shared hierarchy
    W = 16
    MPW = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))
    arch = {"edge_encoder": (2, (W, W), False),
            "node_encoder": (5, (W, W), False),
            "mp111": MPW, "down_mp12": (2 + W, (W, W), True),
            "mp21": MPW, "up_mp21": (2 + W + W, (W, W), True),
            "mp121": MPW, "decoder": (W, (W, 1), False)}
    model = g4c.nn.MuSGNN(arch=arch, seed=0)
    out = np.asarray(model.forward(batch.to_device()))
    assert np.isfinite(out).all()
