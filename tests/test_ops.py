"""Unit tests for core graph kernels vs dense NumPy / torch oracles.

Covers SURVEY.md §4 plan item 1: segment ops, k-NN builder vs brute force,
Guillard mask vs the serial reference loop, grid clustering, angle indices,
interpolation, and closed-form pinverse round-trips.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from graphs4cfd_tpu import ops


# ---------------------------------------------------------------- segment ops
def test_segment_sum_mean_matches_dense(rng):
    E, V, F = 200, 37, 5
    src = rng.normal(size=(E, F)).astype(np.float32)
    idx = rng.integers(0, V, size=E).astype(np.int32)
    dense_sum = np.zeros((V, F), np.float32)
    np.add.at(dense_sum, idx, src)
    got = np.asarray(ops.segment_sum(jnp.array(src), jnp.array(idx), V))
    np.testing.assert_allclose(got, dense_sum, rtol=1e-5, atol=1e-5)

    counts = np.bincount(idx, minlength=V).astype(np.float32)
    dense_mean = dense_sum / np.maximum(counts, 1)[:, None]
    got = np.asarray(ops.segment_mean(jnp.array(src), jnp.array(idx), V))
    np.testing.assert_allclose(got, dense_mean, rtol=1e-5, atol=1e-5)


def test_segment_with_mask(rng):
    E, V, F = 64, 10, 3
    src = rng.normal(size=(E, F)).astype(np.float32)
    idx = rng.integers(0, V, size=E).astype(np.int32)
    mask = rng.random(E) > 0.3
    ref = np.zeros((V, F), np.float32)
    np.add.at(ref, idx[mask], src[mask])
    got = np.asarray(ops.segment_sum(jnp.array(src), jnp.array(idx), V,
                                     mask=jnp.array(mask)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_aggregate_fixed_k_equals_scatter_mean(rng):
    V, k, F = 30, 4, 8
    e = rng.normal(size=(V * k, F)).astype(np.float32)
    recv = np.repeat(np.arange(V), k)
    ref = np.zeros((V, F), np.float32)
    np.add.at(ref, recv, e)
    ref /= k
    got = np.asarray(ops.aggregate_fixed_k(jnp.array(e), k, V, reduce="mean"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------- k-NN
def _brute_knn(pts, k):
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.argsort(d2 + 1e-12 * np.arange(len(pts))[None, :], axis=1)[:, :k]


def test_connect_knn_matches_brute_force(rng):
    pos = rng.random((50, 2)).astype(np.float32)
    k = 5
    s, r, attr = ops.connect_knn(pos, k)
    assert s.shape == (50 * k,) and attr.shape == (50 * k, 2)
    # receiver-sorted exact-k layout
    np.testing.assert_array_equal(r, np.repeat(np.arange(50), k))
    expected = _brute_knn(pos.astype(np.float64), k)
    np.testing.assert_array_equal(np.sort(s.reshape(50, k), axis=1),
                                  np.sort(expected, axis=1))
    np.testing.assert_allclose(attr, pos[r] - pos[s], rtol=1e-6)


def test_connect_knn_periodic_wraparound():
    # Points on a 1-periodic x-axis: 0.02 and 0.98 are near-neighbours.
    pos = np.array([[0.02, 0.5], [0.98, 0.5], [0.5, 0.5], [0.25, 0.5],
                    [0.75, 0.5]], dtype=np.float32)
    s, r, attr = ops.connect_knn(pos, 1, period=(1.0, None))
    # node 0's nearest neighbour under periodicity is node 1
    assert s[0] == 1
    # wrapped edge_attr x-component must be small (0.02-0.98+1 = 0.04)
    np.testing.assert_allclose(attr[0, 0], 0.04, atol=1e-5)


def test_cross_knn(rng):
    src = rng.random((40, 2))
    q = rng.random((15, 2))
    idx = ops.cross_knn(src, q, 3)
    d2 = ((q[:, None, :] - src[None, :, :]) ** 2).sum(-1)
    expected = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_array_equal(np.sort(idx, 1), np.sort(expected, 1))


# ------------------------------------------------------------ grid clustering
def test_grid_clustering(rng):
    pos = rng.random((100, 2)).astype(np.float32)
    cs = 0.25
    pos_c, parent, e_rel = ops.grid_clustering(pos, cs)
    # every node's parent centroid is mean of its cluster members
    for c in range(pos_c.shape[0]):
        members = pos[parent == c]
        assert len(members) > 0
        np.testing.assert_allclose(pos_c[c], members.mean(0), atol=1e-5)
    np.testing.assert_allclose(e_rel, (pos_c[parent] - pos) / cs, atol=1e-5)
    # coarse order follows ascending linear cell ids (x fastest)
    cells = ops.voxel_grid(pos, cs)
    uniq = np.unique(cells)
    order_cells = np.array([cells[parent == c][0] for c in range(len(uniq))])
    np.testing.assert_array_equal(order_cells, uniq)


# ------------------------------------------------------------------- Guillard
def _reference_guillard(senders, num_nodes, k):
    """Literal NumPy transcription of transforms/mugs.py:21-29."""
    sv = senders.reshape(num_nodes, k)
    coarse = np.ones(num_nodes, dtype=bool)
    for v in range(num_nodes):
        if coarse[v]:
            coarse[sv[v]] = False
    return coarse


def test_guillard_matches_reference_loop(rng):
    pos = rng.random((200, 2)).astype(np.float32)
    s, r, _ = ops.connect_knn(pos, 6)
    got = ops.guillard_coarsening(s, 200, 6)
    ref = _reference_guillard(s, 200, 6)
    np.testing.assert_array_equal(got, ref)
    assert 0 < got.sum() < 200


# ------------------------------------------------------------------ pool_edge
def test_pool_edge_structure(rng):
    V, k = 60, 4
    pos = rng.random((V, 2)).astype(np.float32)
    s, r, attr = ops.connect_knn(pos, k)
    _, parent, _ = ops.grid_clustering(pos, 0.3)
    cs, cr, f2c, cnt = ops.pool_edge_structure(parent, s, r)
    # no self loops, receiver-sorted, unique pairs
    assert (cs != cr).all()
    keys = cr.astype(np.int64) * 10**6 + cs
    assert (np.diff(keys) > 0).all()
    # mapping consistency
    for e in range(len(s)):
        if parent[s[e]] == parent[r[e]]:
            assert f2c[e] == -1
        else:
            j = f2c[e]
            assert cs[j] == parent[s[e]] and cr[j] == parent[r[e]]
    np.testing.assert_array_equal(
        cnt, np.bincount(f2c[f2c >= 0], minlength=len(cs)))
    # runtime segment-mean over fine edge attrs == torch-style coalesce mean
    ref = np.zeros((len(cs), 2), np.float32)
    np.add.at(ref, f2c[f2c >= 0], attr[f2c >= 0])
    ref /= cnt[:, None]
    got = np.asarray(ops.segment_mean(jnp.array(attr), jnp.array(f2c),
                                      len(cs), mask=jnp.array(f2c >= 0)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------- angles
def _reference_extend_graph(senders, receivers, edge_attr, k):
    """Literal NumPy transcription of transforms/remus.py:27-44."""
    num_edges = len(senders)
    size = np.linalg.norm(edge_attr, axis=1, keepdims=True)
    unit = edge_attr / size
    rows = np.concatenate(
        [np.nonzero(receivers == s)[0] for s in senders])
    cols = np.repeat(np.arange(num_edges), k)
    cos = (unit[rows] * unit[cols]).sum(1)
    sin = unit[rows, 0] * unit[cols, 1] - unit[rows, 1] * unit[cols, 0]
    attr = np.concatenate([size[rows], size[cols], cos[:, None],
                           sin[:, None]], axis=1)
    return unit, rows.reshape(num_edges, k), cols, attr.reshape(num_edges, k, 4)


def test_extend_graph_matches_reference(rng):
    pos = rng.random((40, 2)).astype(np.float32)
    k = 3
    s, r, attr = ops.connect_knn(pos, k)
    unit, angle_src, angle_attr = ops.extend_graph(s, attr, k)
    runit, rrows, _, rattr = _reference_extend_graph(s, r, attr, k)
    np.testing.assert_allclose(unit, runit, rtol=1e-5)
    np.testing.assert_array_equal(angle_src, rrows)
    np.testing.assert_allclose(angle_attr, rattr, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------- interpolation
def test_knn_interp_round_trip(rng):
    src_pos = rng.random((30, 2)).astype(np.float32)
    q_pos = rng.random((50, 2)).astype(np.float32)
    idx, w = ops.knn_interp_weights(src_pos, q_pos, 3)
    x = rng.normal(size=(30, 4)).astype(np.float32)
    y = np.asarray(ops.knn_interpolate(jnp.array(x), jnp.array(idx),
                                       jnp.array(w)))
    # scatter-style oracle (reference blocks.py:34-48)
    y_idx = np.repeat(np.arange(50), 3)
    x_idx = idx.reshape(-1)
    ws = w.reshape(-1, 1)
    num = np.zeros((50, 4), np.float32)
    den = np.zeros((50, 1), np.float32)
    np.add.at(num, y_idx, x[x_idx] * ws)
    np.add.at(den, y_idx, ws)
    np.testing.assert_allclose(y, num / den, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------- linalg
def test_pinv_k2_matches_numpy_pinv(rng):
    a = rng.normal(size=(25, 5, 2)).astype(np.float32)
    ref = np.stack([np.linalg.pinv(m) for m in a])
    np.testing.assert_allclose(ops.pinv_k2_np(a), ref, rtol=1e-4, atol=1e-5)
    got = np.asarray(ops.pinv_k2(jnp.array(a)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_pinv_projection_round_trip(rng):
    # project node vectors onto k edge unit vectors, then solve back
    V, k = 10, 5
    theta = rng.random((V, k)) * 2 * np.pi
    units = np.stack([np.cos(theta), np.sin(theta)], axis=-1)  # [V,k,2]
    vec = rng.normal(size=(V, 2)).astype(np.float32)
    proj = (units * vec[:, None, :]).sum(-1)                    # [V,k]
    inv = ops.pinv_k2_np(units)                                 # [V,2,k]
    rec = (inv @ proj[..., None])[..., 0]
    np.testing.assert_allclose(rec, vec, rtol=1e-3, atol=1e-4)
