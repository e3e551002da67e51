"""Per-layer and per-model numeric parity vs a torch oracle (SURVEY §4.2).

Weights are created in torch with the reference's module naming, converted
through ``import_torch_state_dict``, and forwards compared allclose in f32.
"""
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from graphs4cfd_tpu import ops
from graphs4cfd_tpu.nn import blocks as jblocks
from graphs4cfd_tpu.nn.mlp import apply_mlp
from graphs4cfd_tpu.training.checkpoint import import_torch_state_dict

from oracle_torch import MLP as TorchMLP, GNBlock as TorchGNBlock, \
    scatter_mean, pool_edge_ref, EdgeMP as TorchEdgeMP

torch.manual_seed(0)

ATOL, RTOL = 2e-4, 2e-4


def to_jax_params(module: torch.nn.Module, wrap: str = None):
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    if wrap:
        sd = {f"{wrap}.{k}": v for k, v in sd.items()}
    params = import_torch_state_dict(sd)
    return params[wrap] if wrap else params


def test_mlp_parity(rng):
    for widths, ln in [((128, 128, 128), True), ((128, 128), False),
                       ((64, 64, 64, 64), True)]:
        tm = TorchMLP(32, widths, ln)
        params = to_jax_params(tm, "m")
        x = rng.normal(size=(17, 32)).astype(np.float32)
        ref = tm(torch.tensor(x)).detach().numpy()
        got = np.asarray(apply_mlp(params, jnp.array(x)))
        np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def _random_graph(rng, n=60, k=4):
    pos = rng.random((n, 2)).astype(np.float32)
    s, r, attr = ops.connect_knn(pos, k)
    return pos, s, r, attr


def test_gn_block_parity(rng):
    n, k, F = 60, 4, 32
    _, s, r, _ = _random_graph(rng, n, k)
    tm = TorchGNBlock((F + 2 * F, (64, F), True), (F + F, (64, F), True))
    params = to_jax_params(tm, "mp")
    v = rng.normal(size=(n, F)).astype(np.float32)
    e = rng.normal(size=(n * k, F)).astype(np.float32)
    rv, re = tm(torch.tensor(v), torch.tensor(e),
                torch.tensor(s, dtype=torch.long),
                torch.tensor(r, dtype=torch.long))
    # fixed-k reshape path
    gv, ge = jblocks.gn_block(params, jnp.array(v), jnp.array(e),
                              jnp.array(s), jnp.array(r), fixed_k=k)
    np.testing.assert_allclose(np.asarray(gv), rv.detach().numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(ge), re.detach().numpy(),
                               rtol=RTOL, atol=ATOL)
    # general segment path must agree too
    gv2, _ = jblocks.gn_block(params, jnp.array(v), jnp.array(e),
                              jnp.array(s), jnp.array(r))
    np.testing.assert_allclose(np.asarray(gv2), rv.detach().numpy(),
                               rtol=RTOL, atol=ATOL)


def test_down_up_mp_parity(rng):
    """DownMP + pool_edge + UpMP vs the reference formulas
    (blocks.py:219-237, 265-290)."""
    n, k, F = 80, 4, 16
    pos, s, r, attr = _random_graph(rng, n, k)
    pos2, parent, e_rel = ops.grid_clustering(pos, 0.3)
    n2 = pos2.shape[0]
    field = rng.normal(size=(n, F)).astype(np.float32)
    down = TorchMLP(2 + F, (32, F), True)
    params_down = to_jax_params(down, "d")
    # reference DownMP: e = mlp([e_12, field]); scatter-mean by cluster
    e_t = down(torch.tensor(np.concatenate([e_rel, field], 1)))
    ref_coarse = torch.tanh(scatter_mean(
        e_t, torch.tensor(parent, dtype=torch.long), n2)).detach().numpy()
    got_coarse = np.asarray(jblocks.down_mp(
        params_down, jnp.array(field), jnp.array(e_rel), jnp.array(parent),
        n2))
    np.testing.assert_allclose(got_coarse, ref_coarse, rtol=RTOL, atol=ATOL)

    # pool_edge: runtime mean over static structure vs reference coalesce
    cs, cr, f2c, _ = ops.pool_edge_structure(parent, s, r)
    e_feat = rng.normal(size=(len(s), F)).astype(np.float32)
    rs, rr, rattr = pool_edge_ref(parent, s, r, e_feat)
    got_attr = np.asarray(jblocks.pool_edges(jnp.array(e_feat),
                                             jnp.array(f2c), len(cs)))
    np.testing.assert_array_equal(cs, rs)
    np.testing.assert_array_equal(cr, rr)
    np.testing.assert_allclose(got_attr, rattr, rtol=RTOL, atol=ATOL)

    # UpMP: mlp([-e_12, coarse[parent], skip]) + tanh (blocks.py:265-290)
    up = TorchMLP(2 + F + F, (32, F), True)
    params_up = to_jax_params(up, "u")
    coarse = rng.normal(size=(n2, F)).astype(np.float32)
    skip = rng.normal(size=(n, F)).astype(np.float32)
    ref_up = torch.tanh(up(torch.tensor(np.concatenate(
        [-e_rel, coarse[parent], skip], 1)))).detach().numpy()
    got_up = np.asarray(jblocks.up_mp(params_up, jnp.array(coarse),
                                      jnp.array(e_rel), jnp.array(parent),
                                      jnp.array(skip)))
    np.testing.assert_allclose(got_up, ref_up, rtol=RTOL, atol=ATOL)


def test_edge_mp_parity(rng):
    """REMuS EdgeMP vs oracle on the flat angle list (blocks.py:322-333)."""
    n, k, F = 40, 4, 24
    pos, s, r, attr = _random_graph(rng, n, k)
    unit, angle_src, angle_attr = ops.extend_graph(s, attr, k)
    E = len(s)
    tm = TorchEdgeMP((4 + 2 * F, (32, F), True), (F + F, (32, F), True))
    params = to_jax_params(tm, "mp")
    params = {"angle_mlp": params["edge_mlp"], "edge_mlp": params["node_mlp"]} \
        if "node_mlp" in params else params
    e = rng.normal(size=(E, F)).astype(np.float32)
    # oracle uses flat [E*k] angle lists; ours uses [E, k]
    a_flat = angle_attr.reshape(E * k, 4)
    row = angle_src.reshape(-1)
    col = np.repeat(np.arange(E), k)
    re_, ra = tm(torch.tensor(e), torch.tensor(a_flat),
                 torch.tensor(row, dtype=torch.long),
                 torch.tensor(col, dtype=torch.long))
    ge, ga = jblocks.edge_mp(params, jnp.array(e),
                             jnp.array(angle_attr.astype(np.float32)),
                             jnp.array(angle_src))
    np.testing.assert_allclose(np.asarray(ge), re_.detach().numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(ga).reshape(E * k, -1),
                               ra.detach().numpy(), rtol=RTOL, atol=ATOL)


def test_edge_scalar_to_node_vector_parity(rng):
    """blocks.py:88-114: pinverse solve vs torch.pinverse reference."""
    n, k, F = 30, 5, 8
    pos, s, r, attr = _random_graph(rng, n, k)
    unit, _, _ = ops.extend_graph(s, attr, k)
    e = rng.normal(size=(n * k, F)).astype(np.float32)
    inv_t = torch.pinverse(torch.tensor(unit.reshape(n, k, 2)))
    v_ref = (inv_t @ torch.tensor(e.reshape(n, k, F)))
    v_ref = v_ref.transpose(1, 2).flatten(1, 2).numpy()  # [n, 2F] F-major
    inv = ops.pinv_k2_np(unit.reshape(n, k, 2))
    got = np.asarray(jblocks.edge_scalar_to_node_vector(
        jnp.array(e), jnp.array(inv)))          # [n, F, 2]
    np.testing.assert_allclose(got.reshape(n, -1), v_ref,
                               rtol=1e-3, atol=1e-3)
