"""Pallas kernel correctness in interpreter mode (runs on CPU).

Covers the fused MLP-chain kernel (ops/pallas_mlp.py) and the fused
GN-block kernel (ops/pallas_gnblock.py): forward and full custom-VJP
gradients vs the XLA reference paths.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphs4cfd_tpu.nn.mlp import init_mlp, apply_mlp, apply_mlp_tail
from graphs4cfd_tpu.nn import blocks
from graphs4cfd_tpu.ops.pallas_mlp import fused_mlp
from graphs4cfd_tpu.ops.pallas_gnblock import gn_block_fused


@pytest.mark.parametrize("widths,ln,start", [
    ((128, 128, 128), True, 0),
    ((128, 128, 128), False, 0),
    ((128, 128), True, 0),
    ((128, 128, 128), True, 1),
])
def test_fused_mlp_matches_xla(rng, widths, ln, start):
    params = init_mlp(jax.random.key(1), 256, widths, ln)
    fin = 256 if start == 0 else widths[0]
    x = jnp.asarray(rng.normal(size=(512, fin)).astype(np.float32))
    ref_fn = lambda p, x: apply_mlp_tail(p, x, start=start)
    fus_fn = lambda p, x: fused_mlp(p, x, start=start, interpret=True,
                                    block=256)
    np.testing.assert_allclose(np.asarray(fus_fn(params, x)),
                               np.asarray(ref_fn(params, x)),
                               rtol=1e-4, atol=1e-5)
    g = jnp.asarray(rng.normal(size=(512, widths[-1])).astype(np.float32))
    rg = jax.grad(lambda p, x: (ref_fn(p, x) * g).sum(),
                  argnums=(0, 1))(params, x)
    fg = jax.grad(lambda p, x: (fus_fn(p, x) * g).sum(),
                  argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(rg),
                    jax.tree_util.tree_leaves(fg)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("out_act", [None, "selu"])
def test_fused_gn_block_matches_xla(rng, out_act):
    V, k, H = 512, 4, 128
    v = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(V * k, H)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, V, size=V * k).astype(np.int32))
    receivers = jnp.asarray(np.repeat(np.arange(V, dtype=np.int32), k))
    params = {"edge_mlp": init_mlp(jax.random.key(0), 3 * H, (H, H, H), True),
              "node_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H, H), True)}
    rv, re = blocks.gn_block(params, v, e, senders, receivers, fixed_k=k)
    if out_act == "selu":
        rv, re = jax.nn.selu(rv), jax.nn.selu(re)
    w1 = params["edge_mlp"]["layers"][0]["w"]

    def fused(p, v, e):
        vsg = (v @ p["edge_mlp"]["layers"][0]["w"][H:2 * H])[senders]
        e2, v2 = gn_block_fused(p["edge_mlp"], p["node_mlp"], e, vsg, v, k,
                                block=256, interpret=True,
                                out_activation=out_act)
        return v2, e2

    fv, fe = fused(params, v, e)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(rv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fe), np.asarray(re),
                               rtol=1e-4, atol=1e-5)

    g_v = jnp.asarray(rng.normal(size=rv.shape).astype(np.float32))
    g_e = jnp.asarray(rng.normal(size=re.shape).astype(np.float32))

    def loss_ref(p, v, e):
        rv, re = blocks.gn_block(p, v, e, senders, receivers, fixed_k=k)
        if out_act == "selu":
            rv, re = jax.nn.selu(rv), jax.nn.selu(re)
        return (rv * g_v).sum() + (re * g_e).sum()

    def loss_fused(p, v, e):
        v2, e2 = fused(p, v, e)
        return (v2 * g_v).sum() + (e2 * g_e).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, v, e)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, v, e)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=5e-4)


def test_skip_e_out_dead_output_is_loud(rng):
    """LOUD dead-output contract (VERDICT r4 #5): ``skip_e_out=True``
    returns ``e' = None`` on EVERY dispatch path — here the plain XLA
    path, where the kernel skip can't even engage — so a caller that
    accidentally consumes the dead slot fails at trace time instead of
    silently reading stale state."""
    V, k, H = 32, 4, 16
    senders = jnp.asarray(rng.integers(0, V, size=V * k).astype(np.int32))
    receivers = jnp.asarray(np.repeat(np.arange(V, dtype=np.int32), k))
    v = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(V * k, H)).astype(np.float32))
    params = {"edge_mlp": init_mlp(jax.random.key(0), 3 * H, (H, H), True),
              "node_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H), True)}
    v2, e2 = blocks.gn_block(params, v, e, senders, receivers, fixed_k=k,
                             skip_e_out=True)
    assert e2 is None
    assert v2.shape == (V, H)
    # accidental consumption of the dead output must raise, not compute
    with pytest.raises(TypeError):
        jnp.concatenate([e2, e2], axis=-1)


def test_skip_a_out_dead_output_is_loud(rng):
    """Same loud contract for EdgeMP's skipped a' (XLA path)."""
    E, k, H = 24, 3, 16
    angle_src = jnp.asarray(
        rng.integers(0, E, size=(E, k)).astype(np.int32))
    a = jnp.asarray(rng.normal(size=(E, k, 4)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    params = {"angle_mlp": init_mlp(jax.random.key(0), 4 + 2 * H,
                                    (H, H), True),
              "edge_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H), True)}
    e2, a2 = blocks.edge_mp(params, e, a, angle_src, skip_a_out=True)
    assert a2 is None
    assert e2.shape == (E, H)
    with pytest.raises(TypeError):
        jax.nn.selu(a2)


@pytest.mark.parametrize("out_act", [None, "selu"])
def test_gn_block_fused_skip_e_out_grads(rng, out_act):
    """skip_e_out on the PLAIN fused kernel (no window plan): v' and all
    input grads equal the two-output path under a zero e' cotangent.
    This is the path the GP fallbacks and down_edge_mp ride."""
    V, k, H = 256, 4, 128
    e = jnp.asarray(rng.normal(size=(V * k, H)).astype(np.float32))
    vsg = jnp.asarray(rng.normal(size=(V * k, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(V, H)).astype(np.float32))
    params = {"edge_mlp": init_mlp(jax.random.key(0), 3 * H, (H, H, H),
                                   True),
              "node_mlp": init_mlp(jax.random.key(1), 2 * H, (H, H, H),
                                   True)}

    def run(skip):
        return gn_block_fused(params["edge_mlp"], params["node_mlp"], e,
                              vsg, v, k, interpret=True, block=128,
                              out_activation=out_act, skip_e_out=skip)

    re_, rv = run(False)
    se, sv = run(True)
    assert se is None
    np.testing.assert_allclose(np.asarray(sv), np.asarray(rv),
                               rtol=1e-5, atol=1e-5)

    g_v = jnp.asarray(rng.normal(size=rv.shape).astype(np.float32))

    def loss(skip, e, vsg, v):
        _, av = gn_block_fused(params["edge_mlp"], params["node_mlp"], e,
                               vsg, v, k, interpret=True, block=128,
                               out_activation=out_act, skip_e_out=skip)
        return (av * g_v).sum()

    gr = jax.grad(loss, argnums=(1, 2, 3))(False, e, vsg, v)
    gs = jax.grad(loss, argnums=(1, 2, 3))(True, e, vsg, v)
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=5e-4)
