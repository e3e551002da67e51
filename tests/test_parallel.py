"""Distributed tests on a virtual 8-device CPU mesh (SURVEY §4 item 4).

* DP: sharded train step == single-device train step (same losses/params).
* Graph parallel: partitioned forward == unpartitioned forward exactly
  (halo exchange is pure data movement).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import graphs4cfd_tpu as g4c
from graphs4cfd_tpu.loader import collate, collate_sharded
from graphs4cfd_tpu.parallel import (make_mesh, make_dp_train_step,
                                     partition_graph, make_gp_forward)
from graphs4cfd_tpu.nn.losses import GraphLoss

from test_models import make_cloud, mus_arch, W
from graphs4cfd_tpu import transforms as T


def _samples(seed, sizes):
    pipeline = [T.ConnectKNN(k=4), T.ScaleEdgeAttr(0.02),
                T.GridClustering([0.3])]
    rng = np.random.default_rng(seed)
    gs = []
    for n in sizes:
        g = make_cloud(rng, n)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    return gs


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_dp_matches_single_device():
    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=0)
    gs = _samples(0, [70, 80, 75, 85])
    mesh = make_mesh(num_data=4)
    criterion = GraphLoss(lambda_d=0.25)

    from graphs4cfd_tpu.training.trainer import make_train_step, _adam_opt
    opt = _adam_opt()

    # single-device reference: one batch of all 4 samples
    # (bucket sizes chosen so per-sample padding matches the sharded run)
    sharded = collate_sharded(gs, 4, node_bucket=64, edge_bucket=128)
    # build an equivalent unsharded batch from the same shard groups
    unsharded = collate(gs, node_bucket=64, edge_bucket=128)

    step1 = make_train_step(model.apply, criterion, 1, 2, 1.0)
    o1 = opt.init(model.params)
    p1, o1, loss1, gn1 = step1(model.params, o1, unsharded.to_device(),
                               jnp.float32(1e-3), jnp.bool_(True))

    stepd = make_dp_train_step(model.apply, criterion, 1, 2, 1.0, mesh)
    od = opt.init(model.params)
    pd, od, lossd, gnd = stepd(model.params, od, sharded.to_device(),
                               jnp.float32(1e-3), jnp.bool_(True))

    # exact DP: the distributed criterion psums numerators/denominators,
    # so loss, gradients and updated params equal the single-device batch
    # (up to f32 reduction order) even with unequal valid counts per shard
    np.testing.assert_allclose(float(lossd), float(loss1),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(gnd), float(gn1), rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pd),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graph_parallel_exact_vs_single_device():
    """Edge-partitioned forward must equal the unpartitioned forward."""
    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=1)
    # one "giant" graph; node buckets divisible by 8 at every level
    gs = _samples(3, [430])
    batch = collate(gs, node_bucket=64, edge_bucket=128)
    # make coarse level divisible by 8 too: collate bucket covers level 1;
    # level-2 nodes are bucketed by node_bucket=64 as well
    assert batch.data["pos_2"].shape[0] % 8 == 0

    ref = np.asarray(model.forward(batch.to_device()))

    sharded, info = partition_graph(batch, 8)
    mesh = make_mesh(num_data=1, num_graph=8)
    fwd = make_gp_forward(model, mesh)
    out = np.asarray(fwd(model.params, sharded.to_device()))
    out = out.reshape(-1, out.shape[-1])
    # un-permute level-1 nodes
    perm = info["perms"][1]
    unperm = np.empty_like(out)
    unperm[perm] = out
    valid = np.asarray(batch.node_mask)
    np.testing.assert_allclose(unperm[valid], ref[valid],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graph_parallel_halo_and_allgather_paths_agree():
    """Forcing every halo table on vs none at all must give the same
    forward — pins both communication branches regardless of the
    traffic-based emission rule."""
    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=2)
    batch = collate(_samples(3, [430]), node_bucket=64, edge_bucket=128)
    mesh = make_mesh(num_data=1, num_graph=8)
    fwd = make_gp_forward(model, mesh)
    outs = []
    for frac in (0.0, 1e9):
        sharded, info = partition_graph(batch, 8, halo_max_frac=frac)
        outs.append(np.asarray(fwd(model.params, sharded.to_device())))
    emitted = [k for k in sharded.data if k.startswith("halo_send")]
    assert "halo_send" in emitted and "halo_send_p2" in emitted
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graph_parallel_train_step_matches_single_device():
    """One gp train step == one single-device train step (params close)."""
    from graphs4cfd_tpu.parallel import make_gp_train_step
    from graphs4cfd_tpu.training.trainer import make_train_step, _adam_opt
    import optax

    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=6)
    batch = collate(_samples(11, [430]), node_bucket=64, edge_bucket=128)
    sharded, info = partition_graph(batch, 8)
    mesh = make_mesh(num_data=1, num_graph=8)

    # lambda_d > 0 exercises the Dirichlet L1 term of the distributed
    # criterion (every Ns training config uses it)
    criterion = GraphLoss(lambda_d=0.25)

    # single-device reference step on the SAME (unsharded) batch
    step1 = make_train_step(model.apply, criterion, 1, 2, 1.0)
    o1 = _adam_opt().init(model.params)
    p_ref, _, loss_ref, _ = step1(model.params, o1, batch.to_device(),
                                  jnp.float32(1e-3), jnp.bool_(True))

    stepg = make_gp_train_step(model, criterion, mesh, n_out=2,
                               grad_clip_limit=1.0)
    og = optax.scale_by_adam().init(model.params)
    p_gp, _, loss_gp = stepg(model.params, og, sharded.to_device(),
                             jnp.float32(1e-3), jnp.bool_(True))

    np.testing.assert_allclose(float(loss_gp), float(loss_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_gp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
