"""DP sharding works for every model family (collate_sharded is generic)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import graphs4cfd_tpu as g4c
from graphs4cfd_tpu.loader import collate_sharded
from graphs4cfd_tpu.parallel import make_mesh, make_dp_train_step
from graphs4cfd_tpu.nn.losses import GraphLoss

from test_models import (build_mugs_batch, build_remus_batch, mugs_arch,
                         remus_arch, make_cloud)
from graphs4cfd_tpu import transforms as T


def _shard_step(model, samples, n_devices=2):
    mesh = make_mesh(num_data=n_devices)
    sharded = collate_sharded(samples, n_devices, node_bucket=64,
                              edge_bucket=128)
    step = make_dp_train_step(model.apply, GraphLoss(), model.num_fields,
                              1, 1.0, mesh)
    opt_state = optax.scale_by_adam().init(model.params)
    p, o, loss, gn = step(model.params, opt_state, sharded.to_device(),
                          jnp.float32(1e-4), jnp.bool_(True))
    assert np.isfinite(float(loss)) and np.isfinite(float(gn))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_dp_mugs():
    model = g4c.nn.MuGSGNN(arch=mugs_arch(6, 1), seed=0)
    pipeline = [T.GuillardCoarseningAndConnectKNN(
        k=[4, 4, 4], scale_edge_attr=(0.02, 0.04, 0.08)),
        T.BuildKnnInterpWeights(3)]
    rng = np.random.default_rng(5)
    gs = []
    for n in (180, 200):
        g = make_cloud(rng, n, with_glob=True)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    _shard_step(model, gs)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_dp_remus():
    model = g4c.nn.REMuSGNN(arch=remus_arch(), seed=1)
    pipeline = [T.BuildRemusGraph(num_levels=3, k=4,
                                  scale_edge_length=(0.02, 0.04, 0.08)),
                T.BuildKnnInterpWeights(3)]
    rng = np.random.default_rng(6)
    gs = []
    for n in (110, 120):
        g = make_cloud(rng, n, n_in=1, nf=2, with_loc=False, with_glob=True)
        for t in pipeline:
            g = t(g)
        gs.append(g)
    _shard_step(model, gs)


def test_remus_equivariance_bf16():
    """Rotation equivariance survives bf16 compute (looser tolerance)."""
    model = g4c.nn.REMuSGNN(arch=remus_arch(), seed=13,
                            compute_dtype=jnp.bfloat16)
    from graphs4cfd_tpu.loader import collate
    theta = 63.0

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
    R = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
    # bf16 mantissa ≈ 8 bits → relative error ~1e-2 through deep nets
    err = np.abs(out_rot - out_plain @ R)
    scale = np.abs(out_plain).mean() + 1e-3
    assert (err.mean() / scale) < 0.05, (err.mean(), scale)
