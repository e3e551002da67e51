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
    emitted = [k for k in sharded.data if k.startswith("halo_")]
    assert "halo_s" in emitted and "halo_p_2" in emitted
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_serialize_halo_ablation_numerics_unchanged(monkeypatch):
    """GRAPHS4CFD_ABLATE=serialize_halo (the forced-sequential overlap
    control in bench_scaling) must not change the partitioned forward —
    the barrier only constrains scheduling."""
    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=2)
    batch = collate(_samples(3, [430]), node_bucket=64, edge_bucket=128)
    sharded, _ = partition_graph(batch, 8)
    mesh = make_mesh(num_data=1, num_graph=8)
    ref = np.asarray(make_gp_forward(model, mesh)(
        model.params, sharded.to_device()))
    monkeypatch.setenv("GRAPHS4CFD_ABLATE", "serialize_halo")
    out = np.asarray(make_gp_forward(model, mesh)(
        model.params, sharded.to_device()))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


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
    p_gp, _, loss_gp, _ = stepg(model.params, og, sharded.to_device(),
                             jnp.float32(1e-3), jnp.bool_(True))

    np.testing.assert_allclose(float(loss_gp), float(loss_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_gp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# graph parallelism for the other two families (VERDICT r1 item 1): the
# partitioned forward/train step must equal the single-device one exactly,
# with halo tables forced on and with the all_gather fallback forced.
from test_models import mugs_arch, remus_arch


def _mugs_batch(seed=7, n=430):
    pipeline = [T.GuillardCoarseningAndConnectKNN(
        k=[4, 4, 4], scale_edge_attr=(0.02, 0.04, 0.08)),
        T.BuildKnnInterpWeights(3)]
    rng = np.random.default_rng(seed)
    g = make_cloud(rng, n, with_glob=True)
    for t in pipeline:
        g = t(g)
    # every level's node count must divide the 8-way graph axis
    return collate([g], node_bucket=16, edge_bucket=64)


def _remus_batch(seed=8, n=430):
    pipeline = [T.BuildRemusGraph(num_levels=3, k=4,
                                  scale_edge_length=(0.02, 0.04, 0.08)),
                T.BuildKnnInterpWeights(3)]
    rng = np.random.default_rng(seed)
    g = make_cloud(rng, n, n_in=1, nf=2, with_loc=False, with_glob=True)
    for t in pipeline:
        g = t(g)
    return collate([g], node_bucket=16, edge_bucket=64)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("family", ["mugs", "remus"])
@pytest.mark.parametrize("frac", [0.0, 1e9])
def test_graph_parallel_families_exact(family, frac):
    """Partitioned gMuS/REMuS forward == single-device, halo-forced
    (frac=1e9) and all_gather-forced (frac=0)."""
    if family == "mugs":
        model = g4c.nn.MuGSGNN(arch=mugs_arch(6, 1), seed=3)
        batch = _mugs_batch()
    else:
        model = g4c.nn.REMuSGNN(arch=remus_arch(), seed=4)
        batch = _remus_batch()
    ref = np.asarray(model.forward(batch.to_device()))

    sharded, info = partition_graph(batch, 8, halo_max_frac=frac)
    emitted = [k for k in sharded.data if k.startswith("halo_")]
    if frac == 1e9:
        if family == "mugs":
            for key in ("halo_s", "halo_s_2", "halo_d_2", "halo_u_2"):
                assert key in emitted, (key, emitted)
        else:
            for key in ("halo_s", "halo_o", "halo_x_2", "halo_u_2"):
                assert key in emitted, (key, emitted)
    else:
        assert not emitted
    mesh = make_mesh(num_data=1, num_graph=8)
    fwd = make_gp_forward(model, mesh)
    out = np.asarray(fwd(model.params, sharded.to_device()))
    out = out.reshape(-1, out.shape[-1])
    perm = info["perms"][1]
    unperm = np.empty_like(out)
    unperm[perm] = out
    valid = np.asarray(batch.node_mask)
    np.testing.assert_allclose(unperm[valid], ref[valid],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("family", ["mugs", "remus"])
def test_graph_parallel_families_train_step(family):
    """One GP train step == one single-device train step for gMuS/REMuS
    (certifies the halo backward through select/interp/angle gathers)."""
    from graphs4cfd_tpu.parallel import make_gp_train_step
    from graphs4cfd_tpu.training.trainer import make_train_step, _adam_opt
    import optax

    if family == "mugs":
        model = g4c.nn.MuGSGNN(arch=mugs_arch(6, 1), seed=5)
        batch = _mugs_batch(seed=9)
    else:
        model = g4c.nn.REMuSGNN(arch=remus_arch(), seed=6)
        batch = _remus_batch(seed=10)
    criterion = GraphLoss(lambda_d=0.25)
    nf = model.num_fields

    step1 = make_train_step(model.apply, criterion, nf, 2, 1.0)
    o1 = _adam_opt().init(model.params)
    p_ref, _, loss_ref, _ = step1(model.params, o1, batch.to_device(),
                                  jnp.float32(1e-3), jnp.bool_(True))

    sharded, info = partition_graph(batch, 8)
    mesh = make_mesh(num_data=1, num_graph=8)
    stepg = make_gp_train_step(model, criterion, mesh, n_out=2,
                               grad_clip_limit=1.0)
    og = optax.scale_by_adam().init(model.params)
    p_gp, _, loss_gp, _ = stepg(model.params, og, sharded.to_device(),
                             jnp.float32(1e-3), jnp.bool_(True))

    np.testing.assert_allclose(float(loss_gp), float(loss_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_gp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graph_parallel_fused_wg_kernel_exact(monkeypatch):
    """The per-device windowed-MXU plans the partitioner rebuilds over the
    halo-extended local table must drive the fused Pallas GN kernel
    (interpret mode on CPU) to the same forward and parameter gradients
    as the single-device path — certifies VERDICT r1 item 3 (fast kernels
    under partitioning)."""
    from graphs4cfd_tpu import config as g4c_config
    monkeypatch.setattr(g4c_config, "use_pallas", True)
    monkeypatch.setenv("GRAPHS4CFD_GP_GATHER_WINDOW", "256")
    monkeypatch.setenv("GRAPHS4CFD_GP_GATHER_BLOCK", "64")

    H = 128
    mp = ((H + 2 * H, (H, H, H), True), (H + H, (H, H, H), True))
    arch = {"edge_encoder": (2, (H, H, H), False),
            "node_encoder": (5, (H, H, H), False),
            "mp111": mp, "mp112": mp,
            "decoder": (H, (H, H, 1), False)}
    model = g4c.nn.MuSGNN(arch=arch, seed=11)
    rng = np.random.default_rng(12)
    g = make_cloud(rng, 2000)
    g = T.ConnectKNN(k=4)(g)
    g = T.ScaleEdgeAttr(0.02)(g)
    batch = collate([g], node_bucket=256, edge_bucket=64)

    sharded, info = partition_graph(batch, 8)
    assert "wg_starts" in sharded.data, "GP window plans were not built"
    mesh = make_mesh(num_data=1, num_graph=8)

    # forward exactness (fused-wg kernel engaged per device)
    ref = np.asarray(model.forward(batch.to_device()))
    out = np.asarray(make_gp_forward(model, mesh)(
        model.params, sharded.to_device()))
    out = out.reshape(-1, out.shape[-1])
    unperm = np.empty_like(out)
    unperm[info["perms"][1]] = out
    valid = np.asarray(batch.node_mask)
    np.testing.assert_allclose(unperm[valid], ref[valid],
                               rtol=2e-4, atol=2e-4)

    # gradient exactness through the kernel's custom VJP + halo transpose
    from graphs4cfd_tpu.parallel import make_gp_train_step
    from graphs4cfd_tpu.training.trainer import make_train_step, _adam_opt
    import optax
    crit = GraphLoss(lambda_d=0.25)
    step1 = make_train_step(model.apply, crit, 1, 1, 1.0)
    o1 = _adam_opt().init(model.params)
    p_ref, _, loss_ref, _ = step1(model.params, o1, batch.to_device(),
                                  jnp.float32(1e-3), jnp.bool_(True))
    stepg = make_gp_train_step(model, crit, mesh, n_out=1,
                               grad_clip_limit=1.0)
    og = optax.scale_by_adam().init(model.params)
    p_gp, _, loss_gp, _ = stepg(model.params, og, sharded.to_device(),
                             jnp.float32(1e-3), jnp.bool_(True))
    np.testing.assert_allclose(float(loss_gp), float(loss_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_gp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("axis", ["dp", "gp", "dpgp"])
def test_fit_on_mesh(tmp_path, axis):
    """model.fit trains end-to-end on the virtual mesh straight from
    TrainConfig (devices / graph_devices), with curriculum + checkpoint +
    resume semantics intact — the reference's one-call UX
    (/root/reference/graphs4cfd/nn/model.py:152) on a mesh."""
    from graphs4cfd_tpu.loader import DataLoader

    pipeline = [T.ConnectKNN(k=4), T.ScaleEdgeAttr(0.02),
                T.GridClustering([0.3])]

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            g = make_cloud(np.random.default_rng(100 + i), 80 + (i % 3))
            for t in pipeline:
                g = t(g)
            return g

    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=9)
    kw = {"dp": dict(devices=4, batch_size=4),
          "gp": dict(graph_devices=8, batch_size=8),
          "dpgp": dict(devices=2, graph_devices=4, batch_size=4)}[axis]
    cfg = g4c.nn.TrainConfig(
        name="mesh_fit", folder=str(tmp_path), tensor_board=None,
        chk_interval=1, training_loss=GraphLoss(lambda_d=0.25),
        validation_loss=GraphLoss(), epochs=2, num_steps=[1, 2],
        add_steps={"tolerance": 1e9, "loss": "training"}, lr=1e-3,
        grad_clip={"epoch": 0, "limit": 1},
        scheduler={"factor": 0.5, "patience": 5, "loss": "training"},
        stopping=1e-9, mixed_precision=False, **kw)
    loader = DataLoader(DS(), batch_size=cfg["batch_size"], shuffle=True,
                        node_bucket=16, edge_bucket=64)
    val_loader = DataLoader(DS(), batch_size=cfg["batch_size"],
                            node_bucket=16, edge_bucket=64)
    model.fit(cfg, loader, val_loader)
    chk = tmp_path / "mesh_fit.chk"
    assert chk.exists()
    # resume continues from the checkpoint without error
    cfg.checkpoint = str(chk)
    cfg.epochs = 3
    model.fit(cfg, loader, val_loader)
    for leaf in jax.tree_util.tree_leaves(model.params):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gp_rollout_matches_single_device():
    """Partitioned autoregressive rollout == single-device solve."""
    from graphs4cfd_tpu.parallel import make_gp_rollout
    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=14)
    batch = collate(_samples(17, [430]), node_bucket=64, edge_bucket=128)
    ref = np.asarray(model.solve(batch.to_device(), n_out=3))

    sharded, info = partition_graph(batch, 8)
    mesh = make_mesh(num_data=1, num_graph=8)
    out = np.asarray(make_gp_rollout(model, mesh, n_out=3)(
        model.params, sharded.to_device()))
    out = out.reshape(-1, out.shape[-1])
    unperm = np.empty_like(out)
    unperm[info["perms"][1]] = out
    valid = np.asarray(batch.node_mask)
    np.testing.assert_allclose(unperm[valid], ref[valid],
                               rtol=5e-4, atol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("family", ["mus", "mugs"])
def test_gp_skip_counters_match_single_chip(family):
    """The dead-output elision carries to the graph-parallel path
    (VERDICT r4 #4): tracing the GP forward records the SAME skip
    counters as tracing the single-chip forward."""
    from graphs4cfd_tpu.config import fast_path_report

    if family == "mus":
        model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=1)
        batch = collate(_samples(3, [430]), node_bucket=64,
                        edge_bucket=128)
    else:
        model = g4c.nn.MuGSGNN(arch=mugs_arch(6, 1), seed=3)
        batch = _mugs_batch()

    fast_path_report(reset=True)
    np.asarray(model.forward(batch.to_device()))
    single = {k: v for k, v in fast_path_report(reset=True).items()
              if k.startswith("skip:")}
    assert single, "single-chip trace recorded no skip counters"

    sharded, _ = partition_graph(batch, 8)
    mesh = make_mesh(num_data=1, num_graph=8)
    fwd = make_gp_forward(model, mesh)
    np.asarray(fwd(model.params, sharded.to_device()))
    gp = {k: v for k, v in fast_path_report(reset=True).items()
          if k.startswith("skip:")}
    assert gp == single, (gp, single)
