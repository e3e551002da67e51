"""Tests for the eval/viz side layer: metrics.r2 and the plot module.

The r2 oracle mirrors the reference semantics exactly
(``/root/reference/graphs4cfd/metrics.py:4-24``), including the
exact-mean element-masking quirk (SURVEY §7.4).  Plot tests render to
files through the Agg backend and assert figures are produced and closed.
"""
import os

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from graphs4cfd_tpu import metrics, plot  # noqa: E402


def _r2_oracle(pred, target):
    mean = target.mean()
    mask = target != mean
    res = ((target[mask] - pred[mask]) ** 2).sum()
    tot = ((target[mask] - mean) ** 2).sum()
    return 1 - res / tot


class TestR2:
    def test_perfect_prediction(self):
        rng = np.random.default_rng(0)
        t = rng.normal(size=200).astype(np.float32)
        assert metrics.r2(t, t) == pytest.approx(1.0)

    def test_matches_oracle_1d_2d(self):
        rng = np.random.default_rng(1)
        for shape in [(50,), (20, 7)]:
            t = rng.normal(size=shape)
            p = t + 0.1 * rng.normal(size=shape)
            assert metrics.r2(p, t) == pytest.approx(_r2_oracle(p, t),
                                                     rel=1e-6)

    def test_mean_prediction_scores_zero(self):
        rng = np.random.default_rng(2)
        t = rng.normal(size=100)
        p = np.full_like(t, t.mean())
        assert metrics.r2(p, t) == pytest.approx(0.0, abs=1e-9)

    def test_exact_mean_elements_excluded(self):
        # Elements equal to the target mean are masked out — the reference
        # quirk: their (wrong) predictions must not affect the score.
        t = np.array([0.0, 2.0, 1.0, 1.0])          # mean = 1.0
        p_good = np.array([0.0, 2.0, 99.0, -5.0])   # wrong only on masked
        assert metrics.r2(p_good, t) == pytest.approx(1.0)

    def test_rejects_3d(self):
        with pytest.raises(RuntimeError):
            metrics.r2(np.zeros((2, 2, 2)), np.zeros((2, 2, 2)))

    def test_rollout_rmse(self):
        rng = np.random.default_rng(3)
        t = rng.normal(size=(30, 6))
        p = t + 1.0
        assert metrics.rollout_rmse(p, t) == pytest.approx(1.0)
        mask = np.zeros(30, bool)
        mask[:10] = True
        p2 = t.copy()
        p2[10:] += 100.0  # only masked-out rows are wrong
        assert metrics.rollout_rmse(p2, t, node_mask=mask) == 0.0


@pytest.fixture
def mesh():
    rng = np.random.default_rng(7)
    pos = rng.random((80, 2)).astype(np.float32)
    u = np.sin(4 * pos[:, 0]) * np.cos(3 * pos[:, 1])
    bound = np.zeros(80, np.int64)
    bound[:12] = 4
    return pos, u, bound


class TestTriangulations:
    def test_boundary_mask(self, mesh):
        pos, _, bound = mesh
        tr = plot.triang_boundary_mask(pos, bound, boundary_idx=4)
        assert tr.mask is not None
        # masked tris are exactly those with all three vertices on bound 4
        on = bound[tr.triangles]
        np.testing.assert_array_equal(tr.mask, (on == 4).all(axis=1))

    def test_boundary_mask_list_idx(self, mesh):
        pos, _, bound = mesh
        bound = bound.copy()
        bound[12:20] = 2
        tr = plot.triang_boundary_mask(pos, bound, boundary_idx=[4, 2])
        on = bound[tr.triangles]
        expect = (on == 4).all(axis=1) | (on == 2).all(axis=1)
        np.testing.assert_array_equal(tr.mask, expect)

    def test_small_tri_mask_removes_large(self, mesh):
        pos, _, _ = mesh
        tr = plot.triang_small_tri_mask(pos, tri_ratio=1.0)
        assert tr.mask.any() and not tr.mask.all()

    def test_small_tri_mask_box(self, mesh):
        pos, _, _ = mesh
        tr = plot.triang_small_tri_mask(pos, tri_ratio=0.5,
                                        box=[0.0, 1.0, 0.0, 1.0])
        assert tr.mask is not None


class TestPlots:
    def test_pos_2d_3d(self, mesh, tmp_path):
        pos, _, _ = mesh
        f2 = str(tmp_path / "p2.png")
        plot.pos(pos, file=f2, show=False)
        assert os.path.getsize(f2) > 0
        pos3 = np.concatenate([pos, pos[:, :1]], axis=1)
        f3 = str(tmp_path / "p3.png")
        plot.pos(pos3, file=f3, show=False)
        assert os.path.getsize(f3) > 0
        assert not plt.get_fignums(), "figures must be closed"

    def test_pos_field(self, mesh, tmp_path):
        pos, u, _ = mesh
        f = str(tmp_path / "pf.png")
        plot.pos_field(pos, u, file=f, show=False, vmin=-1, vmax=1)
        assert os.path.getsize(f) > 0

    def test_field_variants(self, mesh, tmp_path):
        pos, u, bound = mesh
        f1 = str(tmp_path / "f1.png")
        plot.field(pos, u, file=f1, show=False)
        f2 = str(tmp_path / "f2.png")
        plot.field(pos, u, bound=bound, boundary_idx=4, file=f2, show=False)
        f3 = str(tmp_path / "f3.png")
        plot.field(pos, u, tri_ratio=2.0, file=f3, show=False)
        for f in (f1, f2, f3):
            assert os.path.getsize(f) > 0
        assert not plt.get_fignums()

    def test_compare_fields(self, mesh, tmp_path):
        pos, u, bound = mesh
        u1 = np.stack([u, u * 0.5], axis=1)
        u2 = u1 + 0.05
        f = str(tmp_path / "cmp.png")
        plot.compare_fields(pos, u1, u2, bound=bound, boundary_idx=4,
                            file=f, show=False)
        assert os.path.getsize(f) > 0
        assert not plt.get_fignums()

    def test_input_validation(self, mesh):
        pos, u, _ = mesh
        with pytest.raises(AssertionError):
            plot.pos_field(pos, np.stack([u, u], axis=1), show=False)
        with pytest.raises(AssertionError):
            plot.field(pos[:-1], u, show=False)
