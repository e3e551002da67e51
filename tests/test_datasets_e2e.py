"""End-to-end dataset tests: synthetic HDF5 fixtures in the reference
layouts (datasets.py:158-337) through transforms, DataLoader, fit and solve.
"""
import os

import numpy as np
import pytest

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.utils import Compose, random_split, ConcatDataset
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.nn.losses import GraphLoss

W = 24
MPW = ((W + 2 * W, (W, W), True), (W + W, (W, W), True))


def _write_h5(path, n_sims, n_nodes, n_cols, maker):
    import h5py
    data = np.full((n_sims, n_nodes + 5, n_cols), np.nan, np.float32)
    for i in range(n_sims):
        data[i, :n_nodes] = maker(i)
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)


@pytest.fixture
def ns_h5(tmp_path, rng):
    """NsCircle layout: pos(2) Re(1) bound(1) + T frames x (u,v,p)."""
    T, n = 12, 90
    def maker(i):
        r = np.random.default_rng(i)
        pos = r.random((n, 2)).astype(np.float32)
        re = np.full((n, 1), 700.0, np.float32)
        bound = r.integers(0, 5, size=(n, 1)).astype(np.float32)
        frames = r.normal(size=(n, T * 3)).astype(np.float32)
        return np.concatenate([pos, re, bound, frames], axis=1)
    path = str(tmp_path / "NsCircle.h5")
    _write_h5(path, 5, n, 4 + 12 * 3, maker)
    return path


def test_ns_circle_dataset_layout(ns_h5):
    ds = gfd.datasets.NsCircle(format="uvp", path=ns_h5)
    assert len(ds) == 5
    g = ds.get_sequence(0, sequence_start=2, n_in=2, n_out=3)
    assert g.field.shape == (90, 6)     # 2 frames x uvp
    assert g.target.shape == (90, 9)    # 3 frames x uvp
    assert g.omega.shape == (90, 1)
    # omega=1 exactly on inlet(2) and wall(4)
    expect = ((g.bound == 2) | (g.bound == 4)).astype(np.float32)
    np.testing.assert_array_equal(g.omega[:, 0], expect)
    # uv format drops pressure
    ds_uv = gfd.datasets.NsCircle(format="uv", path=ns_h5)
    g2 = ds_uv.get_sequence(0, sequence_start=2, n_in=2, n_out=3)
    assert g2.field.shape == (90, 4)
    np.testing.assert_allclose(g2.field[:, :2], g.field[:, :2])


def test_adv_dataset_layout(tmp_path):
    T, n = 10, 80
    def maker(i):
        r = np.random.default_rng(10 + i)
        pos = r.random((n, 2)).astype(np.float32)
        loc = r.normal(size=(n, 2)).astype(np.float32)
        bound = r.integers(0, 4, size=(n, 1)).astype(np.float32)
        frames = r.normal(size=(n, T)).astype(np.float32)
        return np.concatenate([pos, loc, bound, frames], axis=1)
    path = str(tmp_path / "Adv.h5")
    _write_h5(path, 3, n, 5 + T, maker)
    ds = gfd.datasets.Adv(path=path)
    g = ds.get_sequence(1, sequence_start=0, n_in=1, n_out=3, step=2)
    assert g.field.shape == (80, 1)
    assert g.target.shape == (80, 3)
    assert g.loc.shape == (80, 2)
    np.testing.assert_array_equal(g.omega[:, 0],
                                  (g.bound == 2).astype(np.float32))


def test_ns_ellipse_dataset_layout(tmp_path):
    T, n = 8, 70
    def maker(i):
        r = np.random.default_rng(20 + i)
        pos = r.random((n, 2)).astype(np.float32)
        re = np.full((n, 1), 600.0, np.float32)
        bound = r.integers(0, 5, size=(n, 1)).astype(np.float32)
        frames = r.normal(size=(n, T * 6)).astype(np.float32)
        return np.concatenate([pos, re, bound, frames], axis=1)
    path = str(tmp_path / "NsEllipse.h5")
    _write_h5(path, 2, n, 4 + T * 6, maker)
    ds = gfd.datasets.NsEllipse(format="uv", path=path)
    g = ds.get_sequence(0, sequence_start=1, n_in=1, n_out=2)
    assert g.field.shape == (70, 2)
    assert g.target.shape == (70, 4)


def test_full_training_pipeline_from_h5(ns_h5, tmp_path):
    """The NsMuSGNN example-script path, shrunk: h5 → transforms →
    random_split → DataLoader → fit (curriculum + checkpoint) → solve."""
    transform = Compose([
        gfd.transforms.ConnectKNN(4, period=[None, "auto"]),
        gfd.transforms.ScaleNs({'u': (-2.1, 2.6), 'v': (-2.25, 2.1),
                                'p': (-3.7, 2.35), 'Re': (500, 1000)},
                               format='uvp'),
        gfd.transforms.ScaleEdgeAttr(0.1),
        gfd.transforms.RandomGraphRotation(eq='ns', format='uvp', seed=0),
        gfd.transforms.RandomGraphFlip(eq='ns', format='uvp', seed=0),
        gfd.transforms.AddUniformNoise(0.01, seed=0),
        gfd.transforms.GridClustering([0.3]),
    ])
    cfg = gfd.nn.TrainConfig(
        name="e2e", folder=str(tmp_path), tensor_board=None,
        chk_interval=1, training_loss=GraphLoss(lambda_d=0.25),
        validation_loss=GraphLoss(), epochs=2, num_steps=[1, 2],
        add_steps={'tolerance': 1e9, 'loss': 'training'}, batch_size=2,
        lr=1e-3, grad_clip={"epoch": 0, "limit": 1},
        scheduler={"factor": 0.5, "patience": 5, "loss": 'training'},
        stopping=1e-8)
    ds = gfd.datasets.NsCircle(
        format='uvp', path=ns_h5,
        training_info={"n_in": 1, "n_out": 2, "step": 1, "T": 12},
        transform=transform, seed=0)
    train_set, test_set = random_split(ds, [4, 1])
    train_loader = gfd.DataLoader(train_set, batch_size=2, shuffle=True)
    val_loader = gfd.DataLoader(test_set, batch_size=1)
    arch = {
        "edge_encoder": (2, (W, W), False),
        "node_encoder": (5, (W, W), False),
        "mp111": MPW, "mp112": MPW,
        "down_mp12": (2 + W, (W, W), True),
        "mp21": MPW, "mp22": MPW,
        "up_mp21": (2 + W + W, (W, W), True),
        "mp121": MPW, "mp122": MPW,
        "decoder": (W, (W, 3), False),
    }
    model = gfd.nn.NsTwoScaleGNN(arch=arch)
    model.fit(cfg, train_loader, val_loader=val_loader)
    chk = os.path.join(str(tmp_path), "e2e.chk")
    assert os.path.exists(chk)
    # curriculum advanced (tolerance huge): n_out saved as 2
    from graphs4cfd_tpu.training.checkpoint import load_checkpoint
    assert load_checkpoint(chk)["n_out"] == 2
    # reload self-describing checkpoint and roll out
    model2 = gfd.nn.NsTwoScaleGNN(checkpoint=chk)
    g = ds.get_sequence(0, 0, n_in=1, n_out=5)
    batch = collate([g]).to_device()
    out = model2.solve(batch, n_out=5)
    assert out.shape == (batch.num_nodes, 15)
    assert np.isfinite(np.asarray(out)).all()


def test_concat_and_subset(tmp_path):
    T, n = 6, 30
    def maker(i):
        r = np.random.default_rng(i)
        return np.concatenate([r.random((n, 2)), r.random((n, 2)),
                               np.zeros((n, 1)), r.random((n, T))],
                              axis=1).astype(np.float32)
    path = str(tmp_path / "adv.h5")
    _write_h5(path, 4, n, 5 + T, maker)
    d1 = gfd.datasets.Adv(path=path,
                          training_info={"n_in": 1, "n_out": 1, "step": 1,
                                         "T": T})
    d2 = gfd.datasets.Adv(path=path,
                          training_info={"n_in": 1, "n_out": 1, "step": 1,
                                         "T": T})
    cat = ConcatDataset([d1, d2])
    assert len(cat) == 8
    g = cat[5]
    assert g.pos.shape == (n, 2)
    a, b = random_split(cat, [6, 2], seed=1)
    assert len(a) == 6 and len(b) == 2
