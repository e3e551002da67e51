"""Rollout (solve) smoke for gMuS/REMuS + loader edge cases."""
import numpy as np
import pytest

import graphs4cfd_tpu as g4c
from graphs4cfd_tpu.loader import collate, DataLoader

from test_models import (build_mugs_batch, build_remus_batch, mugs_arch,
                         remus_arch, make_cloud)
from graphs4cfd_tpu import transforms as T


def test_mugs_solve():
    model = g4c.nn.MuGSGNN(arch=mugs_arch(6, 1), seed=0)
    batch = build_mugs_batch(np.random.default_rng(1), [150], pad=True)
    out = model.solve(batch.to_device(), n_out=3)
    assert out.shape == (batch.num_nodes, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_remus_solve():
    model = g4c.nn.REMuSGNN(arch=remus_arch(), seed=0)
    batch = build_remus_batch(np.random.default_rng(2), [140], pad=True)
    out = model.solve(batch.to_device(), n_out=3)
    assert out.shape == (batch.num_nodes, 6)  # num_fields=2 × 3 steps
    assert np.isfinite(np.asarray(out)).all()


def test_loader_single_sample_and_odd_batch():
    class DS:
        def __init__(self):
            self.tf = [T.ConnectKNN(k=4), T.GridClustering([0.3])]

        def __len__(self):
            return 5

        def __getitem__(self, i):
            g = make_cloud(np.random.default_rng(i), 60 + i)
            for t in self.tf:
                g = t(g)
            return g

    loader = DataLoader(DS(), batch_size=2)
    batches = list(loader)
    assert len(batches) == 3                      # 2 + 2 + 1
    assert batches[-1].data["num_graphs"] == 1    # odd tail batch
    loader2 = DataLoader(DS(), batch_size=2, drop_last=True)
    assert len(list(loader2)) == 2


def test_collate_requires_consistent_static_keys():
    g1 = make_cloud(np.random.default_rng(0), 40)
    g2 = make_cloud(np.random.default_rng(1), 40)
    g1 = T.ConnectKNN(k=4)(g1)
    g2 = T.ConnectKNN(k=5)(g2)   # different fixed_k
    with pytest.raises(AssertionError):
        collate([g1, g2])
