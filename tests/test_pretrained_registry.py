"""Pretrained-model registry: framework-trained bundled weights.

The reference ships version-keyed pretrained checkpoints inside the
package (``/root/reference/graphs4cfd/nn/mus_gnn.py:43-48`` →
``nn/weights/``); its own binaries are Git-LFS stubs upstream, so this
framework bundles checkpoints *it trained itself* (the synthetic-advection
and Taylor–Green capability models, ``tools/bundle_pretrained.py``).

These tests run against whatever is actually bundled under
``graphs4cfd_tpu/nn/weights/`` — each registry entry with a present file
must construct a model end-to-end and produce a finite forward pass.
"""
import os

import numpy as np
import pytest

import graphs4cfd_tpu as gfd
from graphs4cfd_tpu.graph import Graph
from graphs4cfd_tpu.loader import collate
from graphs4cfd_tpu.nn.model import GNN, bundled_checkpoint_path
from graphs4cfd_tpu.utils import Compose


def _registry_entries():
    out = []
    for name in dir(gfd.nn):
        cls = getattr(gfd.nn, name)
        if isinstance(cls, type) and issubclass(cls, GNN) \
                and getattr(cls, "PRETRAINED", None):
            for version, rel in cls.PRETRAINED.items():
                out.append((cls, version, rel))
    return out


ENTRIES = _registry_entries()
BUNDLED = [(c, v, r) for c, v, r in ENTRIES
           if os.path.exists(bundled_checkpoint_path(r))]


def test_registry_covers_all_model_classes():
    """Every reference model family exposes version-keyed PRETRAINED names
    (mus_gnn.py:43-48 etc.), whether or not binaries are bundled."""
    classes = {c.__name__ for c, _, _ in ENTRIES}
    for expect in ("NsOneScaleGNN", "NsTwoScaleGNN", "NsThreeScaleGNN",
                   "NsFourScaleGNN", "AdvOneScaleGNN", "AdvTwoScaleGNN",
                   "AdvThreeScaleGNN", "AdvFourScaleGNN",
                   "NsTwoGuillardScaleGNN", "NsThreeGuillardScaleGNN",
                   "NsFourGuillardScaleGNN", "NsRotEquiThreeScaleGNN"):
        assert expect in classes, expect


def test_unknown_version_lists_available():
    with pytest.raises(ValueError, match="not recognized"):
        gfd.nn.NsThreeScaleGNN(model="no-such-version")


@pytest.mark.skipif(not BUNDLED, reason="no pretrained binaries bundled")
@pytest.mark.parametrize("cls,version,rel",
                         [(c, v, r) for c, v, r in BUNDLED],
                         ids=[v for _, v, _ in BUNDLED])
def test_bundled_checkpoint_constructs_and_runs(cls, version, rel):
    """`Model(model=version)` self-describes arch + weights and the loaded
    model produces a finite forward on a compatible synthetic graph."""
    model = cls(model=version)
    assert model.params is not None and model.arch is not None
    if any(k.startswith(("down_mp", "mp2", "mp3")) for k in model.arch):
        pytest.skip("multi-scale bundle: forward needs clustering levels; "
                    "covered by the rollout-regression fixtures")

    # infer a compatible input from the arch dict: node-encoder fan-in
    # minus omega(1) [minus loc(2) for adv models] = field columns
    n_in = model.arch["node_encoder"][0]
    rng = np.random.default_rng(0)
    n = 256
    g = Graph()
    g.pos = rng.random((n, 2)).astype(np.float32)
    is_adv = cls.__name__.startswith("Adv")
    if is_adv:
        nf = n_in - 3                       # loc(2) + omega(1)
        g.loc = rng.normal(size=(n, 2)).astype(np.float32)
    else:
        nf = n_in - 2                       # glob/Re(1) + omega(1)
        g.glob = np.full((n, 1), 0.5, np.float32)
    g.field = rng.normal(size=(n, nf)).astype(np.float32) * 0.1
    g.target = rng.normal(size=(n, nf)).astype(np.float32)
    g.omega = np.zeros((n, 1), np.float32)
    g.bound = np.ones(n, np.uint8)
    tf = Compose([gfd.transforms.ConnectKNN(6, period=(1.0, 1.0)),
                  gfd.transforms.ScaleEdgeAttr(0.04)])
    batch = collate([tf(g)], node_bucket=64, edge_bucket=128).to_device()
    pred = np.asarray(model.solve(batch, n_out=1))
    assert pred.shape[1] == model.num_fields
    assert np.isfinite(pred).all()
