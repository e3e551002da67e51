"""Orbax-backed checkpoint manager: versioned steps, GC, exact round-trip."""
import numpy as np
import jax
import pytest

import graphs4cfd_tpu as g4c
from graphs4cfd_tpu.training import OrbaxCheckpointer

from test_models import mus_arch


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    model = g4c.nn.MuSGNN(arch=mus_arch(5, 1), seed=3)
    ck = OrbaxCheckpointer(str(tmp_path), max_to_keep=2)
    sched = {"lr": 1e-4, "best": 0.3}
    for step in (1, 2, 3):
        ck.save(step, arch=model.arch, weights=model.params, n_out=2,
                lr=1e-4, scheduler_state=sched)
    assert ck.latest_step() == 3
    import os
    assert sorted(os.listdir(tmp_path)) == ["2", "3"]  # max_to_keep GC
    st = ck.restore()
    assert st["arch"] == model.arch
    assert st["n_out"] == 2 and st["epoch"] == 3
    assert st["scheduler"]["best"] == 0.3
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(st["weights"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
