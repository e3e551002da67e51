"""Long-horizon rollout regression (VERDICT r1 item 7 / BASELINE north star).

Loads the committed synthetic-advection checkpoint (trained on the real
TPU by tools/train_synthetic_adv.py) and rolls it out 100 steps against
the analytic ground truth on CPU; pins the accuracy so the capability
cannot silently regress.  Skipped when no checkpoint is bundled.
"""
import json
import os
import sys

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
CHK = os.path.join(FIXDIR, "synthadv_model.chk")
PINS = os.path.join(FIXDIR, "synthadv_pins.json")


@pytest.mark.skipif(not os.path.exists(CHK),
                    reason="no bundled synthadv checkpoint")
def test_100_step_rollout_accuracy():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from train_synthetic_adv import SyntheticAdv
    import graphs4cfd_tpu as gfd
    from graphs4cfd_tpu.utils import Compose
    from graphs4cfd_tpu.loader import collate
    from graphs4cfd_tpu.metrics import r2, rollout_rmse

    pins = json.load(open(PINS))
    tr = Compose([gfd.transforms.ConnectKNN(6, period=(1.0, 1.0)),
                  gfd.transforms.ScaleEdgeAttr(0.04)]
                 + ([gfd.transforms.GridClustering([0.1])]
                    if pins.get("two_scale") else []))
    val_ds = SyntheticAdv(4, pins["n_nodes"], 4, tr, seed=99,
                          dt=pins["dt"])
    model_cls = getattr(gfd.nn, pins["model_cls"])
    model = model_cls(checkpoint=CHK, scan_layers=True)

    g = val_ds.graph_at(0, 0, 100)
    batch = collate([g], node_bucket=64, edge_bucket=128).to_device()
    pred = np.asarray(model.solve(batch, n_out=100))
    target = np.asarray(batch.target)
    mask = np.asarray(batch.node_mask)

    r2_50 = r2(pred[mask, 49], target[mask, 49])
    r2_100 = r2(pred[mask, 99], target[mask, 99])
    rmse = rollout_rmse(pred, target, node_mask=mask)
    # pinned at training time with ~20% slack (CPU vs TPU numerics drift
    # over 100 autoregressive steps)
    assert r2_50 >= pins["r2_step50_min"], (r2_50, pins)
    assert rmse <= pins["rollout_rmse_max"], (rmse, pins)
    if "r2_step100_min" in pins:
        assert r2_100 >= pins["r2_step100_min"], (r2_100, pins)
    else:
        assert np.isfinite(r2_100)


TG_CHK = os.path.join(FIXDIR, "taylor_green_model.chk")
TG_PINS = os.path.join(FIXDIR, "taylor_green_pins.json")


@pytest.mark.skipif(not os.path.exists(TG_CHK),
                    reason="no bundled taylor-green checkpoint")
def test_ns_family_100_step_rollout_accuracy():
    """NS-family (uvp pipeline) long-horizon regression: the committed
    Taylor–Green checkpoint must hold its pinned 100-step accuracy."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from train_taylor_green import TaylorGreenNs, SCALING
    import graphs4cfd_tpu as gfd
    from graphs4cfd_tpu.utils import Compose
    from graphs4cfd_tpu.loader import collate
    from graphs4cfd_tpu.metrics import r2, rollout_rmse

    pins = json.load(open(TG_PINS))
    topo = Compose([gfd.transforms.ConnectKNN(6, period=(1.0, 1.0)),
                    gfd.transforms.ScaleEdgeAttr(0.04)])
    scale_ns = gfd.transforms.ScaleNs(SCALING, format="uvp")
    val_ds = TaylorGreenNs(4, pins["n_nodes"], 4, topo, scale_ns,
                           seed=99, dt=pins["dt"])
    model_cls = getattr(gfd.nn, pins["model_cls"])
    model = model_cls(checkpoint=TG_CHK, scan_layers=True)

    g = val_ds.graph_at(0, 0, 100)
    batch = collate([g], node_bucket=64, edge_bucket=128).to_device()
    pred = np.asarray(model.solve(batch, n_out=100))
    target = np.asarray(batch.target)
    mask = np.asarray(batch.node_mask)

    r2_50 = r2(pred[mask, 147:150], target[mask, 147:150])
    r2_100 = r2(pred[mask, 297:300], target[mask, 297:300])
    rmse = rollout_rmse(pred, target, node_mask=mask)
    assert r2_50 >= pins["r2_step50_min"], (r2_50, pins)
    assert r2_100 >= pins["r2_step100_min"], (r2_100, pins)
    assert rmse <= pins["rollout_rmse_max"], (rmse, pins)
