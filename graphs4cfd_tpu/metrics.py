"""Evaluation metrics.

Mirrors ``r2`` (``/root/reference/graphs4cfd/metrics.py:4-24``), including
its exact-mean element masking quirk (elements equal to the target mean are
excluded — kept for metric parity, see SURVEY §7.4).
"""
from __future__ import annotations

import numpy as np


def r2(pred, target) -> float:
    """Coefficient of determination between ``pred`` and ``target``
    (1-D time-point or 2-D rollout)."""
    pred = np.asarray(pred)
    target = np.asarray(target)
    if pred.ndim not in (1, 2):
        raise RuntimeError()
    mean = target.mean()
    mask = target != mean
    res = float(((target[mask] - pred[mask]) ** 2).sum())
    tot = float(((target[mask] - mean) ** 2).sum())
    return 1.0 - res / tot


def rollout_rmse(pred, target, node_mask=None) -> float:
    """Root-mean-square error of a rollout ``[V, num_fields·T]``
    (the repo's headline accuracy metric; not in the reference API)."""
    pred = np.asarray(pred)
    target = np.asarray(target)
    if node_mask is not None:
        pred = pred[np.asarray(node_mask)]
        target = target[np.asarray(node_mask)]
    return float(np.sqrt(((pred - target) ** 2).mean()))
