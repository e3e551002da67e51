"""Training losses.

Mirrors ``GraphLoss`` (``/root/reference/graphs4cfd/nn/losses.py:5-16``):
MSE plus an optional L1 penalty on Dirichlet-boundary nodes (ω == 1),
extended with padding-mask support (padded rows carry garbage and must not
enter the reduction).
"""
from __future__ import annotations

import jax.numpy as jnp


class GraphLoss:
    """loss = MSE(pred, target) + λ_d · L1(pred[ω==1], target[ω==1])."""

    def __init__(self, lambda_d: float = 0.0):
        self.lambda_d = lambda_d

    def __call__(self, graph, pred: jnp.ndarray,
                 target: jnp.ndarray) -> jnp.ndarray:
        mask = graph.get("node_mask")
        if mask is None:
            mask = jnp.ones(pred.shape[0], dtype=bool)
        m = mask[:, None].astype(pred.dtype)
        denom = jnp.maximum(m.sum() * pred.shape[1], 1.0)
        sq = jnp.where(mask[:, None], (pred - target) ** 2, 0.0)
        loss = sq.sum() / denom
        if self.lambda_d > 0:
            dirichlet = (graph.omega[:, 0] == 1) & mask
            dcount = jnp.maximum(dirichlet.sum() * pred.shape[1], 1)
            l1 = jnp.where(dirichlet[:, None], jnp.abs(pred - target), 0.0)
            loss = loss + self.lambda_d * l1.sum() / dcount
        return loss
