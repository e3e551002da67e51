"""Training losses.

Mirrors ``GraphLoss`` (``/root/reference/graphs4cfd/nn/losses.py:5-16``):
MSE plus an optional L1 penalty on Dirichlet-boundary nodes (ω == 1),
extended with padding-mask support (padded rows carry garbage and must not
enter the reduction).

For multi-device training the loss exposes a *distributed protocol*:
``local_terms`` returns the per-shard numerators/denominators of each term
as one vector, so a single ``psum`` over the mesh axis reconstructs the
exact global-batch loss (``distributed``).  Averaging per-shard means —
the naive alternative — diverges from the single-device loss whenever
valid-node counts differ across shards, and silently drops the relative
weighting between the MSE and Dirichlet terms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class GraphLoss:
    """loss = MSE(pred, target) + λ_d · L1(pred[ω==1], target[ω==1])."""

    def __init__(self, lambda_d: float = 0.0):
        self.lambda_d = lambda_d

    def local_terms(self, graph, pred: jnp.ndarray,
                    target: jnp.ndarray) -> jnp.ndarray:
        """[sq_sum, valid_count, l1_sum, dirichlet_count] over local rows.

        Sums/counts only — safe to ``psum`` across shards and recombine
        with ``from_terms`` for the exact global loss."""
        mask = graph.get("node_mask")
        if mask is None:
            mask = jnp.ones(pred.shape[0], dtype=bool)
        nf = pred.shape[1]
        sq = jnp.where(mask[:, None], (pred - target) ** 2, 0.0)
        sq_sum = sq.sum()
        cnt = (mask.sum() * nf).astype(pred.dtype)
        if self.lambda_d > 0:
            dirichlet = (graph.omega[:, 0] == 1) & mask
            l1 = jnp.where(dirichlet[:, None], jnp.abs(pred - target), 0.0)
            l1_sum = l1.sum()
            dcnt = (dirichlet.sum() * nf).astype(pred.dtype)
        else:
            l1_sum = jnp.zeros((), pred.dtype)
            dcnt = jnp.zeros((), pred.dtype)
        return jnp.stack([sq_sum, cnt, l1_sum, dcnt])

    def from_terms(self, t: jnp.ndarray) -> jnp.ndarray:
        loss = t[0] / jnp.maximum(t[1], 1.0)
        if self.lambda_d > 0:
            loss = loss + self.lambda_d * t[2] / jnp.maximum(t[3], 1.0)
        return loss

    def distributed(self, graph, pred: jnp.ndarray, target: jnp.ndarray,
                    axis) -> jnp.ndarray:
        """Exact global-batch loss under ``shard_map``: one fused psum of
        all numerators/denominators over ``axis`` (a name or tuple)."""
        return self.from_terms(jax.lax.psum(
            self.local_terms(graph, pred, target), axis))

    def __call__(self, graph, pred: jnp.ndarray,
                 target: jnp.ndarray) -> jnp.ndarray:
        return self.from_terms(self.local_terms(graph, pred, target))
