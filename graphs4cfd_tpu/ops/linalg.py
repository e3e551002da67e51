"""Batched small-matrix linear algebra for REMuS-GNN projections.

Replaces ``torch.pinverse`` on ``[V, k, 2]`` stacks
(``/root/reference/graphs4cfd/transforms/remus.py:59,126-137``,
``nn/blocks.py:71-114``).  Since the matrices always have exactly 2 columns
(edge unit vectors in 2-D), the pseudo-inverse has the closed form
``pinv(A) = (AᵀA)⁻¹Aᵀ`` with a 2×2 inverse — no SVD, fully batched and
TPU-friendly.  Provided for both NumPy (host graph build) and JAX (device /
differentiable use).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pinv_k2_np(a: np.ndarray) -> np.ndarray:
    """NumPy: pseudo-inverse of a ``[..., k, 2]`` stack → ``[..., 2, k]``."""
    a = np.asarray(a, dtype=np.float64)
    at = np.swapaxes(a, -1, -2)                    # [..., 2, k]
    g = at @ a                                     # [..., 2, 2]
    det = g[..., 0, 0] * g[..., 1, 1] - g[..., 0, 1] * g[..., 1, 0]
    inv = np.empty_like(g)
    inv[..., 0, 0] = g[..., 1, 1]
    inv[..., 1, 1] = g[..., 0, 0]
    inv[..., 0, 1] = -g[..., 0, 1]
    inv[..., 1, 0] = -g[..., 1, 0]
    inv = inv / np.maximum(det, 1e-30)[..., None, None]
    return (inv @ at).astype(np.float32)


def pinv_k2(a: jnp.ndarray) -> jnp.ndarray:
    """JAX: pseudo-inverse of a ``[..., k, 2]`` stack → ``[..., 2, k]``.

    f32 normal equations followed by one Newton–Schulz refinement step
    (X ← 2X − XAX), which squares the rounding error of the Gram inverse.
    """
    a = a.astype(jnp.float32)
    at = jnp.swapaxes(a, -1, -2)
    g = at @ a
    det = g[..., 0, 0] * g[..., 1, 1] - g[..., 0, 1] * g[..., 1, 0]
    adj = jnp.stack([
        jnp.stack([g[..., 1, 1], -g[..., 0, 1]], axis=-1),
        jnp.stack([-g[..., 1, 0], g[..., 0, 0]], axis=-1)], axis=-2)
    inv = adj / jnp.maximum(det, 1e-30)[..., None, None]
    x = inv @ at
    return 2.0 * x - x @ a @ x
