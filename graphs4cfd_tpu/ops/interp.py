"""k-NN inverse-square-distance interpolation between graph levels.

Replaces the reference's ``get_knn_interpolate_weights`` + scatter-based
``knn_interpolate`` pair (``/root/reference/graphs4cfd/transforms/interpolate.py:110-129``,
``nn/blocks.py:34-48``).  Because the reference always interpolates with a
fixed k per target node, the whole op is a gather + weighted mean along a
static k axis — no scatter on device.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .knn import cross_knn


def knn_interp_weights(pos_src: np.ndarray, pos_query: np.ndarray, k: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: neighbour indices and weights for src→query interpolation.

    Returns ``(idx [Q,k] int32, weights [Q,k] float32)`` with
    ``w = 1 / max(d², 1e-16)`` (``transforms/interpolate.py:126-128``).
    """
    idx = cross_knn(pos_src, pos_query, k)
    diff = np.asarray(pos_src, dtype=np.float32)[idx] \
        - np.asarray(pos_query, dtype=np.float32)[:, None, :]
    d2 = (diff * diff).sum(axis=-1)
    weights = 1.0 / np.maximum(d2, 1e-16)
    return idx.astype(np.int32), weights.astype(np.float32)


def knn_interpolate(x: jnp.ndarray, idx: jnp.ndarray, weights: jnp.ndarray
                    ) -> jnp.ndarray:
    """Device-side: ``y[q] = Σ_k w[q,k]·x[idx[q,k]] / Σ_k w[q,k]``.

    Numerically identical to the reference's scatter formulation
    (``nn/blocks.py:46-47``) under the fixed-k layout.
    """
    gathered = jnp.take(x, idx, axis=0)                 # [Q, k, F]
    w = weights[..., None]
    return (gathered * w).sum(axis=1) / w.sum(axis=1)
