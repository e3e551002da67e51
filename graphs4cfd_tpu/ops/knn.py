"""Host-side k-nearest-neighbour graph construction.

TPU-native replacement for ``torch_cluster.knn_graph`` / ``knn`` (compiled
C++/CUDA; used by the reference at ``/root/reference/graphs4cfd/transforms/connect.py:3,58``
and ``transforms/interpolate.py:8,125``).  Graph construction runs on host
as part of the data pipeline (topology is built once per sample and cached),
so this is NumPy, tiled over query chunks to bound memory; a C++ kernel
(``graphs4cfd_tpu/native``) accelerates the distance/top-k loop when built.

Output convention (framework-canonical): edges sorted by receiver, exactly
``k`` per receiver, neighbours ordered by ascending distance (ties by index).
``senders[v*k + j]`` is the j-th nearest neighbour of node ``v``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

_CHUNK = 2048


def _periodic_lift(pos: np.ndarray, period) -> Tuple[np.ndarray, list]:
    """Lift periodic axes to (cos, sin) pairs, as the reference does
    (``transforms/connect.py:39-55``): each periodic axis becomes a unit
    circle so wrap-around neighbours are close in the lifted metric.

    Returns the lifted coordinates and the resolved per-axis periods
    (None for non-periodic axes).
    """
    dim = pos.shape[1]
    if period is None:
        period = (None,) * dim
    assert len(period) == dim, f"period must have {dim} entries"
    cols, resolved = [], []
    for d in range(dim):
        p = period[d]
        if p is None:
            cols.append(pos[:, d:d + 1])
            resolved.append(None)
        else:
            if p == "auto":
                p = float(pos[:, d].max() - pos[:, d].min())
            w = 2.0 * np.pi / p
            cols.append(np.stack([np.cos(w * pos[:, d]),
                                  np.sin(w * pos[:, d])], axis=1))
            resolved.append(float(p))
    return np.concatenate(cols, axis=1).astype(np.float64), resolved


def knn_neighbors(x: np.ndarray, queries: np.ndarray, k: int,
                  exclude_self: bool = False) -> np.ndarray:
    """For each query row return indices of its k nearest rows of ``x``.

    Chunked brute force (exact).  ``exclude_self`` assumes ``queries is x``
    and removes the zero-distance self match.  Returns int32 ``[Q, k]``
    ordered by ascending distance (ties by index).
    """
    n = x.shape[0]
    kk = k + 1 if exclude_self else k
    if kk > n:
        raise ValueError(f"k={k} too large for {n} points")
    try:
        from ..native import knn_neighbors as native_knn
        if native_knn is not None:
            return native_knn(x, queries, k, exclude_self)
    except ImportError:
        pass
    x = np.ascontiguousarray(x, dtype=np.float64)
    q = np.ascontiguousarray(queries, dtype=np.float64)
    out = np.empty((q.shape[0], k), dtype=np.int32)
    x_sq = (x * x).sum(axis=1)
    for s in range(0, q.shape[0], _CHUNK):
        qc = q[s:s + _CHUNK]
        # squared distances [chunk, n]
        d2 = x_sq[None, :] - 2.0 * qc @ x.T
        d2 += (qc * qc).sum(axis=1)[:, None]
        if exclude_self:
            rows = np.arange(s, s + qc.shape[0])
            d2[np.arange(qc.shape[0]), rows] = np.inf
        # partial top-k then stable sort by (distance, index)
        part = np.argpartition(d2, k - 1, axis=1)[:, :k]
        pd = np.take_along_axis(d2, part, axis=1)
        order = np.lexsort((part, pd), axis=1)
        out[s:s + qc.shape[0]] = np.take_along_axis(part, order, axis=1)
    return out


def connect_knn(pos: np.ndarray, k: int,
                period: Optional[Sequence] = None
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the canonical k-NN graph of a point cloud.

    Mirrors ``connect_knn`` (``transforms/connect.py:9-71``): neighbours are
    found on the periodically lifted coordinates, ``edge_attr`` is the
    receiver-minus-sender offset with periodic wrap-around applied.

    Returns ``(senders, receivers, edge_attr)`` with ``senders``/``receivers``
    int32 ``[V*k]`` receiver-sorted (receiver v owns rows ``[v*k,(v+1)*k)``)
    and ``edge_attr`` float32 ``[V*k, dim]``.
    """
    pos = np.asarray(pos, dtype=np.float32)
    num_nodes, dim = pos.shape
    if dim not in (2, 3):
        raise ValueError(f"Invalid dimension: {dim}, must be 2 or 3.")
    lifted, periods = _periodic_lift(pos, period)
    nbr = knn_neighbors(lifted, lifted, k, exclude_self=True)  # [V, k]
    senders = nbr.reshape(-1).astype(np.int32)
    receivers = np.repeat(np.arange(num_nodes, dtype=np.int32), k)
    edge_attr = pos[receivers] - pos[senders]
    for d, p in enumerate(periods):
        if p is not None:
            col = edge_attr[:, d]
            col = np.where(col < -p / 2.0, col + p, col)
            col = np.where(col > p / 2.0, col - p, col)
            edge_attr[:, d] = col
    return senders, receivers, edge_attr.astype(np.float32)


def cross_knn(pos_src: np.ndarray, pos_query: np.ndarray, k: int) -> np.ndarray:
    """k nearest rows of ``pos_src`` for every row of ``pos_query``.

    Replacement for ``torch_cluster.knn(x, y, k)`` as used by
    ``get_knn_interpolate_weights`` (``transforms/interpolate.py:125``).
    Returns int32 ``[Q, k]`` neighbour indices into ``pos_src``.
    """
    return knn_neighbors(np.asarray(pos_src, dtype=np.float64),
                         np.asarray(pos_query, dtype=np.float64), k)
