"""Host-side angle-index construction for REMuS-GNN directional MP.

Vectorised replacement for the reference's O(E·k) Python loops
(``/root/reference/graphs4cfd/transforms/remus.py:36-43`` and
``remus.py:159-176``).  Exploits the canonical receiver-sorted exact-k edge
layout: the incoming edges of node ``v`` occupy rows ``[v*k,(v+1)*k)``, so
every "find edges entering the sender" lookup is pure index arithmetic.

Angle sets are emitted in the fixed-k gather form ``angle_src [A, k]``:
row ``a`` lists, for receiver edge ``a``, the k sender edges whose angles
feed it.  Aggregation on device is then a gather + mean over axis 1 — no
scatter (cf. ``EdgeMP``'s ``scatter(a, col, reduce='mean')``,
``nn/blocks.py:330``, which also sees exactly k angles per edge).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _unit_and_size(edge_attr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    size = np.linalg.norm(edge_attr, axis=1, keepdims=True)
    return edge_attr / size, size


def extend_graph(senders: np.ndarray, edge_attr: np.ndarray, k: int
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit vectors + intra-level angles (``transforms/remus.py:9-44``).

    Returns:
        unit_vec   float32 ``[E, 2]``
        angle_src  int32  ``[E, k]`` — for edge ``e=(i→j)``, the incoming
                   edges of sender ``i`` (rows ``i*k + 0..k-1``).
        angle_attr float32 ``[E, k, 4]`` — ``[|e_in|, |e_out|, cosθ, sinθ]``.
    """
    senders = np.asarray(senders)
    num_edges = senders.shape[0]
    unit_vec, size = _unit_and_size(np.asarray(edge_attr, dtype=np.float32))
    angle_src = (senders.astype(np.int64)[:, None] * k
                 + np.arange(k)[None, :]).astype(np.int32)      # [E, k]
    u_in = unit_vec[angle_src]                                   # [E, k, 2]
    u_out = unit_vec[:, None, :]                                 # [E, 1, 2]
    cos = (u_in * u_out).sum(axis=-1)
    sin = u_in[..., 0] * u_out[..., 1] - u_in[..., 1] * u_out[..., 0]
    angle_attr = np.concatenate([
        size[angle_src],                                         # [E, k, 1]
        np.broadcast_to(size[:, None, :], (num_edges, k, 1)),
        cos[..., None], sin[..., None]], axis=-1).astype(np.float32)
    return unit_vec.astype(np.float32), angle_src, angle_attr


def inter_level_angles(fine_senders_of_coarse: np.ndarray,
                       fine_edge_attr: np.ndarray,
                       coarse_local_senders: np.ndarray,
                       coarse_edge_attr: np.ndarray,
                       coarse_to_fine_node: np.ndarray,
                       k: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Inter-level (downsampling) angles — ``angleIndexDownMP``
    (``transforms/remus.py:150-176``).

    For each coarse edge ``a=(j→m)`` the k angles come from the k fine edges
    entering ``j`` (as a fine node).  Since Σ outgoing edges over coarse
    nodes = |E_coarse|, the angle count is exactly ``k·|E_coarse|`` and the
    set is emitted as ``angle_src [Ec, k]`` (fine edge ids) grouped by
    receiving coarse edge.

    Args:
        fine_senders_of_coarse: unused placeholder kept for signature clarity.
        fine_edge_attr:       ``[Ef, 2]`` fine-level edge vectors (scaled).
        coarse_local_senders: ``[Ec]`` sender of each coarse edge in *local
                              coarse* numbering.
        coarse_edge_attr:     ``[Ec, 2]`` coarse edge vectors (scaled).
        coarse_to_fine_node:  ``[Vc]`` fine (previous-level) node index of
                              each coarse node.
        k:                    exact indegree at the fine level.
    Returns:
        angle_src  int32  ``[Ec, k]``
        angle_attr float32 ``[Ec, k, 4]``
    """
    coarse_local_senders = np.asarray(coarse_local_senders)
    fine_sender_node = np.asarray(coarse_to_fine_node)[coarse_local_senders]
    angle_src = (fine_sender_node.astype(np.int64)[:, None] * k
                 + np.arange(k)[None, :]).astype(np.int32)       # [Ec, k]
    u1, s1 = _unit_and_size(np.asarray(fine_edge_attr, dtype=np.float32))
    u2, s2 = _unit_and_size(np.asarray(coarse_edge_attr, dtype=np.float32))
    u_in = u1[angle_src]                                          # [Ec, k, 2]
    u_out = u2[:, None, :]
    cos = (u_in * u_out).sum(axis=-1)
    sin = u_in[..., 0] * u_out[..., 1] - u_in[..., 1] * u_out[..., 0]
    ec = coarse_local_senders.shape[0]
    angle_attr = np.concatenate([
        s1[angle_src],
        np.broadcast_to(s2[:, None, :], (ec, k, 1)),
        cos[..., None], sin[..., None]], axis=-1).astype(np.float32)
    return angle_src, angle_attr
