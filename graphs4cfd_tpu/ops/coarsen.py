"""Host-side Guillard node-nested coarsening and edge pooling structure.

* ``guillard_coarsening`` replaces the reference's serial Python loop
  (``/root/reference/graphs4cfd/transforms/mugs.py:9-29``); a C++ kernel in
  ``graphs4cfd_tpu/native`` runs the inherently sequential greedy sweep at
  native speed, with a NumPy fallback.
* ``pool_edge_structure`` precomputes the *static* part of the reference's
  ``pool_edge`` (``nn/blocks.py:51-68``): which coarse edge each fine edge
  lands in after endpoint remapping, self-loop removal and coalescing.  The
  runtime then only needs one segment-mean over fine edge features — the
  dynamic part — keeping shapes static under jit.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def guillard_coarsening(senders: np.ndarray, num_nodes: int, k: int) -> np.ndarray:
    """Greedy node-nested coarsening (Guillard, INRIA RR-2076).

    ``senders`` is the canonical receiver-sorted sender array (``[V*k]``,
    rows ``[v*k,(v+1)*k)`` = senders of ``v``).  Sweeps nodes in index order;
    every node still marked coarse removes its senders from the coarse set —
    byte-for-byte the reference algorithm (``transforms/mugs.py:26-29``).
    Returns a bool ``[V]`` mask of kept nodes.
    """
    try:
        from ..native import guillard_coarsening as native_gc
        if native_gc is not None:
            return native_gc(senders, num_nodes, k)
    except ImportError:
        pass
    senders = np.asarray(senders).reshape(num_nodes, k)
    coarse = np.ones(num_nodes, dtype=bool)
    for v in range(num_nodes):
        if coarse[v]:
            coarse[senders[v]] = False
    return coarse


def pool_edge_structure(parent: np.ndarray,
                        senders: np.ndarray,
                        receivers: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static topology of ``pool_edge`` (``nn/blocks.py:51-68``).

    Maps each fine edge ``(s, r)`` to the coarse pair ``(parent[s], parent[r])``,
    drops self-loops, and coalesces duplicates.  Coarse edges are ordered by
    ``(receiver, sender)`` ascending — i.e. receiver-sorted, matching the
    framework's canonical layout (PyG's ``coalesce`` sorts likewise).

    Returns:
        coarse_senders   int32 ``[Ec]``
        coarse_receivers int32 ``[Ec]``
        fine_to_coarse   int32 ``[Ef]`` — coarse edge id per fine edge,
                         ``-1`` for dropped self-loops.
        coarse_count     int32 ``[Ec]`` — fine edges per coarse edge (the
                         divisor of the runtime segment-mean).
    """
    cs = parent[np.asarray(senders)]
    cr = parent[np.asarray(receivers)]
    keep = cs != cr
    key = cr.astype(np.int64) * (parent.max() + 1 if parent.size else 1) + cs
    key = np.where(keep, key, -1)
    uniq, inverse = np.unique(key, return_inverse=True)
    has_drop = uniq.size > 0 and uniq[0] == -1
    if has_drop:
        fine_to_coarse = (inverse - 1).astype(np.int32)
        uniq = uniq[1:]
    else:
        fine_to_coarse = inverse.astype(np.int32)
    denom = int(parent.max()) + 1 if parent.size else 1
    coarse_receivers = (uniq // denom).astype(np.int32)
    coarse_senders = (uniq % denom).astype(np.int32)
    num_coarse_edges = uniq.shape[0]
    coarse_count = np.bincount(fine_to_coarse[fine_to_coarse >= 0],
                               minlength=num_coarse_edges).astype(np.int32)
    return coarse_senders, coarse_receivers, fine_to_coarse, coarse_count
