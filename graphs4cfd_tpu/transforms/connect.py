"""k-NN connectivity transform.

Mirrors ``ConnectKNN`` (``/root/reference/graphs4cfd/transforms/connect.py:74-92``)
but emits the framework's canonical receiver-sorted exact-k edge layout and
records ``fixed_k`` so models can take the reshape aggregation path.
"""
from __future__ import annotations

from typing import Optional, Sequence

from ..graph import Graph
from ..ops.knn import connect_knn


class ConnectKNN:
    """Connect nodes with the k-nearest-neighbours algorithm.

    Args:
        k: number of neighbours (exact indegree of every node).
        period: per-axis domain period (None / value / "auto"), as in the
            reference (``connect.py:39-55``).
    """

    def __init__(self, k: int, period: Optional[Sequence] = None):
        self.k = k
        self.period = period

    def __call__(self, graph: Graph) -> Graph:
        import numpy as np
        s, r, attr = connect_knn(graph.pos, self.k, period=self.period)
        graph.senders = s
        graph.receivers = r
        graph.edge_attr = attr
        graph.fixed_k = self.k
        # sender-sorted permutation: lets gather backwards run as a sorted
        # segment-sum instead of a scatter-add (ops.segment.gather_sorted_bwd)
        perm = np.argsort(s, kind="stable").astype(np.int32)
        graph.sender_perm = perm
        graph.sender_sorted = s[perm]
        return graph
