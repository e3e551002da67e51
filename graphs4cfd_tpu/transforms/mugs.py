"""gMuS-GNN Guillard coarsening transform.

Mirrors ``GuillardCoarseningAndConnectKNN``
(``/root/reference/graphs4cfd/transforms/mugs.py:32-89``).  Coarse levels
are kept in **local numbering** (the reference renumbers coarse edges into
V¹ indices and re-derives local indices inside every forward via
``restriction``, ``nn/blocks.py:9-32``; doing it once here removes that
per-step work and keeps shapes static):

    down_idx_{l}     [V_l]   index of each level-l node in level-(l-1) local
    node_origin_{l}  [V_l]   index of each level-l node in level-1 space
    senders_{l}, receivers_{l}, edge_attr_{l}   local k-NN graph of level l
    fixed_k per level is ``self.k[l-1]`` (static, same for the whole batch)
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from ..graph import Graph
from ..ops.knn import connect_knn
from ..ops.coarsen import guillard_coarsening


class GuillardCoarseningAndConnectKNN:
    """Build the level-1 k-NN graph plus 1–3 Guillard-coarsened levels."""

    def __init__(self, k: List[int],
                 period: Optional[Sequence] = None,
                 scale_edge_attr: Optional[Sequence] = None):
        assert 1 < len(k) < 5, \
            "The number of levels in gMuS-GNN must be between 2 and 4."
        self.k = k
        self.period = period
        self.scale_edge_attr = scale_edge_attr

    def _scale(self, attr: np.ndarray, level_idx: int) -> np.ndarray:
        if (self.scale_edge_attr is not None
                and self.scale_edge_attr[level_idx] is not None):
            return attr / (2.0 * self.scale_edge_attr[level_idx])
        return attr

    def __call__(self, graph: Graph) -> Graph:
        num_levels = len(self.k)
        pos = np.asarray(graph.pos, dtype=np.float32)
        # Level 1
        s, r, attr = connect_knn(pos, self.k[0], period=self.period)
        graph.senders, graph.receivers = s, r
        graph.edge_attr = self._scale(attr, 0)
        graph.fixed_k = self.k[0]
        # Coarser levels
        pos_prev = pos
        origin_prev = np.arange(pos.shape[0], dtype=np.int32)
        s_prev, k_prev = s, self.k[0]
        for i in range(1, num_levels):
            l = i + 1
            num_prev = pos_prev.shape[0]
            mask = guillard_coarsening(s_prev, num_prev, k_prev)
            down_idx = np.nonzero(mask)[0].astype(np.int32)
            pos_l = pos_prev[down_idx]
            s_l, r_l, attr_l = connect_knn(pos_l, self.k[i],
                                           period=self.period)
            graph.data[f"down_idx_{l}"] = down_idx
            graph.data[f"node_origin_{l}"] = origin_prev[down_idx]
            graph.data[f"senders_{l}"] = s_l
            graph.data[f"receivers_{l}"] = r_l
            graph.data[f"edge_attr_{l}"] = self._scale(attr_l, i)
            graph.data[f"pos_{l}"] = pos_l
            graph.data[f"fixed_k_{l}"] = self.k[i]
            pos_prev, origin_prev = pos_l, origin_prev[down_idx]
            s_prev, k_prev = s_l, self.k[i]
        graph.num_levels = num_levels
        return graph
