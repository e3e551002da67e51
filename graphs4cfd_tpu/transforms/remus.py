"""REMuS-GNN graph build: multi-level edges, unit vectors, angles, pinverses.

Mirrors ``ExtendGraph`` / ``BuildRemusGraph``
(``/root/reference/graphs4cfd/transforms/remus.py:47-176``), in local level
numbering and the fixed-k gather layout from ``graphs4cfd_tpu.ops.angles``:

    unit_vec{_l}   [E_l, 2]     per-edge unit vectors
    unit_pinv{_l}  [V_l, 2, k]  pinverse of each node's incoming unit vectors
    angle_src{_l}  [E_l, k]     intra-level angle sender edges
    angle_attr{_l} [E_l, k, 4]  [|e_in|, |e_out|, cosθ, sinθ]
    xangle_src_{l} [E_l, k]     inter-level angles into level l (sender edges
                                in level-(l-1) local edge ids)
    xangle_attr_{l}[E_l, k, 4]
    node_origin_{l}, down_idx_{l}, pos_{l} as in the gMuS transform

The reference's per-sample cost here is its biggest bottleneck (Python
loops over all edges); this implementation is fully vectorised + native
k-NN/Guillard kernels.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..graph import Graph
from ..ops.knn import connect_knn
from ..ops.coarsen import guillard_coarsening
from ..ops.angles import extend_graph, inter_level_angles
from ..ops.linalg import pinv_k2_np


class ExtendGraph:
    """Single-level REMuS extension (``remus.py:47-61``)."""

    def __call__(self, graph: Graph) -> Graph:
        k = graph.fixed_k
        unit, angle_src, angle_attr = extend_graph(graph.senders,
                                                   graph.edge_attr, k)
        graph.unit_vec = unit
        graph.angle_src = angle_src
        graph.angle_attr = angle_attr
        num_nodes = np.asarray(graph.pos).shape[0]
        graph.unit_pinv = pinv_k2_np(unit.reshape(num_nodes, k, 2))
        return graph


class BuildRemusGraph:
    """Full multi-level REMuS build (``remus.py:63-147``)."""

    def __init__(self, num_levels: int, k: int,
                 period: Optional[Sequence] = None,
                 scale_edge_length: Optional[Sequence] = None):
        self.num_levels = num_levels
        self.k = k
        self.period = period
        self.scale_edge_length = scale_edge_length

    def _scale(self, attr: np.ndarray, i: int) -> np.ndarray:
        if (self.scale_edge_length is not None
                and self.scale_edge_length[i] is not None):
            return attr / (2.0 * self.scale_edge_length[i])
        return attr

    def __call__(self, graph: Graph) -> Graph:
        k = self.k
        pos = np.asarray(graph.pos, dtype=np.float32)
        # ---- level hierarchy: knn + guillard, local numbering ----
        s, r, attr = connect_knn(pos, k, period=self.period)
        attr = self._scale(attr, 0)
        graph.senders, graph.receivers, graph.edge_attr = s, r, attr
        graph.fixed_k = k
        # REMuS's angle-source gather (a node-sender row gather from the
        # [V, k·H] edge table) prefers a wider plan than the MuS/gMuS
        # optimum: (1024, 256) measured 124.5 vs 125.3 ms at (512, 128)
        # on TPU v5e (BASELINE.md sweep); consumed by loader.collate
        graph.data["wg_pref"] = (1024, 256)
        levels = [{"pos": pos, "senders": s, "receivers": r, "attr": attr,
                   "origin": np.arange(pos.shape[0], dtype=np.int32)}]
        for i in range(1, self.num_levels):
            prev = levels[-1]
            mask = guillard_coarsening(prev["senders"],
                                       prev["pos"].shape[0], k)
            down_idx = np.nonzero(mask)[0].astype(np.int32)
            pos_l = prev["pos"][down_idx]
            s_l, r_l, attr_l = connect_knn(pos_l, k, period=self.period)
            attr_l = self._scale(attr_l, i)
            levels.append({"pos": pos_l, "senders": s_l, "receivers": r_l,
                           "attr": attr_l, "origin": prev["origin"][down_idx],
                           "down_idx": down_idx})
        # ---- per-level extension: unit vectors, pinverses, angles ----
        for i, lv in enumerate(levels):
            suf = "" if i == 0 else f"_{i + 1}"
            unit, angle_src, angle_attr = extend_graph(lv["senders"],
                                                       lv["attr"], k)
            lv["unit"] = unit
            graph.data[f"unit_vec{suf}"] = unit
            graph.data[f"angle_src{suf}"] = angle_src
            graph.data[f"angle_attr{suf}"] = angle_attr
            graph.data[f"unit_pinv{suf}"] = pinv_k2_np(
                unit.reshape(lv["pos"].shape[0], k, 2))
            if i > 0:
                l = i + 1
                graph.data[f"down_idx_{l}"] = lv["down_idx"]
                graph.data[f"node_origin_{l}"] = lv["origin"]
                graph.data[f"senders_{l}"] = lv["senders"]
                graph.data[f"receivers_{l}"] = lv["receivers"]
                graph.data[f"edge_attr_{l}"] = lv["attr"]
                graph.data[f"pos_{l}"] = lv["pos"]
                graph.data[f"fixed_k_{l}"] = k
                # inter-level angles (fine level i-1 → coarse level i)
                fine = levels[i - 1]
                xsrc, xattr = inter_level_angles(
                    None, fine["attr"], lv["senders"], lv["attr"],
                    lv["down_idx"], k)
                graph.data[f"xangle_src_{l}"] = xsrc
                graph.data[f"xangle_attr_{l}"] = xattr
        graph.num_levels = self.num_levels
        return graph
