"""Spatial node-reordering transform (TPU-specific, no reference analogue).

``SpatialSort`` renumbers the point cloud along a Morton/Z-order curve
before connectivity is built, so that sender gathers and graph-parallel
halo exchanges operate on spatially-compact contiguous index blocks (see
``ops/order.py`` for why this matters on TPU).  Model numerics are
unchanged up to node order.

Must run *before* ``ConnectKNN``/coarsening transforms — it permutes only
point-cloud attributes and refuses graphs that already carry topology.
"""
from __future__ import annotations

import numpy as np

from ..graph import Graph
from ..ops.order import spatial_sort_perm
from .subset import _subset


class SpatialSort:
    def __call__(self, graph: Graph) -> Graph:
        assert not graph.has("senders"), \
            "SpatialSort must be applied before connectivity transforms"
        perm = spatial_sort_perm(np.asarray(graph.pos))
        return _subset(graph, perm)
