"""Graph-construction and augmentation transforms (host-side pipeline).

Re-exports mirror the reference ``transforms`` package
(``/root/reference/graphs4cfd/transforms/__init__.py:1-11``).
"""
from .connect import ConnectKNN
from .mus import GridClustering, BatchGridClustering
from .mugs import GuillardCoarseningAndConnectKNN
from .remus import ExtendGraph, BuildRemusGraph
from .interpolate import (BuildKnnInterpWeights, InterpolateNodes,
                          InterpolateNodesToXml, interpolate_nodes)
from .scale import ScaleEdgeAttr, ScaleNs, scale_edges
from .noise import AddUniformNoise
from .geometric import (RandomGraphRotation, GraphRotation, RandomGraphFlip,
                        rotate_graph, flip_graph_dim)
from .subset import NodeSubset, RandomNodeSubset
from .order import SpatialSort

__all__ = [
    "ConnectKNN", "GridClustering", "BatchGridClustering", "GuillardCoarseningAndConnectKNN",
    "ExtendGraph", "BuildRemusGraph", "BuildKnnInterpWeights",
    "InterpolateNodes", "InterpolateNodesToXml", "interpolate_nodes",
    "ScaleEdgeAttr", "ScaleNs", "scale_edges", "AddUniformNoise",
    "RandomGraphRotation", "GraphRotation", "RandomGraphFlip",
    "rotate_graph", "flip_graph_dim", "NodeSubset", "RandomNodeSubset",
    "SpatialSort",
]
