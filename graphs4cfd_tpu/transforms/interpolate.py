"""Interpolation transforms: level-to-level k-NN weights and re-meshing.

Mirrors ``BuildKnnInterpWeights`` / ``InterpolateNodes`` /
``InterpolateNodesToXml``
(``/root/reference/graphs4cfd/transforms/interpolate.py``).  Up-sampling
weights are stored in the fixed-k gather layout:

    up_idx_{l}  [V_{l-1}, k]  level-l neighbours of each level-(l-1) node
    up_w_{l}    [V_{l-1}, k]  1/d² weights

used by gMuS/REMuS unpooling (``nn/blocks.py:34-48,451``).
"""
from __future__ import annotations

import os
import random
from typing import Optional, Union
from xml.etree import ElementTree

import numpy as np

from ..graph import Graph
from ..ops.interp import knn_interp_weights


class BuildKnnInterpWeights:
    """Compute up-sampling indices/weights for each consecutive level pair
    present on the graph (``interpolate.py:133-155``)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, graph: Graph) -> Graph:
        level = 2
        pos_prev = np.asarray(graph.pos, dtype=np.float32)
        while graph.has(f"pos_{level}"):
            pos_l = np.asarray(graph.data[f"pos_{level}"], dtype=np.float32)
            idx, w = knn_interp_weights(pos_l, pos_prev, self.k)
            graph.data[f"up_idx_{level}"] = idx
            graph.data[f"up_w_{level}"] = w
            pos_prev = pos_l
            level += 1
        graph.interp_k = self.k
        return graph


def interpolate_nodes(graph: Graph, pos: np.ndarray,
                      method: Optional[str] = None) -> Graph:
    """Re-mesh a point cloud via scipy griddata (``interpolate.py:14-50``).

    Host-side offline preprocessing, not part of the training path.
    """
    from scipy.interpolate import griddata
    if graph.has("senders"):
        raise ValueError("Graphs cannot be interpolated, only sets of nodes.")
    old_pos = np.asarray(graph.pos)
    dim = pos.shape[1]
    if method is None:
        method = "cubic" if dim == 2 else "linear"
    interp = lambda vals, m: griddata(old_pos, np.asarray(vals), pos,
                                      method=m).astype(np.float32)
    if graph.has("loc"):
        graph.loc = interp(graph.loc, method)
    if graph.has("glob"):
        graph.glob = interp(graph.glob, method)
    graph.field = interp(graph.field, method)
    if graph.has("target"):
        graph.target = interp(graph.target, method)
    omega = interp(graph.omega, "linear")
    graph.omega = (omega >= 0.9).astype(np.float32)
    graph.bound = np.round(
        griddata(old_pos, np.asarray(graph.bound, dtype=np.float64), pos,
                 method="linear")).astype(np.uint8)
    graph.pos = pos.astype(np.float32)
    return graph


class InterpolateNodes:
    def __init__(self, pos: np.ndarray):
        self.pos = np.asarray(pos, dtype=np.float32)

    def __call__(self, graph: Graph) -> Graph:
        return interpolate_nodes(graph, self.pos)


class InterpolateNodesToXml:
    """Interpolate onto the vertices of (a random choice of) NekMesh xml
    meshes (``interpolate.py:79-107``)."""

    def __init__(self, xml_file: str, num_meshes: Union[int, str] = "all"):
        if isinstance(num_meshes, str):
            assert num_meshes == "all", "num_meshes must be an int or 'all'"
        if xml_file.endswith(".xml"):
            self.xml_files = [xml_file]
        elif xml_file.endswith("_xml"):
            self.xml_files = [os.path.join(xml_file, f)
                              for f in sorted(os.listdir(xml_file))]
            if num_meshes == "all":
                num_meshes = len(self.xml_files)
            self.xml_files = random.choices(self.xml_files, k=num_meshes)

    def __call__(self, graph: Graph) -> Graph:
        dom = ElementTree.parse(random.choice(self.xml_files))
        verts = dom.findall("GEOMETRY/VERTEX/V")
        dim = np.asarray(graph.pos).shape[1]
        pos = np.array([list(map(float, v.text.split()[:dim]))
                        for v in verts], dtype=np.float32)
        return interpolate_nodes(graph, pos)
