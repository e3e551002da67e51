"""Feature scaling transforms.

Mirrors ``ScaleEdgeAttr`` and ``ScaleNs``
(``/root/reference/graphs4cfd/transforms/scale.py:15-81``).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..graph import Graph


def scale_edges(e, r: float):
    """Linearly scale edge vectors by 1/(2r) (``scale.py:9-12``)."""
    return e / (2.0 * r)


class ScaleEdgeAttr:
    """Scale ``edge_attr`` by 1/(2r) (``scale.py:15-30``)."""

    def __init__(self, r: float):
        self.r = r

    def __call__(self, graph: Graph) -> Graph:
        graph.edge_attr = graph.edge_attr / (2.0 * self.r)
        return graph


class ScaleNs:
    """Min-max normalise u/v/(p) field+target slices and Re
    (``scale.py:33-81``): ``x ← (x - (a+b)/2) / ((b-a)/2)``."""

    def __init__(self, scaling: Dict[str, Tuple[float, float]], format: str):
        assert format in ("uvp", "uv"), \
            f"Unknown format {format}, must be 'uvp' or 'uv'"
        mk = lambda key: ((0.5 * (scaling[key][0] + scaling[key][1]),
                           0.5 * abs(scaling[key][1] - scaling[key][0]))
                          if key in scaling else None)
        self.u, self.v, self.Re = mk("u"), mk("v"), mk("Re")
        self.p = mk("p") if format == "uvp" else None
        self.num_fields = 3 if format == "uvp" else 2

    def _scale_strided(self, arr: np.ndarray, offset: int, cd) -> np.ndarray:
        arr = np.array(arr, copy=True)
        arr[:, offset::self.num_fields] = \
            (arr[:, offset::self.num_fields] - cd[0]) / cd[1]
        return arr

    def __call__(self, graph: Graph) -> Graph:
        for offset, cd in ((0, self.u), (1, self.v), (2, self.p)):
            if cd is None or offset >= self.num_fields:
                continue
            graph.field = self._scale_strided(graph.field, offset, cd)
            if graph.has("target"):
                graph.target = self._scale_strided(graph.target, offset, cd)
        if self.Re is not None and graph.has("glob"):
            graph.glob = (graph.glob - self.Re[0]) / self.Re[1]
        return graph
