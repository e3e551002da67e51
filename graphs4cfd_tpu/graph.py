"""Graph data model: a static-shape, padded pytree of arrays.

TPU-native replacement for the reference's PyG ``Data`` subclass
(``/root/reference/graphs4cfd/graph.py:6``).  Where the reference carries a
dynamic bag of ragged tensors rebuilt every epoch, this container holds
**padded, statically shaped** arrays plus validity masks so that every model
forward compiles once per shape bucket under ``jax.jit``.

Conventions
-----------
* Edges are stored as separate ``senders``/``receivers`` int32 arrays and are
  **sorted by receiver**.  k-NN graphs additionally have *exact indegree k*
  (the reference relies on this too: ``transforms/mugs.py:23``,
  ``transforms/remus.py:28``), i.e. the edges of receiver ``v`` occupy the
  contiguous slots ``[v*k, (v+1)*k)``.  This turns neighbourhood aggregation
  into a ``[V, k, F]`` reshape + mean — no scatter on the hot path.
* Padding: node arrays are padded to ``num_nodes`` rows, edge arrays to
  ``num_edges`` rows; ``node_mask`` / ``edge_mask`` flag the valid entries.
  Padded edges point at node slot 0 and are masked out of every reduction.
* Arbitrary per-level auxiliary arrays (cluster maps, coarse edges, angle
  indices, interpolation weights, ...) live in the open ``data`` dict; the
  pytree flattens its values so everything moves to device together.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _is_array(x) -> bool:
    return isinstance(x, (np.ndarray, jnp.ndarray, jax.Array))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Graph:
    """A batch of (possibly multi-level) graphs as one padded super-graph.

    Mirrors the attribute surface of the reference ``Graph``
    (``graph.py:6-19`` plus the ad-hoc attributes the transforms attach),
    but with static shapes.  All arrays are leaves of the pytree; Python
    scalars/None stay in the treedef so jit re-traces when they change.
    """

    data: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # ---- pytree protocol -------------------------------------------------
    # Arrays are leaves; python scalars/strings (fixed_k, num_levels, ...)
    # go into the hashable treedef so they stay *static* under jit.
    def tree_flatten(self):
        array_keys = tuple(sorted(k for k, v in self.data.items()
                                  if _is_array(v) or hasattr(v, "dtype")))
        static = tuple(sorted((k, v) for k, v in self.data.items()
                              if k not in array_keys))
        leaves = [self.data[k] for k in array_keys]
        return leaves, (array_keys, static)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        array_keys, static = aux
        data = dict(zip(array_keys, leaves))
        data.update(dict(static))
        return cls(data=data)

    # ---- attribute-style access (matches reference ergonomics) ----------
    def __getattr__(self, name):
        if name.startswith("__") or name == "data":
            raise AttributeError(name)
        try:
            return self.data[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        if name == "data":
            object.__setattr__(self, name, value)
        else:
            self.data[name] = value

    def __contains__(self, name) -> bool:
        return name in self.data

    def get(self, name, default=None):
        return self.data.get(name, default)

    def replace(self, **updates) -> "Graph":
        new = dict(self.data)
        new.update(updates)
        return Graph(data=new)

    # ---- convenience -----------------------------------------------------
    def arrays(self) -> Dict[str, Any]:
        """The array-valued entries (pytree leaves) as a plain dict —
        useful for passing through shard_map with per-key specs."""
        return {k: v for k, v in self.data.items()
                if _is_array(v) or hasattr(v, "dtype")}

    def statics(self) -> Dict[str, Any]:
        return {k: v for k, v in self.data.items()
                if not (_is_array(v) or hasattr(v, "dtype"))}

    @property
    def num_nodes(self) -> int:
        return int(self.data["pos"].shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.data["senders"].shape[0])

    def has(self, name: str) -> bool:
        return name in self.data and self.data[name] is not None

    def to_device(self, device=None) -> "Graph":
        put = lambda x: jax.device_put(x, device) if _is_array(x) else x
        return Graph(data={k: put(v) for k, v in self.data.items()})

    def numpy(self) -> "Graph":
        conv = lambda x: np.asarray(x) if _is_array(x) else x
        return Graph(data={k: conv(v) for k, v in self.data.items()})

    def __repr__(self):
        parts = []
        for k in sorted(self.data):
            v = self.data[k]
            if _is_array(v):
                parts.append(f"{k}={tuple(v.shape)}:{v.dtype}")
            else:
                parts.append(f"{k}={v!r}")
        return "Graph(" + ", ".join(parts) + ")"

    # Plotting shims, mirroring graph.py:12-19 of the reference.
    def plot_pos(self, **kwargs):
        from . import plot
        plot.pos(np.asarray(self.data["pos"]), **kwargs)

    def plot_field(self, *args, **kwargs):
        from . import plot
        bound = np.asarray(self.data["bound"]) if self.has("bound") else None
        plot.field(np.asarray(self.data["pos"]), bound=bound, *args, **kwargs)

    def plot_pos_field(self, *args, **kwargs):
        from . import plot
        plot.pos_field(np.asarray(self.data["pos"]), *args, **kwargs)
