"""Device-mesh helpers.

The reference is single-process single-device (SURVEY §2.3 — no
torch.distributed anywhere); scaling here is native: a
``jax.sharding.Mesh`` with a ``data`` axis (batch shards) and optionally a
``graph`` axis (edge partition of one giant mesh), collectives over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_data: Optional[int] = None, num_graph: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, graph) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_graph
    assert num_data * num_graph <= len(devices), \
        f"mesh {num_data}x{num_graph} > {len(devices)} devices"
    arr = np.array(devices[:num_data * num_graph]).reshape(num_data, num_graph)
    return Mesh(arr, ("data", "graph"))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host runtime bring-up (``jax.distributed.initialize``).

    No-op when single-process arguments are absent; call once per host
    before creating meshes on a pod slice.
    """
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
