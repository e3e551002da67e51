"""Device-mesh helpers.

The reference is single-process single-device (SURVEY §2.3 — no
torch.distributed anywhere); scaling here is native: a
``jax.sharding.Mesh`` with a ``data`` axis (batch shards) and optionally a
``graph`` axis (edge partition of one giant mesh), collectives over ICI
within a slice and DCN across slices.
"""
from __future__ import annotations

import os
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


def make_hybrid_mesh(dcn_data: int, ici_data: int = 1,
                     ici_graph: int = 1) -> Mesh:
    """DCN-aware 2-axis mesh for multi-slice / multi-host pods.

    Axis layout follows the scaling-book recipe: the *outer* ``data`` axis
    factor rides DCN (one batch group per slice — gradient all-reduce is
    the only cross-slice collective, once per optimiser step), while the
    graph-parallel axis — whose halo ``all_to_all`` fires every MP layer —
    stays strictly *inside* a slice on ICI.  ``data`` size =
    ``dcn_data * ici_data``.

    On a single slice (or CPU test mesh) this degrades to ``make_mesh``
    with the same total factors.
    """
    from jax.experimental import mesh_utils
    total = dcn_data * ici_data * ici_graph
    devices = jax.devices()
    assert total <= len(devices), f"{total} > {len(devices)} devices"
    num_slices = max((getattr(d, "slice_index", 0) or 0)
                     for d in devices) + 1
    if num_slices > 1:
        arr = mesh_utils.create_hybrid_device_mesh(
            (ici_data, ici_graph), (dcn_data, 1),
            devices=devices[:total])
        arr = arr.reshape(dcn_data * ici_data, ici_graph)
        return Mesh(arr, ("data", "graph"))
    return make_mesh(num_data=dcn_data * ici_data, num_graph=ici_graph,
                     devices=devices[:total])


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids: Optional[Sequence[int]] = None
                           ) -> int:
    """Multi-host runtime bring-up (``jax.distributed.initialize``).

    Call once per host before creating meshes on a pod slice.  On TPU pods
    and standard cluster environments (GKE/Slurm/Cloud-TPU metadata) the
    arguments auto-detect — call with no arguments; explicit
    coordinator/process arguments cover bare-metal MPI-style launches
    (``COORDINATOR=host:port NPROC=.. PID=..``, also read from the
    environment).  Returns the process count (1 when single-process).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "GRAPHS4CFD_COORDINATOR")
    num_processes = num_processes or (
        int(os.environ["GRAPHS4CFD_NUM_PROCESSES"])
        if "GRAPHS4CFD_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["GRAPHS4CFD_PROCESS_ID"])
        if "GRAPHS4CFD_PROCESS_ID" in os.environ else None)
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id,
                                   local_device_ids=local_device_ids)
    elif os.environ.get("GRAPHS4CFD_AUTO_DISTRIBUTED"):
        # pure auto-detection (TPU pod metadata); opt-in so single-host
        # dev boxes never block on a coordinator
        jax.distributed.initialize()
    return jax.process_count()
