"""graphs4cfd_tpu — a TPU-native framework for graph-neural-network CFD
surrogate solvers (MuS-GNN, gMuS-GNN, REMuS-GNN families).

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference ``graphs4cfd`` package (PyTorch + PyG), built TPU-first:
receiver-sorted fixed-indegree edge layouts turn neighbourhood aggregation
into reshape-reductions, graph topology is built once on host (C++ kernels)
and cached, rollouts run under ``jax.lax.scan``, and training scales over a
``jax.sharding.Mesh``.
"""
from . import ops
from .graph import Graph

__version__ = "0.1.0"
__all__ = ["ops", "Graph"]


def __getattr__(name):
    # Lazy imports keep `import graphs4cfd_tpu` light and avoid cycles.
    if name in ("nn", "transforms", "datasets", "loader", "metrics", "plot",
                "training", "parallel"):
        import importlib
        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    if name == "DataLoader":
        from .loader import DataLoader
        return DataLoader
    raise AttributeError(name)
