"""Core graph kernels: device-side aggregation + host-side construction."""
from .segment import segment_sum, segment_mean, aggregate_fixed_k, gather
from .knn import connect_knn, cross_knn, knn_neighbors
from .voxel import voxel_grid, grid_clustering
from .coarsen import guillard_coarsening, pool_edge_structure
from .angles import extend_graph, inter_level_angles
from .interp import knn_interp_weights, knn_interpolate
from .linalg import pinv_k2, pinv_k2_np
from .order import morton_code, spatial_sort_perm
from .window_plan import build_window_gather_plan, WindowGatherPlan

__all__ = [
    "segment_sum", "segment_mean", "aggregate_fixed_k", "gather",
    "connect_knn", "cross_knn", "knn_neighbors",
    "voxel_grid", "grid_clustering",
    "guillard_coarsening", "pool_edge_structure",
    "extend_graph", "inter_level_angles",
    "knn_interp_weights", "knn_interpolate",
    "pinv_k2", "pinv_k2_np",
    "morton_code", "spatial_sort_perm",
    "build_window_gather_plan", "WindowGatherPlan",
]
