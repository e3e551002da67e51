"""Parallelism: device meshes, data-parallel training, graph partitioning."""
from .mesh import make_mesh, make_hybrid_mesh, initialize_distributed
from .dp import make_dp_train_step, make_dp_val_step, make_dp_rollout
from .graph_parallel import (partition_graph, partition_batches,
                             regroup_sharded,
                             gp_mus_apply, gp_mugs_apply, gp_remus_apply,
                             gp_apply_fn, make_gp_forward,
                             make_gp_train_step, make_gp_val_step, make_gp_rollout,
                             make_dp_gp_forward, make_dp_gp_train_step,
                             make_dp_gp_val_step)

__all__ = ["make_mesh", "make_hybrid_mesh", "initialize_distributed", "make_dp_train_step",
           "make_dp_val_step", "make_dp_rollout", "partition_graph",
           "partition_batches", "regroup_sharded", "gp_mus_apply",
           "gp_mugs_apply", "gp_remus_apply", "gp_apply_fn", "make_gp_forward",
           "make_gp_train_step", "make_gp_val_step", "make_gp_rollout",
           "make_dp_gp_forward", "make_dp_gp_train_step",
           "make_dp_gp_val_step"]
