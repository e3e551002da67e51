"""Neural-network layer: blocks, models, losses, runtime.

Mirrors the reference ``nn`` package surface
(``/root/reference/graphs4cfd/nn/__init__.py:1-7``).
"""
from .mlp import init_mlp, apply_mlp
from . import blocks
from .model import GNN, init_params_from_arch, num_params, grad_norm2
from .losses import GraphLoss
from .mus_gnn import (MuSGNN, build_mus_plan, mus_apply,
                      NsOneScaleGNN, NsTwoScaleGNN, NsThreeScaleGNN,
                      NsFourScaleGNN, AdvOneScaleGNN, AdvTwoScaleGNN,
                      AdvThreeScaleGNN, AdvFourScaleGNN)
from .mugs_gnn import (MuGSGNN, NsTwoGuillardScaleGNN,
                       NsThreeGuillardScaleGNN, NsFourGuillardScaleGNN)
from .remus_gnn import (REMuSGNN, NsRotEquiThreeScaleGNN,
                        NsRotEquiTreeScaleGNN)
from ..training.config import TrainConfig

__all__ = [
    "init_mlp", "apply_mlp", "blocks", "GNN", "init_params_from_arch",
    "num_params", "grad_norm2", "GraphLoss", "MuSGNN", "build_mus_plan",
    "mus_apply", "NsOneScaleGNN", "NsTwoScaleGNN", "NsThreeScaleGNN",
    "NsFourScaleGNN", "AdvOneScaleGNN", "AdvTwoScaleGNN",
    "AdvThreeScaleGNN", "AdvFourScaleGNN", "MuGSGNN",
    "NsTwoGuillardScaleGNN", "NsThreeGuillardScaleGNN",
    "NsFourGuillardScaleGNN", "REMuSGNN", "NsRotEquiThreeScaleGNN",
    "NsRotEquiTreeScaleGNN", "TrainConfig",
]
