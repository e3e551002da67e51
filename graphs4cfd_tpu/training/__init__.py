"""Training/inference runtime: config, trainer, rollout, checkpoints."""
from .config import TrainConfig
from .schedule import ReduceLROnPlateau
from .checkpoint import (save_checkpoint, load_checkpoint, load_weights,
                         import_torch_state_dict,
                         convert_reference_checkpoint, OrbaxCheckpointer)
from .rollout import solve
from .metrics_writer import MetricsWriter

__all__ = ["TrainConfig", "ReduceLROnPlateau", "save_checkpoint",
           "load_checkpoint", "load_weights", "import_torch_state_dict",
           "convert_reference_checkpoint", "OrbaxCheckpointer",
           "solve", "MetricsWriter"]
