"""Training configuration.

Mirrors ``TrainConfig`` (``/root/reference/graphs4cfd/nn/model.py:14-82``)
including dict-style access; adds TPU-era knobs (seed, metric directory)
while keeping every reference field and default.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Union


class TrainConfig:
    """Plain config object with dict-style access (``model.py:78-82``).

    Args mirror the reference: name, folder, checkpoint (resume path),
    tensor_board (metric log dir), chk_interval, training_loss,
    validation_loss, epochs, num_steps (rollout curriculum — int or
    increasing list), add_steps ({'tolerance', 'loss'}), batch_size, lr,
    grad_clip ({'epoch', 'limit'} or None), scheduler ({'factor',
    'patience', 'loss'} or None), stopping (lr floor), mixed_precision
    (bf16 compute on TPU — no loss scaling needed), device.

    TPU additions: ``devices`` (data-parallel mesh width — ``fit`` shards
    each batch and trains under ``shard_map`` with exact global losses)
    and ``graph_devices`` (edge-partition each batch graph across a
    graph-parallel axis; one giant mesh per batch).
    """

    def __init__(self,
                 name: str,
                 folder: str = "./",
                 checkpoint: Optional[str] = None,
                 tensor_board: Optional[str] = None,
                 chk_interval: int = 1,
                 training_loss: Callable = None,
                 validation_loss: Callable = None,
                 epochs: int = 1,
                 num_steps: Union[int, List[int]] = [1],
                 add_steps: dict = {"tolerance": 0, "loss": "training"},
                 batch_size: int = 1,
                 lr: float = 1e-3,
                 grad_clip: Optional[dict] = None,
                 scheduler: Optional[dict] = None,
                 stopping: float = 0.0,
                 mixed_precision: bool = False,
                 device=None,
                 seed: int = 0,
                 devices: int = 1,
                 graph_devices: int = 1,
                 checkpoint_format: str = "pickle"):
        self.name = name
        self.folder = folder
        self.checkpoint = checkpoint
        self.tensor_board = tensor_board
        self.chk_interval = chk_interval
        self.training_loss = training_loss
        self.validation_loss = validation_loss
        self.epochs = epochs
        self.num_steps = ([num_steps] if isinstance(num_steps, int)
                          else list(num_steps))
        self.add_steps = add_steps
        self.batch_size = batch_size
        self.lr = lr
        self.grad_clip = grad_clip
        self.scheduler = scheduler
        self.stopping = stopping
        self.mixed_precision = mixed_precision
        self.device = device
        self.seed = seed
        # TPU-era distribution knobs: ``devices`` shards the batch over a
        # data-parallel mesh axis; ``graph_devices`` edge-partitions each
        # batch graph over a graph-parallel axis (SURVEY §5 long-context).
        self.devices = devices
        self.graph_devices = graph_devices
        # "pickle" writes the reference's one-file .chk schema;
        # "orbax" routes fit's periodic checkpoints through
        # OrbaxCheckpointer (atomic, step-versioned, multi-host-safe) into
        # <folder>/<name>_orbax/, resuming from its latest step when
        # ``checkpoint`` is set.
        if checkpoint_format not in ("pickle", "orbax"):
            raise ValueError(
                f"checkpoint_format must be 'pickle' or 'orbax', got "
                f"{checkpoint_format!r}")
        self.checkpoint_format = checkpoint_format

    def __repr__(self):
        return repr(self.__dict__)

    def __getitem__(self, key):
        return self.__dict__.get(key)
