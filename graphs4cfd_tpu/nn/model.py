"""Model base class: arch-dict-driven parameter trees + lifecycle.

TPU-native counterpart of the reference ``GNN`` base
(``/root/reference/graphs4cfd/nn/model.py:85-362``).  The reference builds a
``torch.nn.Module`` tree positionally from an ``arch`` dict; here the same
arch dict schema (keys are layer names, values are MLP constructor tuples —
``model.py:134-140``, persisted in checkpoints at ``model.py:339``) drives a
pure parameter pytree, and ``forward`` is a *pure function*
``(params, graph) -> prediction`` so the whole train/rollout step jits.

Checkpoints keep the reference's logical schema
(``model.py:329-349``: arch + weights + optimiser + n_out + lr + epoch) in
an orbax/pickle container; see ``training/checkpoint.py``.
"""
from __future__ import annotations

import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from .mlp import init_mlp


def _is_mlp_tuple(v) -> bool:
    return (isinstance(v, (tuple, list)) and len(v) == 3
            and isinstance(v[0], int))


def init_params_from_arch(arch: dict, key: jax.Array) -> dict:
    """Build the parameter pytree from a reference-style arch dict.

    Values are either one MLP tuple ``(in, widths, layer_norm)`` (encoders,
    down/up models, decoder) or a pair of MLP tuples (message-passing
    blocks: edge/angle function + node/edge function).
    """
    params = {}
    for name, spec in arch.items():
        key, sub = jax.random.split(key)
        if _is_mlp_tuple(spec):
            params[name] = init_mlp(sub, *spec)
        elif (isinstance(spec, (tuple, list)) and len(spec) == 2
              and _is_mlp_tuple(spec[0]) and _is_mlp_tuple(spec[1])):
            k1, k2 = jax.random.split(sub)
            first, second = spec
            if name.startswith(("mp", "down_mp")) and _is_angle_block(name, arch):
                params[name] = {"angle_mlp": init_mlp(k1, *first),
                                "edge_mlp": init_mlp(k2, *second)}
            else:
                params[name] = {"edge_mlp": init_mlp(k1, *first),
                                "node_mlp": init_mlp(k2, *second)}
        else:
            raise ValueError(f"Unrecognised arch entry {name!r}: {spec!r}")
    return params


def _is_angle_block(name: str, arch: dict) -> bool:
    """REMuS arch dicts are recognised by their angle encoders; their MP
    blocks pair an angle MLP with an edge MLP instead of edge/node."""
    return any(k.startswith("angle_encoder") for k in arch)


def num_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def grad_norm2(grads) -> jnp.ndarray:
    """Global L2 norm of a gradient pytree (cf. ``model.py:356-362``)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))


class GNN:
    """Stateful wrapper around a functional model.

    Subclasses define ``build_plan(arch)`` (a static execution plan derived
    from the arch dict's key order) and the pure ``apply(params, graph)``.

    Construction mirrors ``model.py:112-130``: from an arch dict (random
    init), arch + weights file, or a self-describing checkpoint.
    """

    #: set by subclasses — family tag used by the generic engines
    family: str = "mus"
    #: name → bundled checkpoint relative path (the reference's pretrained
    #: registry, ``mus_gnn.py:43-48`` etc.); populated by subclasses.
    PRETRAINED: dict = {}

    def __init__(self,
                 arch: Optional[dict] = None,
                 weights: Optional[str] = None,
                 checkpoint: Optional[str] = None,
                 model: Optional[str] = None,
                 seed: int = 0,
                 compute_dtype=jnp.float32,
                 scan_layers: bool = False):
        # scan_layers folds repeated identical MP layers into lax.scan:
        # ~5x faster XLA compiles at ~8% runtime cost — useful in
        # development / frequently changing shapes.
        self.scan_layers = scan_layers
        self.compute_dtype = compute_dtype
        self.params = None
        self.arch = None
        self.num_fields = None
        if model is not None:
            if model not in self.PRETRAINED:
                raise ValueError(f"Model {model} not recognized. Available: "
                                 f"{sorted(self.PRETRAINED)}")
            path = bundled_checkpoint_path(self.PRETRAINED[model])
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"Pretrained checkpoint for {model!r} not bundled at "
                    f"{path}. Convert a reference .chk with "
                    "graphs4cfd_tpu.training.checkpoint."
                    "convert_reference_checkpoint and place it there.")
            checkpoint = path
        if arch is not None and checkpoint is None:
            self.load_arch(arch, seed=seed)
            if weights is not None:
                from ..training.checkpoint import load_weights
                self.params = load_weights(weights, like=self.params)
        elif checkpoint is not None and arch is None and weights is None:
            from ..training.checkpoint import load_checkpoint
            state = load_checkpoint(checkpoint)
            self.load_arch(state["arch"], seed=seed)
            self.params = jax.tree_util.tree_map(
                lambda tmpl, w: jnp.asarray(w, tmpl.dtype) if tmpl is not None else w,
                self.params, state["weights"])

    def load_model(self, arch=None, weights=None, checkpoint=None,
                   seed: int = 0):
        """Reference-compatible loader (``model.py:112-130``): arch dict
        (+ optional weights file) or a self-describing checkpoint."""
        if arch is not None and checkpoint is None:
            self.load_arch(arch, seed=seed)
            if weights is not None:
                from ..training.checkpoint import load_weights
                self.params = load_weights(weights, like=self.params)
        elif checkpoint is not None:
            from ..training.checkpoint import load_checkpoint
            state = load_checkpoint(checkpoint)
            self.load_arch(state["arch"], seed=seed)
            self.params = jax.tree_util.tree_map(
                lambda tmpl, w: jnp.asarray(w, tmpl.dtype),
                self.params, state["weights"])
        return self

    # ------------------------------------------------------------------ arch
    def load_arch(self, arch: dict, seed: int = 0):
        self.arch = dict(arch)
        self.params = init_params_from_arch(self.arch, jax.random.key(seed))
        self.num_fields = (int(arch["decoder"][1][-1])
                           if "decoder" in arch else None)
        self.plan = self.build_plan(self.arch)

    def build_plan(self, arch: dict):
        raise NotImplementedError

    def apply(self, params, graph: Graph, t: Optional[int] = None):
        """Pure forward pass — one residual Δt step.  Override per family."""
        raise NotImplementedError

    def forward(self, graph: Graph, t: Optional[int] = None):
        return self.apply(self.params, graph, t)

    # ------------------------------------------------------------- lifecycle
    def fit(self, train_config, train_loader, val_loader=None):
        from ..training.trainer import fit
        return fit(self, train_config, train_loader, val_loader)

    def solve(self, graph: Graph, n_out: int) -> jnp.ndarray:
        """Autoregressive rollout (``model.py:303-321``) under one jit.

        Returns ``[V, num_fields*n_out]`` predictions; the graph's field is
        left untouched (functional — no restore dance needed)."""
        from ..training.rollout import solve
        return solve(self, graph, n_out)

    def shift_and_replace(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Roll the field window left by ``num_fields`` and append ``y``
        (``model.py:323-327``)."""
        return jnp.concatenate([x[:, self.num_fields:], y], axis=1)

    def save_checkpoint(self, file_name: str, n_out: int, epoch: int,
                        opt_state=None, lr: float = None,
                        scheduler_state=None):
        from ..training.checkpoint import save_checkpoint
        save_checkpoint(file_name, arch=self.arch, weights=self.params,
                        opt_state=opt_state, n_out=n_out, lr=lr,
                        epoch=epoch, scheduler_state=scheduler_state)

    @property
    def num_params(self) -> int:
        return num_params(self.params)


def bundled_checkpoint_path(relpath: str) -> str:
    """Path of a pretrained checkpoint shipped inside the package
    (mirrors the reference's ``weights/`` registry, ``mus_gnn.py:43-48``)."""
    return os.path.join(os.path.dirname(__file__), "weights", relpath)
