"""Checkpoint save/load with the reference's logical schema.

The reference pickles ``{arch, weights, optimiser, n_out, lr, epoch,
[scheduler]}`` (``/root/reference/graphs4cfd/nn/model.py:329-349``) and a
bare checkpoint self-describes the architecture (``model.py:122-129``).
Same here: one ``.chk`` file, arch dict included, arrays stored as NumPy.

``import_torch_state_dict`` converts a reference PyTorch ``state_dict``
into this framework's parameter pytree for per-layer parity testing
(SURVEY §4 item 2).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(file_name: str, *, arch: dict, weights,
                    opt_state=None, n_out: int = 1, lr: float = None,
                    epoch: int = 0, scheduler_state: Optional[dict] = None):
    checkpoint = {
        "arch": arch,
        "weights": _to_numpy(weights),
        "optimiser": _to_numpy(opt_state) if opt_state is not None else None,
        "n_out": n_out,
        "lr": lr,
        "epoch": epoch,
    }
    if scheduler_state is not None:
        checkpoint["scheduler"] = scheduler_state
    tmp = file_name + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(checkpoint, f)
    os.replace(tmp, file_name)


def load_checkpoint(file_name: str) -> dict:
    with open(file_name, "rb") as f:
        return pickle.load(f)


def load_weights(file_name: str, like=None):
    """Load a weights-only file (pickled pytree) onto device."""
    with open(file_name, "rb") as f:
        weights = pickle.load(f)
    if isinstance(weights, dict) and "weights" in weights:
        weights = weights["weights"]
    return jax.tree_util.tree_map(jnp.asarray, weights)


class OrbaxCheckpointer:
    """Orbax-backed checkpoint manager for large-scale / multi-host runs.

    The default ``.chk`` pickle keeps the reference's one-file
    self-describing format; this wrapper provides atomic, async-capable,
    step-versioned checkpoints (SURVEY §5 failure-recovery) with the same
    logical schema.  Arrays are saved natively (sharding-aware on restore
    under jax.distributed); arch/scalars ride along as metadata.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, *, arch: dict, weights, opt_state=None,
             n_out: int = 1, lr: float = None, scheduler_state=None):
        args = self._ocp.args
        meta = {"arch": _arch_jsonable(arch), "n_out": n_out, "lr": lr,
                "scheduler": scheduler_state}
        parts = {"weights": args.StandardSave(_to_numpy(weights)),
                 "meta": args.JsonSave(meta)}
        if opt_state is not None:
            parts["opt_state"] = args.StandardSave(_to_numpy(opt_state))
        self.manager.save(step, args=args.Composite(**parts))
        self.manager.wait_until_finished()

    def restore(self, step: Optional[int] = None) -> dict:
        args = self._ocp.args
        step = self.latest_step() if step is None else step
        payload = self.manager.restore(
            step, args=args.Composite(weights=args.StandardRestore(),
                                      meta=args.JsonRestore()))
        meta = payload["meta"]
        out = {
            "arch": _arch_from_jsonable(meta["arch"]),
            "weights": payload["weights"],
            "optimiser": None,
            "n_out": int(meta["n_out"]),
            "lr": meta["lr"],
            "epoch": step,
            "scheduler": meta["scheduler"],
        }
        try:
            out["optimiser"] = self.manager.restore(
                step, args=args.Composite(
                    opt_state=args.StandardRestore()))["opt_state"]
        except Exception:
            pass
        return out

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()


def _arch_jsonable(arch: dict):
    """Arch dicts contain tuples; JSON round-trips them as lists."""
    return {k: v for k, v in arch.items()}


def _arch_from_jsonable(arch: dict) -> dict:
    def tup(v):
        if isinstance(v, list):
            return tuple(tup(x) for x in v)
        return v
    return {k: tup(v) for k, v in arch.items()}


def convert_reference_checkpoint(src_chk: str, dst_chk: str) -> dict:
    """Convert a reference PyTorch ``.chk`` into this framework's format.

    Reads the reference checkpoint schema
    (``/root/reference/graphs4cfd/nn/model.py:338-345``: arch + weights
    state_dict + optimiser + n_out + lr + epoch), converts the state_dict
    into the parameter pytree and writes a framework checkpoint.  Optimiser
    state is NOT carried over (Adam moments transfer poorly across
    frameworks); resume re-initialises it.
    """
    import torch
    state = torch.load(src_chk, map_location="cpu", weights_only=False)
    weights = import_torch_state_dict(state["weights"])
    save_checkpoint(dst_chk, arch=state["arch"], weights=weights,
                    n_out=state.get("n_out", 1), lr=state.get("lr"),
                    epoch=state.get("epoch", 0))
    return {"arch": state["arch"], "weights": weights}


def import_torch_state_dict(state_dict: dict) -> dict:
    """Convert a reference ``state_dict`` into this framework's pytree.

    Reference naming (``nn/blocks.py:134-141,165-166``):
    ``<block>.<submlp?>.MLP.linear_i.{weight,bias}`` and
    ``...MLP.layer_norm.{weight,bias}``; torch Linear weights are
    ``[out, in]`` → transposed to ``[in, out]``.
    """
    params: dict = {}
    for name, tensor in state_dict.items():
        arr = np.asarray(tensor, dtype=np.float32)
        parts = name.split(".")
        # e.g. mp111.edge_mlp.MLP.linear_1.weight
        #      edge_encoder.MLP.linear_1.weight
        #      down_mp12.down_mlp.MLP.linear_2.bias
        mlp_idx = parts.index("MLP")
        block = parts[0]
        sub = parts[1:mlp_idx]  # [] or ['edge_mlp'] / ['node_mlp'] / ...
        layer_name, kind = parts[mlp_idx + 1], parts[mlp_idx + 2]
        node = params.setdefault(block, {})
        if sub:
            key = sub[0]
            if key in ("down_mlp", "up_mlp"):  # stored flat in this framework
                pass
            else:
                node = node.setdefault(key, {})
        if layer_name == "layer_norm":
            ln = node.setdefault("ln", {})
            ln["scale" if kind == "weight" else "bias"] = arr
        else:
            i = int(layer_name.split("_")[1]) - 1
            layers = node.setdefault("layers", [])
            while len(layers) <= i:
                layers.append({})
            layers[i]["w" if kind == "weight" else "b"] = \
                (arr.T if kind == "weight" else arr)
    return params
