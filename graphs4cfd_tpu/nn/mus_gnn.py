"""MuS-GNN family — multi-scale GNNs with grid-cluster pooling.

One generic V-cycle engine replaces the reference's eight hand-unrolled
classes (``/root/reference/graphs4cfd/nn/mus_gnn.py``: ``NsOneScaleGNN:11``,
``NsTwoScaleGNN:100``, ``NsThreeScaleGNN:221``, ``NsFourScaleGNN:376``,
``AdvOneScaleGNN:566``, ``AdvTwoScaleGNN:639``, ``AdvThreeScaleGNN:744``,
``AdvFourScaleGNN:883``), which differ only in layer counts/order.  The
execution plan is derived from the arch dict's key order (the dict is the
de-facto model IR, persisted in checkpoints), so any reference arch runs
as-is; the 8 class names are kept as aliases for API parity.

Semantics mirrored exactly (cf. ``mus_gnn.py:312-373``):
  * node input = concat(field, loc?, glob?, omega?)
  * SELU after encoders and after both outputs of every MP layer
  * tanh on Down/Up pooling outputs
  * skip stack: Down pushes (field, edge_attr); Up consumes the coarse
    field and restores the skip level's edge features
  * residual step: ``field[:, -num_fields:] + decoder(field)``
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph import Graph
from .blocks import (gn_block, down_mp, up_mp, pool_edges,
                     window_plan_of as _window_plan_of)
from .model import GNN

_selu = jax.nn.selu

_RESERVED = ("edge_encoder", "node_encoder", "decoder")


def build_mus_plan(arch: dict) -> List[Tuple]:
    """Derive the V-cycle execution plan from arch key order.

    ``mp*`` → MP layer; ``down_mp{h}{l}`` → pool to level ``l``;
    ``up_mp{l}{h}`` → unpool from level ``l``.
    """
    plan = []
    for name in arch:
        if name in _RESERVED:
            continue
        if name.startswith("down_mp"):
            plan.append(("down", name, int(name[-1])))        # target level
        elif name.startswith("up_mp"):
            plan.append(("up", name, int(name[len("up_mp")])))  # source level
        elif name.startswith("mp"):
            plan.append(("mp", name))
        else:
            raise ValueError(f"Unknown arch key for MuS plan: {name!r}")
    return plan


def _node_input(graph: Graph) -> jnp.ndarray:
    """concat(field, loc?, glob?, omega?) — ``mus_gnn.py:315``."""
    parts = [graph.field]
    for name in ("loc", "glob", "omega"):
        if graph.has(name):
            parts.append(graph.data[name])
    return jnp.concatenate(parts, axis=-1)


def mus_apply(params: dict, graph: Graph, plan, num_fields: int,
              compute_dtype=jnp.float32,
              scan_layers: bool = False) -> jnp.ndarray:
    """Generic MuS-GNN forward (one residual time step)."""
    cd = compute_dtype
    v = _selu(_apply_enc(params["node_encoder"], _node_input(graph), cd))
    e = _selu(_apply_enc(params["edge_encoder"], graph.edge_attr, cd))
    level = 1
    skips = []
    fixed_k = graph.get("fixed_k")
    sender_sort = (
        (graph.data["sender_perm"], graph.data["sender_sorted"])
        if graph.has("sender_perm") else None)
    window_plan = _window_plan_of(graph)

    def run_mp_group(names, v, e, level, e_dead=False):
        """Run consecutive same-level MP layers; identical-shape runs fold
        into one ``lax.scan`` over stacked params (the 4–8 repeated 128-wide
        layers per level), shrinking the HLO ~4x — a large compile-time win
        on TPU with no numeric change."""
        def one(name_params, v, e, skip_e=False):
            # inter-layer SELU (mus_gnn.py:320-366) fused into the block
            if level == 1:
                v, e = gn_block(name_params, v, e, graph.senders,
                                graph.receivers, fixed_k=fixed_k,
                                sender_sort=sender_sort, compute_dtype=cd,
                                out_activation="selu",
                                window_plan=window_plan,
                                skip_e_out=skip_e)
            else:
                v, e = gn_block(name_params, v, e,
                                graph.data[f"senders_{level}"],
                                graph.data[f"receivers_{level}"],
                                edge_mask=graph.data[f"edge_mask_{level}"],
                                compute_dtype=cd, out_activation="selu")
            return v, e

        # ``e_dead``: an ``up`` (which restores e from the skip stack) or
        # the decoder follows this group, so the final layer's e′ has no
        # consumer — the fused kernel then skips its store and zero
        # cotangent (peeled out of the layer-scan).  Only peel where the
        # skip can actually take effect — the level-1 fused-kernel path —
        # otherwise the peel just unrolls one layer out of the scan
        # (larger HLO, longer remote compile) for zero kernel benefit
        # (ADVICE r3 #1).
        can_skip = level == 1 and fixed_k is not None
        tail = names[-1] if e_dead and can_skip else None
        names = names[:-1] if tail is not None else names
        trees = [params[n] for n in names]
        structs = {jax.tree_util.tree_structure(t) for t in trees}
        shapes = {tuple(x.shape for x in jax.tree_util.tree_leaves(t))
                  for t in trees}
        if scan_layers and len(names) > 1 and len(structs) == 1 \
                and len(shapes) == 1:
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *trees)

            def body(carry, layer_params):
                v, e = carry
                return one(layer_params, v, e), None

            (v, e), _ = jax.lax.scan(body, (v, e), stacked)
        else:
            for t in trees:
                v, e = one(t, v, e)
        if tail is not None:
            v, e = one(params[tail], v, e, skip_e=True)
        return v, e

    # group consecutive MP ops (same level between down/up boundaries)
    grouped = []
    for op in plan:
        if op[0] == "mp" and grouped and grouped[-1][0] == "mp_group":
            grouped[-1][1].append(op[1])
        elif op[0] == "mp":
            grouped.append(["mp_group", [op[1]]])
        else:
            grouped.append(op)
    plan = grouped
    for i, op in enumerate(plan):
        if op[0] == "mp_group":
            nxt = plan[i + 1][0] if i + 1 < len(plan) else None
            v, e = run_mp_group(op[1], v, e, level,
                                e_dead=nxt in ("up", None))
        elif op[0] == "down":
            _, name, tgt = op
            skips.append((v, e))
            node_mask = (graph.node_mask if level == 1
                         else graph.data[f"node_mask_{level}"])
            num_coarse = graph.data[f"node_mask_{tgt}"].shape[0]
            v = down_mp(params[name], v, graph.data[f"e_rel_{tgt}"],
                        graph.data[f"parent_{tgt}"], num_coarse,
                        activation=jnp.tanh, node_mask=node_mask,
                        compute_dtype=cd)
            e = pool_edges(e, graph.data[f"edge_f2c_{tgt}"],
                           graph.data[f"senders_{tgt}"].shape[0])
            level = tgt
        elif op[0] == "up":
            _, name, src = op
            v_skip, e_skip = skips.pop()
            v = up_mp(params[name], v, graph.data[f"e_rel_{src}"],
                      graph.data[f"parent_{src}"], v_skip,
                      activation=jnp.tanh, compute_dtype=cd)
            e = e_skip
            level = src - 1
    out = _apply_enc(params["decoder"], v, cd)
    return graph.field[:, -num_fields:] + out


def _apply_enc(p, x, cd):
    from .mlp import apply_mlp
    return apply_mlp(p, x, compute_dtype=cd)


class MuSGNN(GNN):
    """Generic multi-scale GNN with grid-cluster pooling (any arch dict)."""
    family = "mus"

    def build_plan(self, arch: dict):
        return build_mus_plan(arch)

    def apply(self, params, graph: Graph, t: Optional[int] = None):
        return mus_apply(params, graph, self.plan, self.num_fields,
                         self.compute_dtype, self.scan_layers)


# ---- reference class-name aliases (API parity; mus_gnn.py:11,100,221,376,
# 566,639,744,883) ----------------------------------------------------------
class NsOneScaleGNN(MuSGNN):
    PRETRAINED = {
        "1S-GNN-NsCircle-v1": "NsMuSGNN/NsOneScaleGNN.chk",
        # framework-trained on the analytic Taylor–Green NS demo
        # (tools/train_taylor_green.py; reference binaries are LFS stubs)
        "1S-GNN-TaylorGreen-TPU-v1":
            "NsMuSGNN/NsOneScaleGNN_taylor_green_tpu.chk",
    }


class NsTwoScaleGNN(MuSGNN):
    PRETRAINED = {
        "2S-GNN-NsCircle-v1": "NsMuSGNN/NsTwoScaleGNN.chk",
        # framework-trained 2-scale model on the analytic Taylor–Green NS
        # demo (tools/train_taylor_green.py --family mus --scales 2)
        "2S-GNN-TaylorGreen-TPU-v1":
            "NsMuSGNN/NsTwoScaleGNN_taylor_green_tpu.chk",
    }


class NsThreeScaleGNN(MuSGNN):
    PRETRAINED = {
        "3S-GNN-NsCircle-v1": "NsMuSGNN/NsThreeScaleGNN.chk",
        # framework-trained 3-scale model on the analytic Taylor–Green NS
        # demo (tools/train_taylor_green.py --family mus --scales 3)
        "3S-GNN-TaylorGreen-TPU-v1":
            "NsMuSGNN/NsThreeScaleGNN_taylor_green_tpu.chk",
    }


class NsFourScaleGNN(MuSGNN):
    PRETRAINED = {"4S-GNN-NsCircle-v1": "NsMuSGNN/NsFourScaleGNN.chk"}


class AdvOneScaleGNN(MuSGNN):
    PRETRAINED = {
        "1S-GNN-UniformAdv-v1": "AdvMuSGNN/AdvOneScaleGNN.chk",
        # framework-trained on the analytic advection demo
        # (tools/train_synthetic_adv.py; reference binaries are LFS stubs)
        "1S-GNN-SynthAdv-TPU-v1":
            "AdvMuSGNN/AdvOneScaleGNN_synthadv_tpu.chk",
    }


class AdvTwoScaleGNN(MuSGNN):
    PRETRAINED = {
        "2S-GNN-UniformAdv-v1": "AdvMuSGNN/AdvTwoScaleGNN.chk",
        # framework-trained on the *fast* analytic advection demo
        # (tools/train_synthetic_adv.py --scales 2 --vel-max 2.0 — the
        # multi-hop-per-step regime the multi-scale V-cycle exists for)
        "2S-GNN-SynthAdv-TPU-v1":
            "AdvMuSGNN/AdvTwoScaleGNN_synthadv_tpu.chk",
    }


class AdvThreeScaleGNN(MuSGNN):
    PRETRAINED = {
        "3S-GNN-UniformAdv-v1": "AdvMuSGNN/AdvThreeScaleGNN.chk",
        # framework-trained on the fast analytic advection demo (vel-max
        # 2.0; see BASELINE.md round-5 — at this budget the 2-scale
        # remains the best fast-advection model)
        "3S-GNN-SynthAdv-TPU-v1":
            "AdvMuSGNN/AdvThreeScaleGNN_synthadv_tpu.chk",
    }


class AdvFourScaleGNN(MuSGNN):
    PRETRAINED = {"4S-GNN-UniformAdv-v1": "AdvMuSGNN/AdvFourScaleGNN.chk"}
