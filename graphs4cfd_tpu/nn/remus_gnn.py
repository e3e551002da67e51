"""REMuS-GNN — rotation-equivariant multi-scale directional message passing.

Generic engine for the reference's ``NsRotEquiTreeScaleGNN``
(``/root/reference/graphs4cfd/nn/remus_gnn.py:11-199``; the "Tree" typo is
API surface — both names are exported).  Everything lives on edges and
edge–edge angles; rotation equivariance is structural:

  * input: node velocity windows are projected onto each level's edge unit
    vectors (``remus_gnn.py:124-126``) and concatenated with Re and ω
    gathered at the receiver (``:128-130``);
  * V-cycle of ``edge_mp`` with ``down_edge_mp`` over inter-level angles
    and ``up_edge_mp`` (pinverse → k-NN-interp → re-projection);
  * output: decoded edge scalars are solved back into node vectors via the
    precomputed pinverses (``:195-197``); ``num_fields`` is fixed at 2
    (``:73``).

All aggregations are fixed-k means (``ops.angles`` layout) — no scatter.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph import Graph
from .blocks import (edge_mp, down_edge_mp, up_edge_mp,
                     edge_scalar_to_node_vector,
                     window_plan_of as _window_plan_of,
                     folded_plan_of as _folded_plan_of)
from .mlp import apply_mlp
from .model import GNN

_selu = jax.nn.selu


def build_remus_plan(arch: dict) -> List[Tuple]:
    plan = []
    for name in arch:
        if name.startswith(("angle_encoder", "edge_encoder")) \
                or name == "decoder":
            continue
        if name.startswith("down_mp"):
            plan.append(("down", name, int(name[-1])))       # target level
        elif name.startswith("up_mp"):
            plan.append(("up", name, int(name[len("up_mp")])))  # source level
        elif name.startswith("mp"):
            plan.append(("mp", name, int(name[2])))
        else:
            raise ValueError(f"Unknown arch key for REMuS plan: {name!r}")
    return plan


def _suffix(l: int) -> str:
    return "" if l == 1 else f"_{l}"


def remus_apply(params: dict, graph: Graph, plan, num_fields: int = 2,
                compute_dtype=jnp.float32,
                scan_layers: bool = False) -> jnp.ndarray:
    cd = compute_dtype
    num_levels = graph.num_levels
    field = graph.field
    e, a, xa = {}, {}, {}
    for l in range(1, num_levels + 1):
        s = _suffix(l)
        recv = graph.data[f"receivers{s}"]
        unit = graph.data[f"unit_vec{s}"]
        origin = (None if l == 1 else graph.data[f"node_origin_{l}"])
        f_l = field if origin is None else field[origin]
        glob_l = graph.glob if origin is None else graph.glob[origin]
        omega_l = graph.omega if origin is None else graph.omega[origin]
        # project the field window onto edge unit vectors (remus_gnn.py:124).
        # receivers are canonical (repeat(arange(V), k), architecture
        # invariant) ⇒ every [recv] gather is a broadcast, not a ~57 ns/row
        # dynamic gather (and its backward a reshape-sum, not a scatter)
        E_l, V_l = recv.shape[0], f_l.shape[0]
        k_l = E_l // V_l

        def rep(x):
            return jnp.broadcast_to(x[:, None], (V_l, k_l) + x.shape[1:]
                                    ).reshape((E_l,) + x.shape[1:])

        w = rep(f_l).reshape(E_l, -1, 2)                   # [E, n_in, 2]
        proj = (w * unit[:, None, :]).sum(axis=-1)         # [E, n_in]
        e_in = jnp.concatenate([proj, rep(glob_l), rep(omega_l)], axis=-1)
        enc = "edge_encoder" if l == 1 else f"edge_encoder{l}"
        e[l] = _selu(apply_mlp(params[enc], e_in, compute_dtype=cd))
        aenc = "angle_encoder" if l == 1 else f"angle_encoder{l}"
        a[l] = _selu(apply_mlp(params[aenc], graph.data[f"angle_attr{s}"],
                               compute_dtype=cd))
        if l > 1:
            xenc = f"angle_encoder{l - 1}{l}"
            xa[l] = _selu(apply_mlp(params[xenc],
                                    graph.data[f"xangle_attr_{l}"],
                                    compute_dtype=cd))
    level = 1

    def run_mp_group(names, l, last_visit=False):
        """Fold identical-shape consecutive EdgeMP layers into one
        lax.scan (compile-time optimisation; numerics unchanged)."""
        angle_src = graph.data[f"angle_src{_suffix(l)}"]
        # level-1 angle gather = node-sender gather from the [V, k·H]
        # reshaped edge table → reuse the loader's windowed MXU plan;
        # the folded plans (one per level) route the whole chain through
        # the folded line-graph kernel (ops.pallas_edgemp) when present
        wplan = _window_plan_of(graph) if l == 1 else None
        fplan = _folded_plan_of(graph, l)

        def one(p, e_l, a_l, skip_a=False):
            # inter-layer SELU fused into edge_mp (in-kernel on the fused
            # Pallas path — saves an HBM roundtrip of the [E·k, H] angles)
            return edge_mp(p, e_l, a_l, angle_src, compute_dtype=cd,
                           window_plan=wplan, folded_plan=fplan,
                           out_activation="selu", skip_a_out=skip_a)

        # The angle state of this level's FINAL group's FINAL layer has no
        # consumer (nothing revisits the level before the decoder): the
        # folded kernel then skips the a′ store and its zero-cotangent
        # backward read (skip_a_out) — peel that layer out of the scan.
        # Only peel when the folded kernel (the one path that honours
        # skip_a_out) can actually engage; otherwise the peel just unrolls
        # a layer out of the scan for zero kernel benefit — larger HLO,
        # longer remote compile (ADVICE r4 #4, mirrors the mus/mugs gate).
        can_skip = fplan is not None
        tail = names[-1] if last_visit and can_skip else None
        names = names[:-1] if tail is not None else names
        trees = [params[n] for n in names]
        structs = {jax.tree_util.tree_structure(t) for t in trees}
        shapes = {tuple(x.shape for x in jax.tree_util.tree_leaves(t))
                  for t in trees}
        if scan_layers and len(names) > 1 and len(structs) == 1 \
                and len(shapes) == 1:
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                             *trees)

            def body(carry, p):
                return one(p, *carry), None

            (e[l], a[l]), _ = jax.lax.scan(body, (e[l], a[l]), stacked)
        else:
            for t in trees:
                e[l], a[l] = one(t, e[l], a[l])
        if tail is not None:
            e[l], a[l] = one(params[tail], e[l], a[l], skip_a=True)

    grouped = []
    for op in plan:
        if op[0] == "mp" and grouped and grouped[-1][0] == "mp_group" \
                and grouped[-1][2] == op[2]:
            grouped[-1][1].append(op[1])
        elif op[0] == "mp":
            grouped.append(["mp_group", [op[1]], op[2]])
        else:
            grouped.append(op)
    last_group_of_level = {op[2]: i for i, op in enumerate(grouped)
                           if op[0] == "mp_group"}
    for i, op in enumerate(grouped):
        if op[0] == "mp_group":
            run_mp_group(op[1], op[2],
                         last_visit=(last_group_of_level[op[2]] == i))
        elif op[0] == "down":
            _, name, tgt = op
            e[tgt] = down_edge_mp(params[name], e[tgt - 1], e[tgt], xa[tgt],
                                  graph.data[f"xangle_src_{tgt}"],
                                  compute_dtype=cd, out_activation="selu")
            level = tgt
        elif op[0] == "up":
            _, name, src = op
            tgt = src - 1
            st, ss = _suffix(tgt), _suffix(src)
            e[tgt] = up_edge_mp(
                params[name], e[src], graph.data[f"unit_pinv{ss}"],
                graph.data[f"up_idx_{src}"], graph.data[f"up_w_{src}"],
                graph.data[f"receivers{st}"], graph.data[f"unit_vec{st}"],
                e[tgt], compute_dtype=cd)
            e[tgt] = _selu(e[tgt])
            level = tgt
    dec = apply_mlp(params["decoder"], e[1], compute_dtype=cd)  # [E1, 1]
    out = edge_scalar_to_node_vector(dec, graph.unit_pinv)       # [V, 1, 2]
    out = out.reshape(out.shape[0], -1)                          # [V, 2]
    return field[:, -num_fields:] + out


class REMuSGNN(GNN):
    """Generic rotation-equivariant multi-scale GNN (any REMuS arch dict)."""
    family = "remus"

    def load_arch(self, arch: dict, seed: int = 0):
        super().load_arch(arch, seed=seed)
        self.num_fields = 2  # remus_gnn.py:73 — output is a 2-D node vector

    def build_plan(self, arch: dict):
        return build_remus_plan(arch)

    def apply(self, params, graph: Graph, t: Optional[int] = None):
        return remus_apply(params, graph, self.plan, self.num_fields,
                           self.compute_dtype, self.scan_layers)


class NsRotEquiThreeScaleGNN(REMuSGNN):
    PRETRAINED = {
        "RE3S-GNN-NsEllipse-v1": "NsREMuSGNN/NsRotEquiThreeScaleGNN.chk",
        # framework-trained (tools/train_taylor_green.py --family remus)
        "RE3S-GNN-TaylorGreen-TPU-v1":
            "NsREMuSGNN/NsRotEquiThreeScaleGNN_taylor_green_tpu.chk",
    }


# Reference spelling (remus_gnn.py:11) kept as an alias.
NsRotEquiTreeScaleGNN = NsRotEquiThreeScaleGNN
