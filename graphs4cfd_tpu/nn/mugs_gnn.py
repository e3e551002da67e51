"""gMuS-GNN family — multi-scale GNNs on Guillard-coarsened levels.

One generic engine replaces the reference's three classes
(``/root/reference/graphs4cfd/nn/mugs_gnn.py``: ``NsTwoGuillardScaleGNN:11``,
``NsThreeGuillardScaleGNN:135``, ``NsFourGuillardScaleGNN:297``).  gMuS arch
dicts carry no explicit down/up keys — the level of each ``mp`` layer is
encoded in its name (``mp2xx`` → level 2 ...), and transitions are implicit
where consecutive layers change level:

  * down l→l+1: select rows by ``down_idx_{l+1}`` and switch to the level's
    own encoded k-NN edges (the reference's mask-select + ``restriction``,
    ``mugs_gnn.py:100-104`` / ``nn/blocks.py:9-32`` — done in local
    numbering here, so restriction is a no-op at runtime).
  * up l→l-1: k-NN-interpolate + concat skip (channel doubling — note the
    wider ``mp121`` input 128+2·256, ``mugs_gnn.py:34``), restore the skip
    level's edges (``mugs_gnn.py:114-117``).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..graph import Graph
from ..ops.interp import knn_interpolate
from .blocks import gn_block, window_plan_of as _window_plan_of
from .mlp import apply_mlp
from .model import GNN

_selu = jax.nn.selu


def build_mugs_plan(arch: dict) -> List[Tuple]:
    """[("mp", name, level)] in execution order, levels parsed from names."""
    plan = []
    for name in arch:
        if name.startswith("mp"):
            plan.append(("mp", name, int(name[2])))
        elif not (name.startswith(("edge_encoder", "node_encoder"))
                  or name == "decoder"):
            raise ValueError(f"Unknown arch key for gMuS plan: {name!r}")
    return plan


def mugs_apply(params: dict, graph: Graph, plan, num_fields: int,
               compute_dtype=jnp.float32,
               scan_layers: bool = False) -> jnp.ndarray:
    cd = compute_dtype
    from .mus_gnn import _node_input
    v = _selu(apply_mlp(params["node_encoder"], _node_input(graph),
                        compute_dtype=cd))
    num_levels = graph.num_levels
    # encode every level's static edges up front (mugs_gnn.py:225-228)
    e = {1: _selu(apply_mlp(params["edge_encoder"], graph.edge_attr,
                            compute_dtype=cd))}
    for l in range(2, num_levels + 1):
        e[l] = _selu(apply_mlp(params[f"edge_encoder{l}"],
                               graph.data[f"edge_attr_{l}"],
                               compute_dtype=cd))
    level = 1
    skips = {}

    def run_group(names, v, e_l, lvl, e_dead=False):
        """Fold identical-shape consecutive layers into one lax.scan
        (compile-time optimisation; numerics unchanged)."""
        suffix = "" if lvl == 1 else f"_{lvl}"
        fixed_k = (graph.get("fixed_k") if lvl == 1
                   else graph.get(f"fixed_k_{lvl}"))

        def one(p, v, e_l, skip_e=False):
            # inter-layer SELU fused into the block (kernel-side on the
            # fixed-k Pallas path); level-1 sender gather goes through the
            # windowed MXU plan when the loader attached one
            v, e_l = gn_block(p, v, e_l, graph.data[f"senders{suffix}"],
                              graph.data[f"receivers{suffix}"],
                              fixed_k=fixed_k, compute_dtype=cd,
                              out_activation="selu",
                              window_plan=(_window_plan_of(graph)
                                           if lvl == 1 else None),
                              skip_e_out=skip_e)
            return v, e_l

        # ``e_dead``: the V-cycle never revisits this level (its last
        # group), so the final layer's e′ has no consumer — the fused
        # kernel skips its store and zero cotangent (peeled from the
        # scan).  Peel only where the fused fixed-k path can honour the
        # skip; elsewhere it just bloats the HLO (ADVICE r3 #1).
        tail = names[-1] if e_dead and fixed_k is not None else None
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

            (v, e_l), _ = jax.lax.scan(body, (v, e_l), stacked)
        else:
            for t in trees:
                v, e_l = one(t, v, e_l)
        if tail is not None:
            v, e_l = one(params[tail], v, e_l, skip_e=True)
        return v, e_l

    # group consecutive same-level layers
    groups = []
    for _, name, lvl in plan:
        if groups and groups[-1][0] == lvl:
            groups[-1][1].append(name)
        else:
            groups.append((lvl, [name]))
    last_group_of_level = {lvl: i for i, (lvl, _) in enumerate(groups)}
    for gi, (lvl, names) in enumerate(groups):
        while lvl > level:  # implicit down transition(s)
            level += 1
            skips[level - 1] = v
            v = v[graph.data[f"down_idx_{level}"]]
        while lvl < level:  # implicit up transition(s)
            v = knn_interpolate(v, graph.data[f"up_idx_{level}"],
                                graph.data[f"up_w_{level}"])
            v = jnp.concatenate([v, skips.pop(level - 1)], axis=-1)
            level -= 1
        v, e[level] = run_group(names, v, e[level], level,
                                e_dead=(last_group_of_level[lvl] == gi))
    out = apply_mlp(params["decoder"], v, compute_dtype=cd)
    return graph.field[:, -num_fields:] + out


class MuGSGNN(GNN):
    """Generic Guillard-coarsened multi-scale GNN (any gMuS arch dict)."""
    family = "mugs"

    def build_plan(self, arch: dict):
        return build_mugs_plan(arch)

    def apply(self, params, graph: Graph, t: Optional[int] = None):
        return mugs_apply(params, graph, self.plan, self.num_fields,
                          self.compute_dtype, self.scan_layers)


# ---- reference class-name aliases (mugs_gnn.py:11,135,297) ---------------
class NsTwoGuillardScaleGNN(MuGSGNN):
    PRETRAINED = {
        "2GS-GNN-NsCircle-v1": "NsMuGSGNN/NsTwoGuillardScaleGNN.chk",
        # framework-trained (tools/train_taylor_green.py --family gmus)
        "2GS-GNN-TaylorGreen-TPU-v1":
            "NsMuGSGNN/NsTwoGuillardScaleGNN_taylor_green_tpu.chk",
    }


class NsThreeGuillardScaleGNN(MuGSGNN):
    PRETRAINED = {
        "3GS-GNN-NsCircle-v1": "NsMuGSGNN/NsThreeGuillardScaleGNN.chk",
        # framework-trained (tools/train_taylor_green.py --family gmus
        # --scales 3)
        "3GS-GNN-TaylorGreen-TPU-v1":
            "NsMuGSGNN/NsThreeGuillardScaleGNN_taylor_green_tpu.chk",
    }


class NsFourGuillardScaleGNN(MuGSGNN):
    PRETRAINED = {"4GS-GNN-NsCircle-v1":
                  "NsMuGSGNN/NsFourGuillardScaleGNN.chk"}
