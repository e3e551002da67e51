"""Edge-partitioned graph parallelism — scale ONE giant mesh across chips.

The framework's analogue of sequence/context parallelism (SURVEY §5
"long-context"): the structural equivalent of sequence length is mesh size
(|V|, |E|).  Nodes at every level are partitioned into equal contiguous
blocks (after a spatial sort, so partitions are compact and boundary sets
small); each device owns one block per level plus the edges whose
*receiver* it owns (receiver-sorted layout ⇒ a device's edges are one
contiguous slab, exactly ``k·V_d`` rows on fixed-k levels).

Communication pattern (halo-only; no full-feature all_gathers):
  * MP layer: boundary sender (and, on variable-degree coarse levels,
    receiver) rows move via one ``all_to_all`` from precomputed per-pair
    send lists; gathers go through the local ``concat([own, recv])`` table.
  * DownMP / pool_edges: partial segment-sums into the full coarse array,
    one fused reduce-scatter over the axis (``psum_scatter`` on TPU ICI;
    psum + own-block slice on the CPU virtual mesh) — see ``_scatter_mean``.
  * UpMP: boundary coarse parent rows via the same halo ``all_to_all``.

Partitioned == unpartitioned is an exact invariant (halo exchange is pure
data movement) — asserted in tests on a virtual 8-device mesh.  Full
``all_gather`` fallbacks remain for graphs partitioned without halo
tables.
"""
from __future__ import annotations

import re
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import Graph
from ..ops.segment import segment_sum
from .dp import _graph_specs
from ..nn.mlp import apply_mlp
from ..nn.mus_gnn import _node_input

_selu = jax.nn.selu


# --------------------------------------------------------------------- host
def _sort_perm(pos: np.ndarray) -> np.ndarray:
    """Spatial sort (x-major) so contiguous blocks are compact."""
    return np.lexsort((pos[:, 1], pos[:, 0])).astype(np.int32)


def partition_graph(graph: Graph, num_parts: int,
                    halo_max_frac: float = 0.5) -> Tuple[Graph, dict]:
    """Partition a collated (single- or multi-level MuS) graph into
    ``num_parts`` blocks with a leading shard axis.

    Returns the sharded graph and an info dict with the level-1 node
    permutation (to un-permute results).  Node counts at every level are
    padded to a multiple of ``num_parts`` by the caller's collate buckets;
    this function additionally requires divisibility and asserts it.
    """
    g = graph.numpy()
    # drop the collate-attached windowed-gather plan: node/edge renumbering
    # below invalidates it, and the edge-partitioned MP path does not use it
    for key in [k for k in g.data if k.startswith("wg_")]:
        del g.data[key]
    levels = [1] + sorted(int(m.group(1)) for k in g.data
                          for m in [re.match(r"pos_(\d)$", k)] if m)
    perms = {}
    # ---- permute nodes at each level by spatial sort ----------------------
    for l in levels:
        suf = "" if l == 1 else f"_{l}"
        pos = g.data[f"pos{suf}"]
        n = pos.shape[0]
        assert n % num_parts == 0, \
            f"level-{l} node count {n} not divisible by {num_parts}"
        perm = _sort_perm(pos)
        perms[l] = perm
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n, dtype=np.int32)
        # node-space arrays permute rows; index arrays into this space remap
        for key in list(g.data):
            base = re.sub(r"_\d$", "", key)
            kl = int(key[-1]) if re.search(r"_\d$", key) else 1
            if base in ("pos", "node_mask") and kl == l:
                g.data[key] = g.data[key][perm]
            elif l == 1 and key in ("field", "target", "omega", "loc",
                                    "glob", "bound", "batch"):
                g.data[key] = g.data[key][perm]
            elif base in ("parent", "e_rel") and kl == l + 1:
                g.data[key] = g.data[key][perm]       # fine-node rows
            elif base in ("senders", "receivers") and kl == l:
                g.data[key] = inv[g.data[key]]        # values in this space
            elif base == "parent" and kl == l:
                g.data[key] = inv[g.data[key]]
        # re-sort edges of level l by (new) receiver to keep the canonical
        # receiver-sorted contiguous-slab property
        s_key, r_key = f"senders{suf}", f"receivers{suf}"
        order = np.argsort(g.data[r_key], kind="stable").astype(np.int32)
        eperm_inv = np.empty_like(order)
        eperm_inv[order] = np.arange(len(order), dtype=np.int32)
        for key in list(g.data):
            base = re.sub(r"_\d$", "", key)
            kl = int(key[-1]) if re.search(r"_\d$", key) else 1
            if base in ("senders", "receivers", "edge_attr", "edge_mask") \
                    and kl == l:
                g.data[key] = g.data[key][order]
            elif base == "edge_f2c" and kl == l + 1:
                g.data[key] = g.data[key][order]      # fine-edge rows
            elif base == "edge_f2c" and kl == l:
                v = g.data[key]
                g.data[key] = np.where(v >= 0, eperm_inv[v], -1)
    # ---- halo-exchange tables ----------------------------------------------
    # For each gather of partitioned node features, the remote rows each
    # device touches, grouped by owner, become per-pair send lists (padded
    # to the max pair size).  Device-side, one all_to_all moves exactly the
    # boundary rows instead of an all_gather of every node feature (the
    # ring/halo-exchange analogue of sequence parallelism — SURVEY §5
    # long-context).  Tables are built for (a) level-1 edge senders,
    # (b) coarse-level edge senders AND receivers (one shared table per
    # level — even edge slabs cross node blocks there), (c) UpMP parent
    # gathers of coarse features by fine rows.
    # A table is emitted only when it beats the all_gather it replaces:
    # the all_to_all moves ≤ D·pmax rows per device vs ~V_l for a full
    # gather.  ``halo_max_frac`` sets the required advantage (default:
    # halo traffic ≤ half the level's rows); tiny coarse levels whose
    # boundary is most of the block correctly fall back to all_gather.
    halos = {}  # info: table key -> pmax
    extra = {}

    def emit(table_key, idx_blocks, n_rows, lidx_keys):
        hs, lidxs, pmax = _halo_tables(idx_blocks, n_rows // num_parts,
                                       num_parts)
        if num_parts * pmax > halo_max_frac * n_rows:
            return
        halos[table_key] = pmax
        extra[table_key] = hs
        extra.update(zip(lidx_keys, lidxs))

    emit("halo_send", (g.data["senders"].reshape(num_parts, -1),),
         g.data["pos"].shape[0], ["edge_lidx"])
    for l in levels[1:]:
        nl = g.data[f"pos_{l}"].shape[0]
        emit(f"halo_send_{l}",
             (g.data[f"senders_{l}"].reshape(num_parts, -1),
              g.data[f"receivers_{l}"].reshape(num_parts, -1)),
             nl, [f"slidx_{l}", f"rlidx_{l}"])
        emit(f"halo_send_p{l}",
             (g.data[f"parent_{l}"].reshape(num_parts, -1),),
             nl, [f"plidx_{l}"])
    # ---- split into blocks with a leading shard axis ----------------------
    out = {}
    for key, v in g.data.items():
        if not isinstance(v, np.ndarray):
            out[key] = v
            continue
        out[key] = v.reshape((num_parts, v.shape[0] // num_parts)
                             + v.shape[1:])
    out.update(extra)                   # [D(shard), D, Pmax] / [D(shard), M]
    out["gp_num_parts"] = num_parts
    return Graph(data=out), {"perms": perms, "pmax": halos}


def _halo_tables(idx_blocks: Tuple[np.ndarray, ...], block: int,
                 num_parts: int):
    """Gather-halo tables for arbitrary global row indices.

    ``idx_blocks``: one or more ``[D, M_i]`` arrays of global row ids into
    a node space partitioned into contiguous blocks of ``block`` rows (all
    sharing one halo table).  Returns ``(halo_send [D, D, pmax]`` —
    owner-local rows owner ``o`` sends to ``d`` — ``, lidxs, pmax)`` where
    each ``lidx [D, M_i]`` maps the index to its position in device d's
    local table ``concat([own_block, recv])`` (recv rows owner-major)."""
    D = num_parts
    send_lists = [[[] for _ in range(D)] for _ in range(D)]
    for d in range(D):
        es = np.concatenate([b[d] for b in idx_blocks])
        remote = np.unique(es[(es < d * block) | (es >= (d + 1) * block)])
        for s in remote:
            send_lists[s // block][d].append(int(s))
    pmax = max(1, max(len(send_lists[o][d])
                      for o in range(D) for d in range(D)))
    halo_send = np.zeros((D, D, pmax), np.int32)
    for o in range(D):
        for d in range(D):
            rows = send_lists[o][d]
            halo_send[o, d, :len(rows)] = np.asarray(rows, np.int32) \
                - o * block  # owner-local row ids
    lidxs = [np.zeros_like(b, dtype=np.int32) for b in idx_blocks]
    for d in range(D):
        lut = {s: block + o * pmax + p
               for o in range(D) for p, s in enumerate(send_lists[o][d])}
        for b, lidx in zip(idx_blocks, lidxs):
            es = b[d]
            local = (es >= d * block) & (es < (d + 1) * block)
            lidx[d] = np.where(local, es - d * block,
                               np.asarray([lut.get(int(s), 0) for s in es],
                                          np.int32))
    return halo_send, lidxs, pmax


# ------------------------------------------------------------------- device
def _gather_nodes(v_local: jnp.ndarray, idx_global: jnp.ndarray,
                  axis: str) -> jnp.ndarray:
    v_full = jax.lax.all_gather(v_local, axis, tiled=True)
    return v_full[idx_global]


def _local_slice(full: jnp.ndarray, axis: str, block: int) -> jnp.ndarray:
    d = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(full, d * block, block, axis=0)


def _scatter_mean(x: jnp.ndarray, idx_global: jnp.ndarray, n_total: int,
                  mask, axis: str) -> jnp.ndarray:
    """Partial segment-mean into the full target array, reduced across the
    mesh axis; each device keeps only its own block.  num and cnt ride one
    collective as a fused trailing column.  On TPU the reduction is a
    ``psum_scatter`` (ring reduce-scatter over ICI — half the traffic of
    all-reduce + slice); the CPU backend emulates reduce-scatter poorly
    (measured 1.7× slower than psum on the virtual mesh), so the virtual
    test mesh keeps psum + slice."""
    num = segment_sum(x, idx_global, n_total, mask=mask)
    cnt = segment_sum(jnp.ones(x.shape[:1], x.dtype), idx_global, n_total,
                      mask=mask)
    fused = jnp.concatenate([num, cnt[:, None]], axis=-1)
    if jax.default_backend() == "tpu":
        fused = jax.lax.psum_scatter(fused, axis, scatter_dimension=0,
                                     tiled=True)
    else:
        fused = _local_slice(jax.lax.psum(fused, axis), axis,
                             n_total // jax.lax.axis_size(axis))
    return fused[:, :-1] / jnp.maximum(fused[:, -1:], 1)


def gp_mus_apply(params: dict, graph: Graph, plan, num_fields: int,
                 axis: str = "graph",
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """Edge-partitioned MuS-GNN forward (per-device body under shard_map).

    Mirrors ``nn.mus_gnn.mus_apply`` exactly; every cross-partition access
    goes through all_gather/psum so the result equals the single-device
    forward bit-for-bit (up to reduction order).
    """
    cd = compute_dtype
    D = graph.data["gp_num_parts"]
    v = _selu(apply_mlp(params["node_encoder"], _node_input(graph),
                        compute_dtype=cd))
    e = _selu(apply_mlp(params["edge_encoder"], graph.edge_attr,
                        compute_dtype=cd))
    level = 1
    skips = []
    fixed_k = graph.get("fixed_k")

    def suf(l):
        return "" if l == 1 else f"_{l}"

    def halo_table(x_local, key):
        """Exchange only boundary rows: per-pair send lists + one
        all_to_all; returns device d's gather table
        ``concat([own block, received halo rows])``."""
        halo_send = graph.data[key]                  # [D, Pmax]
        send_buf = x_local[halo_send.reshape(-1)]    # [D*Pmax, F]
        recv = jax.lax.all_to_all(send_buf, axis, 0, 0, tiled=True)
        return jnp.concatenate([x_local, recv], axis=0)

    def mp(name, v, e, l):
        s = suf(l)
        senders = graph.data[f"senders{s}"]      # global ids
        receivers_g = graph.data[f"receivers{s}"]
        n_local = v.shape[0]
        if l == 1 and fixed_k is not None and graph.has("halo_send"):
            # fixed-k slabs align with node blocks: receivers are local;
            # sender features cross partitions via halo exchange only
            recv_local = receivers_g - jax.lax.axis_index(axis) * n_local
            vs = halo_table(v, "halo_send")[graph.data["edge_lidx"]]
            e_in = jnp.concatenate([e, vs, v[recv_local]], axis=-1)
            e_new = apply_mlp(params[name]["edge_mlp"], e_in,
                              compute_dtype=cd)
            aggr = e_new.reshape(n_local, fixed_k, -1).mean(axis=1)
        elif l == 1 and fixed_k is not None:
            v_full = jax.lax.all_gather(v, axis, tiled=True)
            recv_local = receivers_g - jax.lax.axis_index(axis) * n_local
            e_in = jnp.concatenate([e, v_full[senders], v[recv_local]],
                                   axis=-1)
            e_new = apply_mlp(params[name]["edge_mlp"], e_in,
                              compute_dtype=cd)
            aggr = e_new.reshape(n_local, fixed_k, -1).mean(axis=1)
        else:
            # variable-degree levels: even edge slabs cross node-block
            # boundaries — halo-exchange boundary sender/receiver rows
            # (one shared table), then reduce-scatter partial means
            if graph.has(f"halo_send{s}"):
                tab = halo_table(v, f"halo_send{s}")
                vs = tab[graph.data[f"slidx{s}"]]
                vr = tab[graph.data[f"rlidx{s}"]]
            else:
                v_full = jax.lax.all_gather(v, axis, tiled=True)
                vs, vr = v_full[senders], v_full[receivers_g]
            e_in = jnp.concatenate([e, vs, vr], axis=-1)
            e_new = apply_mlp(params[name]["edge_mlp"], e_in,
                              compute_dtype=cd)
            mask = graph.data[f"edge_mask{s}"]
            aggr = _scatter_mean(e_new, receivers_g, n_local * D, mask, axis)
        v_new = apply_mlp(params[name]["node_mlp"],
                          jnp.concatenate([aggr, v], axis=-1),
                          compute_dtype=cd)
        return v_new, e_new

    for op in plan:
        if op[0] == "mp":
            v, e = mp(op[1], v, e, level)
            v, e = _selu(v), _selu(e)
        elif op[0] == "down":
            _, name, tgt = op
            skips.append((v, e))
            node_mask = (graph.node_mask if level == 1
                         else graph.data[f"node_mask_{level}"])
            parent_g = graph.data[f"parent_{tgt}"]           # global coarse
            nc_local = graph.data[f"node_mask_{tgt}"].shape[0]
            nc_total = nc_local * D
            x = apply_mlp(params[name],
                          jnp.concatenate([graph.data[f"e_rel_{tgt}"], v],
                                          axis=-1), compute_dtype=cd)
            v = jnp.tanh(_scatter_mean(x, parent_g, nc_total, node_mask,
                                       axis))
            # pool edges: partial means into the full coarse edge array
            f2c_g = graph.data[f"edge_f2c_{tgt}"]
            ec_local = graph.data[f"senders_{tgt}"].shape[0]
            e = _scatter_mean(e, f2c_g, ec_local * D, f2c_g >= 0, axis)
            level = tgt
        elif op[0] == "up":
            _, name, src = op
            v_skip, e_skip = skips.pop()
            if graph.has(f"halo_send_p{src}"):
                vp = halo_table(v, f"halo_send_p{src}")[
                    graph.data[f"plidx_{src}"]]
            else:
                parent_g = graph.data[f"parent_{src}"]
                vp = jax.lax.all_gather(v, axis, tiled=True)[parent_g]
            x = jnp.concatenate([-graph.data[f"e_rel_{src}"],
                                 vp, v_skip], axis=-1)
            v = jnp.tanh(apply_mlp(params[name], x, compute_dtype=cd))
            e = e_skip
            level = src - 1
    out = apply_mlp(params["decoder"], v, compute_dtype=cd)
    return graph.field[:, -num_fields:] + out


def _halo_lidx_keys(table_key: str):
    """The lidx arrays indexing through a halo table, and the node-space
    array whose per-device block size anchors their local/halo split."""
    if table_key == "halo_send":
        return ["edge_lidx"], "pos"
    m = re.match(r"^halo_send_p(\d)$", table_key)
    if m:
        return [f"plidx_{m.group(1)}"], f"pos_{m.group(1)}"
    m = re.match(r"^halo_send_(\d)$", table_key)
    return [f"slidx_{m.group(1)}", f"rlidx_{m.group(1)}"], f"pos_{m.group(1)}"


def partition_batches(batches, num_parts: int):
    """Partition several collated batches (DP groups) ``num_parts``-ways
    each and stack into ``[num_groups, num_parts, ...]`` arrays — the input
    of the combined data×graph 2-axis mesh.  Halo tables are padded to a
    common Pmax (per table) across groups."""
    parts = [partition_graph(b, num_parts) for b in batches]
    # keep only halo tables every group emitted (emission is per-group
    # traffic-dependent); drop the others' tables and lidx arrays
    table_keys = [k for k in parts[0][0].data
                  if k.startswith("halo_send")
                  and all(k in p.data for p, _ in parts)]
    for p, _ in parts:
        for k in [k for k in p.data if k.startswith("halo_send")
                  and k not in table_keys]:
            lidx_keys, _ = _halo_lidx_keys(k)
            for key in [k] + lidx_keys:
                p.data.pop(key, None)
    pmaxes = {k: max(info["pmax"][k] for _, info in parts)
              for k in table_keys}
    out = {}
    g0 = parts[0][0]
    for key in g0.data:
        vals = [p.data[key] for p, _ in parts]
        if not isinstance(vals[0], np.ndarray):
            assert all(v == vals[0] for v in vals)
            out[key] = vals[0]
            continue
        if key in pmaxes:
            vals = [np.pad(v, ((0, 0), (0, 0),
                               (0, pmaxes[key] - v.shape[-1])))
                    for v in vals]
        out[key] = np.stack(vals, axis=0)
    # lidx arrays reference halo slots at block + o*pmax_group + p; remap
    # each to its table's common pmax
    for gi, (p, info) in enumerate(parts):
        for tk in table_keys:
            old_pmax, new_pmax = info["pmax"][tk], pmaxes[tk]
            if old_pmax == new_pmax:
                continue
            lidx_keys, pos_key = _halo_lidx_keys(tk)
            block = p.data[pos_key].shape[1]
            for lk in lidx_keys:
                lidx = out[lk][gi]
                halo = lidx >= block
                o = (lidx - block) // old_pmax
                r = (lidx - block) % old_pmax
                out[lk][gi] = np.where(halo, block + o * new_pmax + r, lidx)
    return Graph(data=out), {"perms": [info["perms"] for _, info in parts],
                             "pmax": pmaxes}


def make_dp_gp_forward(model, mesh: Mesh):
    """Jitted forward over a 2-axis mesh: batch groups on ``data``,
    each group's graph edge-partitioned on ``graph`` (the full
    DP × graph-parallel composition)."""

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0, 0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        out = gp_mus_apply(params, graph, model.plan, model.num_fields,
                           axis="graph", compute_dtype=model.compute_dtype)
        return out[None, None]

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        specs = {k: P("data", "graph") for k in arrays}
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), specs), out_specs=P("data", "graph"),
                       check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)


def make_gp_train_step(model, criterion, mesh: Mesh, n_out: int = 1,
                       grad_clip_limit=None, axis: str = "graph"):
    """Jitted training step for ONE edge-partitioned giant mesh.

    The forward runs under shard_map (halo exchange per MP layer); the
    loss is a global masked mean (psum over the axis); parameters are
    replicated and their gradients reduce automatically through the
    shard_map transpose.  Per-rollout-step optimiser updates as in
    ``training.trainer.make_train_step``.
    """
    import optax
    from ..nn.model import grad_norm2
    opt = optax.scale_by_adam()
    num_fields = model.num_fields
    # distributed-criterion protocol (nn.losses.GraphLoss.distributed):
    # psum the per-term numerators/denominators over the graph axis so the
    # partitioned loss — including the λ_d Dirichlet L1 term every Ns
    # config uses — equals the single-device criterion exactly
    dist = getattr(criterion, "distributed", None)

    def per_device_loss(params, arrays, statics, t):
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        pred = gp_mus_apply(params, graph, model.plan, num_fields,
                            axis=axis, compute_dtype=model.compute_dtype)
        tgt = jax.lax.dynamic_slice_in_dim(graph.target, t * num_fields,
                                           num_fields, axis=1)
        if dist is not None:
            loss = dist(graph, pred, tgt, axis)
        else:
            mask = graph.node_mask
            sq = jnp.where(mask[:, None], (pred - tgt) ** 2, 0.0)
            total = jax.lax.psum(sq.sum(), axis)
            cnt = jax.lax.psum(mask.sum() * num_fields, axis)
            loss = total / jnp.maximum(cnt, 1)
        return loss, pred[None]

    def step(params, opt_state, graph: Graph, lr, clip_on):
        arrays, statics = graph.arrays(), graph.statics()

        def loss_t(params, field_shards, t):
            arr = dict(arrays)
            arr["field"] = field_shards
            fn = shard_map(
                partial(per_device_loss, statics=statics, t=t),
                mesh=mesh,
                in_specs=(P(), _graph_specs(arr, axis)),
                out_specs=(P(), P(axis)),
                check_vma=False)
            return fn(params, arr)

        def body(carry, t):
            params, opt_state, field = carry
            (loss, pred), grads = jax.value_and_grad(
                lambda p: loss_t(p, field, t), has_aux=True)(params)
            gnorm = grad_norm2(grads)
            if grad_clip_limit is not None:
                scale = jnp.where(clip_on & (gnorm > grad_clip_limit),
                                  grad_clip_limit / jnp.maximum(gnorm, 1e-12),
                                  1.0)
                grads = jax.tree_util.tree_map(lambda g_: g_ * scale, grads)
            updates, opt_state = opt.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            field = jnp.concatenate(
                [field[..., num_fields:], jax.lax.stop_gradient(pred)],
                axis=-1)
            return (params, opt_state, field), loss

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, arrays["field"]),
            jnp.arange(n_out, dtype=jnp.int32))
        return params, opt_state, losses.mean()

    return jax.jit(step)


def make_gp_forward(model, mesh: Mesh, axis: str = "graph"):
    """Jitted sharded forward over the mesh's ``graph`` axis."""

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        out = gp_mus_apply(params, graph, model.plan, model.num_fields,
                           axis=axis, compute_dtype=model.compute_dtype)
        return out[None]

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), _graph_specs(arrays, axis)),
                       out_specs=P(axis), check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)
