"""Edge-partitioned graph parallelism — scale ONE giant mesh across chips.

The framework's analogue of sequence/context parallelism (SURVEY §5
"long-context"): the structural equivalent of sequence length is mesh size
(|V|, |E|).  Nodes at every level are partitioned into equal contiguous
blocks (after a spatial sort, so partitions are compact and boundary sets
small); each device owns one block per level plus the edges whose
*receiver* it owns (receiver-sorted layout ⇒ a device's edges are one
contiguous slab, exactly ``k·V_d`` rows on fixed-k levels).

All three model families run partitioned — their cross-partition accesses
are pure gathers (plus two scatters in MuS pooling), each served by a
*gather site*:

  =========  ====================================  =====================
  family     cross-partition access                site (value space)
  =========  ====================================  =====================
  all        MP sender features                    ``halo_s{l}`` (node l)
  MuS        coarse senders+receivers (var-k)      ``halo_sr_{l}``
  MuS        UpMP parent gather                    ``halo_p_{l}``
  MuS        DownMP cluster mean / pool_edges      reduce-scatter (no tab)
  gMuS       down: ``v[down_idx]`` select          ``halo_d_{l}`` (node l-1)
  gMuS/REMuS up: ``knn_interpolate`` sources       ``halo_u_{l}`` (node l)
  REMuS      angle sources (folded edge table)     ``halo_s{l}`` (node l)
  REMuS      inter-level angle sources             ``halo_x_{l}`` (edge l-1)
  REMuS      per-level field/Re/ω at node_origin   ``halo_o`` (node 1)
  =========  ====================================  =====================

Communication pattern (halo-only; no full-feature all_gathers): each site
precomputes per-pair send lists; device-side, one ``all_to_all`` moves
exactly the boundary rows into the local gather table
``concat([own block, received rows])``.  A site's table is emitted only
when it beats the all_gather it replaces (``halo_max_frac``); tiny coarse
levels fall back to all_gather.  MuS pooling scatters go through one fused
reduce-scatter (``psum_scatter`` on TPU ICI) — see ``_scatter_mean``.

Partitioned == unpartitioned is an exact invariant (halo exchange is pure
data movement) — asserted for all three families on a virtual 8-device
mesh.  The per-device MP layers run through the same fused Pallas GN-block
kernels as the single-device path, including the in-kernel windowed MXU
gather over the halo-extended local table (the partitioner rebuilds the
per-device window plans), so going multi-chip keeps the per-chip fast path.

Reference counterparts of the partitioned accesses:
``/root/reference/graphs4cfd/nn/blocks.py:181,183,231`` (MP gathers +
scatter), ``mugs_gnn.py:240-269`` (mask-select down, knn-interp up),
``remus_gnn.py:119-199`` (angle gathers, inter-level angles, pinv solves).
"""
from __future__ import annotations

import re
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

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

#: keys whose single-device acceleration metadata is invalid after
#: renumbering (plans are rebuilt per device; sorted-gather tables dropped)
_DROP_RE = re.compile(r"^(wg_|wgf_|sender_perm|sender_sorted)")


# --------------------------------------------------------------------- host
def _suffix_level(key: str) -> int:
    m = re.search(r"_(\d)$", key)
    return int(m.group(1)) if m else 1


def _suf(l: int) -> str:
    return "" if l == 1 else f"_{l}"


def _gp_rules(key: str):
    """(row_space, value_space) of a graph key — the loader's collate-rule
    table extended with the arrays collate itself creates."""
    base = re.sub(r"_\d$", "", key)
    l = _suffix_level(key)
    if base == "node_mask":
        return ("node", l), None
    if base == "edge_mask":
        return ("edge", l), None
    if key == "batch":
        return ("node", 1), None
    from ..loader import _rules
    return _rules(key)


def _sort_perm(pos: np.ndarray) -> np.ndarray:
    """Morton (Z-order) sort: contiguous blocks are compact 2-D tiles
    (small halo sets) AND consecutive indices stay spatially local inside
    each block, which the per-device windowed-gather plans require —
    an x-major lexsort gives thin full-height strips whose within-block
    index spread blows the plan windows (measured 42% misses)."""
    from ..ops.order import morton_code
    return np.argsort(morton_code(pos), kind="stable").astype(np.int32)


def _gather_sites(data: dict, levels: Sequence[int]) -> List[Tuple]:
    """The gather sites present on this graph: (table_key, value_space,
    [idx keys indexing that space])."""

    def fixed_k_of(l):
        return data.get("fixed_k") if l == 1 else data.get(f"fixed_k_{l}")

    sites = []
    for l in levels:
        s = _suf(l)
        if f"senders{s}" in data:
            if fixed_k_of(l) is not None:
                # receiver slabs align with node blocks: sender-only halo
                sites.append((f"halo_s{s}", ("node", l), [f"senders{s}"]))
            else:
                # variable-degree (pooled MuS) levels: even edge slabs
                # cross node blocks — senders AND receivers share a table
                sites.append((f"halo_sr{s}", ("node", l),
                              [f"senders{s}", f"receivers{s}"]))
        if l > 1 and f"parent_{l}" in data:
            sites.append((f"halo_p_{l}", ("node", l), [f"parent_{l}"]))
        if l > 1 and f"down_idx_{l}" in data:
            sites.append((f"halo_d_{l}", ("node", l - 1),
                          [f"down_idx_{l}"]))
        if l > 1 and f"up_idx_{l}" in data:
            sites.append((f"halo_u_{l}", ("node", l), [f"up_idx_{l}"]))
        if l > 1 and f"xangle_src_{l}" in data:
            sites.append((f"halo_x_{l}", ("edge", l - 1),
                          [f"xangle_src_{l}"]))
    origins = [f"node_origin_{l}" for l in levels
               if f"node_origin_{l}" in data]
    if origins:
        # one shared table: every level's field/Re/ω rows ride ONE exchange
        sites.append(("halo_o", ("node", 1), origins))
    return sites


def _halo_tables(idx_blocks: Sequence[np.ndarray], block: int,
                 num_parts: int):
    """Gather-halo tables for arbitrary global row indices.

    ``idx_blocks``: one or more ``[D, ...]`` arrays of global row ids into
    a row space partitioned into contiguous blocks of ``block`` rows (all
    sharing one halo table).  Returns ``(halo_send [D, D, pmax]`` —
    owner-local rows owner ``o`` sends to ``d`` — ``, lidxs, pmax)`` where
    each ``lidx`` (same shape as its idx array) maps the index to its
    position in device d's local table ``concat([own_block, recv])``
    (recv rows owner-major)."""
    D = num_parts
    flat = [np.asarray(b).reshape(D, -1) for b in idx_blocks]
    send_lists = [[[] for _ in range(D)] for _ in range(D)]
    for d in range(D):
        es = np.concatenate([b[d] for b in flat])
        remote = np.unique(es[(es < d * block) | (es >= (d + 1) * block)])
        for s in remote:
            send_lists[s // block][d].append(int(s))
    pmax = max(1, max(len(send_lists[o][d])
                      for o in range(D) for d in range(D)))
    # bucket pmax so successive batches (fit partitions per batch) keep
    # stable table shapes — avoids re-jitting the train step every batch;
    # pad slots resend owner row 0 (gathers never address them)
    pmax = 16 * ((pmax + 15) // 16)
    halo_send = np.zeros((D, D, pmax), np.int32)
    for o in range(D):
        for d in range(D):
            rows = send_lists[o][d]
            halo_send[o, d, :len(rows)] = np.asarray(rows, np.int32) \
                - o * block  # owner-local row ids
    lidxs = [np.zeros_like(b, dtype=np.int32) for b in flat]
    for d in range(D):
        lut = {s: block + o * pmax + p
               for o in range(D) for p, s in enumerate(send_lists[o][d])}
        for b, lidx in zip(flat, lidxs):
            es = b[d]
            local = (es >= d * block) & (es < (d + 1) * block)
            lidx[d] = np.where(local, es - d * block,
                               np.asarray([lut.get(int(s), 0)
                                           for s in es.ravel()],
                                          np.int32).reshape(es.shape))
    lidxs = [l.reshape(np.asarray(b).shape)
             for l, b in zip(lidxs, idx_blocks)]
    return halo_send, lidxs, pmax


def _tab_rows(block: int, num_parts: int, pmax: int,
              align: int = 128) -> int:
    """Static row count of the device-local gather table: own block +
    halo region, zero-padded so the windowed-gather planner's alignment
    constraints (rows % 8, rows % stride) hold."""
    raw = block + num_parts * pmax
    return align * ((raw + align - 1) // align)


def _build_gp_window_plans(out: dict, num_parts: int, fixed_k: int,
                           pmax: int, pref: Optional[tuple]) -> None:
    """Per-device ROLLING windowed-gather plans over the halo-extended
    local table (level-1 senders) — the same (512, 128) rolling form as
    the single-device loader plans (same kernel VMEM footprint; the
    non-rolling variant's window RMW buffer blows v5e's 16 MB scoped
    limit at block 128, measured).  The rolling flush cannot cover the
    trailing halo region, so the kernel backward zeroes the uncovered
    dvs rows (``zero_tail``) — halo-row cotangents ride the exception
    path, which is exact."""
    import os
    from ..ops.window_plan import build_window_gather_plan
    pw, pb = pref if pref is not None else (512, 128)
    window = int(os.environ.get("GRAPHS4CFD_GP_GATHER_WINDOW", str(pw)))
    b = min(int(os.environ.get("GRAPHS4CFD_GP_GATHER_BLOCK", str(pb))), 128)
    lidx = out.get("senders_lidx")          # [D, E_loc]
    if lidx is None:
        return
    D = num_parts
    block = out["pos"].shape[1]
    while b > 1 and block % b:
        b //= 2
    block_rows = fixed_k * b
    T = _tab_rows(block, D, pmax)
    E_loc = lidx.shape[1]
    if T < window or E_loc % block_rows:
        return

    def build(d, exc_pad=None, blk_pad=None):
        kw = {}
        if exc_pad is not None:
            kw["min_exc_pad"] = exc_pad
        if blk_pad is not None:
            kw["min_blk_pad"] = blk_pad
        return build_window_gather_plan(
            lidx.reshape(D, -1)[d], T, block_rows=block_rows,
            window=window, stride=b, **kw)

    plans = [build(d) for d in range(D)]
    if any(p is None for p in plans):
        return
    exc_pad = max(p.exc_pos.shape[0] for p in plans)
    blk_pad = max(p.exc_lpos.shape[1] for p in plans)
    plans = [build(d, exc_pad, blk_pad) for d in range(D)]
    out["wg_starts"] = np.stack([p.starts for p in plans])
    out["wg_lidx"] = np.stack([p.lidx for p in plans])
    out["wg_exc_pos"] = np.stack([p.exc_pos for p in plans])
    out["wg_exc_idx"] = np.stack([p.exc_idx for p in plans])
    out["wg_exc_lpos"] = np.stack([p.exc_lpos for p in plans])
    out["wg_exc_nidx"] = np.stack([p.exc_nidx for p in plans])
    out["wg_window"] = plans[0].window            # static
    out["wg_block_rows"] = plans[0].block_rows    # static
    out["wg_stride"] = plans[0].stride            # static


def partition_graph(graph: Graph, num_parts: int,
                    halo_max_frac: float = 0.5) -> Tuple[Graph, dict]:
    """Partition a collated graph (any family) into ``num_parts`` blocks
    with a leading shard axis.

    Every array's rows are split according to its row space (node/edge ×
    level, from the collate-rule table); index-valued arrays are remapped
    through the per-level spatial-sort permutations.  Gather sites get
    halo tables + local-table index arrays (``<key>_lidx``); the level-1
    sender gather additionally gets per-device windowed-MXU plans.

    Returns the sharded graph and an info dict with the per-level node
    permutations (to un-permute results) and per-table pmax.
    """
    g = graph.numpy()
    data = {k: v for k, v in g.data.items() if not _DROP_RE.match(k)}
    statics = {k: v for k, v in data.items()
               if not isinstance(v, np.ndarray)}
    levels = [1] + sorted(int(m.group(1)) for k in data
                          for m in [re.match(r"pos_(\d)$", k)] if m)
    rules = {k: _gp_rules(k) for k in data if isinstance(data[k], np.ndarray)}

    rows_of = {}
    for l in levels:
        rows_of[("node", l)] = data[f"pos{_suf(l)}"].shape[0]
        s_key = f"senders{_suf(l)}"
        if s_key in data:
            rows_of[("edge", l)] = data[s_key].shape[0]
    for space, n in rows_of.items():
        assert n % num_parts == 0, \
            f"{space} row count {n} not divisible by {num_parts} " \
            "(choose node/edge buckets divisible by the graph axis)"

    # ---- node permutations (spatial sort per level) ------------------------
    perms, invs = {}, {}
    for l in levels:
        perm = _sort_perm(data[f"pos{_suf(l)}"])
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm), dtype=np.int32)
        perms[l], invs[l] = perm, inv

    # pass A: permute node-space rows; remap node-space values
    for key, (row_space, val_space) in rules.items():
        if row_space[0] == "node":
            data[key] = data[key][perms[row_space[1]]]
        if val_space is not None and val_space[0] == "node":
            data[key] = invs[val_space[1]][data[key]]

    # pass B: re-sort each level's edges by (new) receiver — keeps the
    # canonical receiver-sorted slab property (and, for fixed-k levels,
    # the exact ``receivers == repeat(arange(V), k)`` /
    # ``angle_src == senders*k + arange(k)`` invariants: stable sort moves
    # each receiver's contiguous k-block as a unit)
    eperm_inv = {}
    for l in levels:
        r_key = f"receivers{_suf(l)}"
        if r_key not in data:
            continue
        order = np.argsort(data[r_key], kind="stable").astype(np.int32)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order), dtype=np.int32)
        eperm_inv[l] = (order, inv)

    # pass C: permute edge-space rows; remap edge-space values
    for key, (row_space, val_space) in rules.items():
        if row_space[0] == "edge" and row_space[1] in eperm_inv:
            data[key] = data[key][eperm_inv[row_space[1]][0]]
        if val_space is not None and val_space[0] == "edge" \
                and val_space[1] in eperm_inv:
            v = data[key]
            inv = eperm_inv[val_space[1]][1]
            if key.startswith("edge_f2c"):
                data[key] = np.where(v >= 0, inv[np.maximum(v, 0)], -1)
            else:
                data[key] = inv[v]

    # ---- halo tables per gather site ---------------------------------------
    info_tables: Dict[str, dict] = {}
    extra = {}
    for table_key, (space, l), idx_keys in _gather_sites(data, levels):
        n_rows = rows_of[(space, l)]
        block = n_rows // num_parts
        hs, lidxs, pmax = _halo_tables([data[k] for k in idx_keys],
                                       block, num_parts)
        # emit only when the all_to_all beats the all_gather it replaces
        if num_parts * pmax > halo_max_frac * n_rows:
            continue
        extra[table_key] = hs
        lidx_keys = [f"{k}_lidx" for k in idx_keys]
        extra.update(zip(lidx_keys, lidxs))
        info_tables[table_key] = {"pmax": pmax, "lidx_keys": lidx_keys,
                                  "space": (space, l)}

    # ---- split into blocks with a leading shard axis ----------------------
    out = dict(statics)
    for key, v in data.items():
        if not isinstance(v, np.ndarray):
            continue
        out[key] = v.reshape((num_parts, v.shape[0] // num_parts)
                             + v.shape[1:])
    for key, v in extra.items():
        # halo tables are already [D(shard), D, pmax]; lidx arrays are in
        # their idx key's row space and get the same leading shard axis
        if key.endswith("_lidx"):
            v = v.reshape((num_parts, v.shape[0] // num_parts) + v.shape[1:])
        out[key] = v
    out["gp_num_parts"] = num_parts

    # ---- per-device windowed-gather plans (level-1 senders) ---------------
    if statics.get("fixed_k") is not None and "halo_s" in info_tables:
        _build_gp_window_plans(out, num_parts, statics["fixed_k"],
                               info_tables["halo_s"]["pmax"],
                               statics.get("wg_pref"))
    return Graph(data=out), {"perms": perms, "tables": info_tables,
                             "pmax": {k: v["pmax"]
                                      for k, v in info_tables.items()}}


def partition_batches(batches, num_parts: int):
    """Partition several collated batches (DP groups) ``num_parts``-ways
    each and stack into ``[num_groups, num_parts, ...]`` arrays — the input
    of the combined data×graph 2-axis mesh.  Halo tables are padded to a
    common pmax (per table) across groups; window plans are dropped (their
    local tables would differ per group)."""
    parts = [partition_graph(b, num_parts) for b in batches]
    # gather plans are per-group local-table layouts; drop under stacking
    for p, _ in parts:
        for k in [k for k in p.data if k.startswith("wg_")]:
            del p.data[k]
    # keep only halo tables every group emitted
    table_keys = [k for k in parts[0][1]["tables"]
                  if all(k in info["tables"] for _, info in parts)]
    for p, info in parts:
        for k in list(info["tables"]):
            if k not in table_keys:
                for key in [k] + info["tables"][k]["lidx_keys"]:
                    p.data.pop(key, None)
    pmaxes = {k: max(info["tables"][k]["pmax"] for _, info in parts)
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
            old_pmax, new_pmax = info["tables"][tk]["pmax"], pmaxes[tk]
            if old_pmax == new_pmax:
                continue
            space = info["tables"][tk]["space"]
            pos_key = (f"pos{_suf(space[1])}" if space[0] == "node"
                       else f"senders{_suf(space[1])}")
            block = p.data[pos_key].shape[1]
            for lk in info["tables"][tk]["lidx_keys"]:
                lidx = out[lk][gi]
                halo = lidx >= block
                o = (lidx - block) // old_pmax
                r = (lidx - block) % old_pmax
                out[lk][gi] = np.where(halo, block + o * new_pmax + r, lidx)
    return Graph(data=out), {"perms": [info["perms"] for _, info in parts],
                             "pmax": pmaxes}


# ------------------------------------------------------------------- device
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


class _GpCtx:
    """Per-device gather-site accessor under ``shard_map``.

    ``exchange(table)`` → fn(x_local) -> local gather table (halo
    ``all_to_all`` of exactly the boundary rows, or all_gather fallback
    when the partitioner skipped the table);
    ``index(table, key)`` → the matching index array (local-table lidx or
    the original global ids).
    ``halo(table, key)`` → the (exchange_fn, lidx) pair ``nn.blocks``
    consumes as ``sender_halo``.
    """

    def __init__(self, graph: Graph, axis: str):
        self.g = graph
        self.axis = axis
        self.D = graph.data["gp_num_parts"]

    def exchange(self, table_key: str, pad_to: int = 0):
        g, axis = self.g, self.axis
        if g.has(table_key):
            halo_send = g.data[table_key]            # [D, pmax]

            def ex(x):
                send = x[halo_send.reshape(-1)]      # [D*pmax, F]
                recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=True)
                tab = jnp.concatenate([x, recv], axis=0)
                if pad_to > tab.shape[0]:
                    tab = jnp.concatenate(
                        [tab, jnp.zeros((pad_to - tab.shape[0],)
                                        + tab.shape[1:], tab.dtype)], axis=0)
                return tab

            return ex
        return lambda x: jax.lax.all_gather(x, axis, tiled=True)

    def index(self, table_key: str, idx_key: str):
        if self.g.has(table_key):
            return self.g.data[f"{idx_key}_lidx"]
        return self.g.data[idx_key]

    def halo(self, table_key: str, idx_key: str, pad_to: int = 0):
        """(exchange_fn, idx, table_mode) — table_mode=True means idx are
        local-table positions (halo table emitted); False means idx are
        global rows into the all_gather fallback."""
        return (self.exchange(table_key, pad_to),
                self.index(table_key, idx_key),
                self.g.has(table_key))

    def plan_pad(self) -> int:
        """Static local-table row count the level-1 window plans were
        built for (0 when no plans were attached)."""
        g = self.g
        if not g.has("wg_starts") or not g.has("halo_s"):
            return 0
        block = g.data["pos"].shape[0]
        pmax = g.data["halo_s"].shape[-1]
        return _tab_rows(block, self.D, pmax)


# ------------------------------------------------------------ family bodies
def gp_mus_apply(params: dict, graph: Graph, plan, num_fields: int,
                 axis: str = "graph",
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """Edge-partitioned MuS-GNN forward (per-device body under shard_map).

    Mirrors ``nn.mus_gnn.mus_apply`` exactly; level-1 MP runs through
    ``nn.blocks.gn_block`` (fused Pallas kernels + windowed gather over
    the halo table), pooled levels through halo gathers + reduce-scatter.
    """
    cd = compute_dtype
    ctx = _GpCtx(graph, axis)
    D = ctx.D
    from ..nn.blocks import gn_block, window_plan_of
    v = _selu(apply_mlp(params["node_encoder"], _node_input(graph),
                        compute_dtype=cd))
    e = _selu(apply_mlp(params["edge_encoder"], graph.edge_attr,
                        compute_dtype=cd))
    level = 1
    skips = []
    fixed_k = graph.get("fixed_k")
    wplan = window_plan_of(graph)

    def mp(name, v, e, l, e_dead=False):
        s = _suf(l)
        n_local = v.shape[0]
        if l == 1 and fixed_k is not None:
            # e_dead (next op is an up/decoder): forward skip_e_out so the
            # sharded step keeps the single-chip dead-output elision — the
            # sender-halo fused-wg kernel composes it with zero_tail
            # (VERDICT r4 #4 / ADVICE r3 #3); gn_block returns e' = None
            return gn_block(params[name], v, e, None, None,
                            fixed_k=fixed_k, compute_dtype=cd,
                            out_activation="selu", window_plan=wplan,
                            skip_e_out=e_dead,
                            sender_halo=ctx.halo("halo_s", "senders",
                                                 pad_to=ctx.plan_pad()))
        # variable-degree levels: even edge slabs cross node-block
        # boundaries — halo-exchange boundary sender/receiver rows
        # (one shared table), then reduce-scatter partial means
        receivers_g = graph.data[f"receivers{s}"]
        tab = ctx.exchange(f"halo_sr{s}")(v)
        vs = tab[ctx.index(f"halo_sr{s}", f"senders{s}")]
        vr = tab[ctx.index(f"halo_sr{s}", f"receivers{s}")]
        e_in = jnp.concatenate([e, vs, vr], axis=-1)
        e_new = apply_mlp(params[name]["edge_mlp"], e_in, compute_dtype=cd)
        mask = graph.data[f"edge_mask{s}"]
        aggr = _scatter_mean(e_new, receivers_g, n_local * D, mask, axis)
        v_new = apply_mlp(params[name]["node_mlp"],
                          jnp.concatenate([aggr, v], axis=-1),
                          compute_dtype=cd)
        return _selu(v_new), _selu(e_new)

    for i, op in enumerate(plan):
        if op[0] == "mp":
            nxt = plan[i + 1][0] if i + 1 < len(plan) else None
            v, e = mp(op[1], v, e, level, e_dead=nxt in ("up", None))
        elif op[0] == "down":
            _, name, tgt = op
            skips.append((v, e))
            node_mask = (graph.node_mask if level == 1
                         else graph.data[f"node_mask_{level}"])
            parent_g = graph.data[f"parent_{tgt}"]           # global coarse
            nc_local = graph.data[f"node_mask_{tgt}"].shape[0]
            x = apply_mlp(params[name],
                          jnp.concatenate([graph.data[f"e_rel_{tgt}"], v],
                                          axis=-1), compute_dtype=cd)
            v = jnp.tanh(_scatter_mean(x, parent_g, nc_local * D,
                                       node_mask, axis))
            # pool edges: partial means into the full coarse edge array
            f2c_g = graph.data[f"edge_f2c_{tgt}"]
            ec_local = graph.data[f"senders_{tgt}"].shape[0]
            e = _scatter_mean(e, f2c_g, ec_local * D, f2c_g >= 0, axis)
            level = tgt
        elif op[0] == "up":
            _, name, src = op
            v_skip, e_skip = skips.pop()
            vp = ctx.exchange(f"halo_p_{src}")(v)[
                ctx.index(f"halo_p_{src}", f"parent_{src}")]
            x = jnp.concatenate([-graph.data[f"e_rel_{src}"],
                                 vp, v_skip], axis=-1)
            v = jnp.tanh(apply_mlp(params[name], x, compute_dtype=cd))
            e = e_skip
            level = src - 1
    out = apply_mlp(params["decoder"], v, compute_dtype=cd)
    return graph.field[:, -num_fields:] + out


def gp_mugs_apply(params: dict, graph: Graph, plan, num_fields: int,
                  axis: str = "graph",
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """Edge-partitioned gMuS-GNN forward.

    Mirrors ``nn.mugs_gnn.mugs_apply``: all levels are fixed-k, so every
    MP layer is a sender-halo ``gn_block``; the down transition is a
    partitioned select (``v[down_idx]`` via ``halo_d``,
    ``/root/reference/graphs4cfd/nn/mugs_gnn.py:240-243``), the up
    transition a partitioned ``knn_interpolate`` (``halo_u``,
    ``mugs_gnn.py:266-269``) + local skip concat.
    """
    cd = compute_dtype
    ctx = _GpCtx(graph, axis)
    from ..nn.blocks import gn_block, window_plan_of
    from ..ops.interp import knn_interpolate
    v = _selu(apply_mlp(params["node_encoder"], _node_input(graph),
                        compute_dtype=cd))
    num_levels = graph.num_levels
    e = {1: _selu(apply_mlp(params["edge_encoder"], graph.edge_attr,
                            compute_dtype=cd))}
    for l in range(2, num_levels + 1):
        e[l] = _selu(apply_mlp(params[f"edge_encoder{l}"],
                               graph.data[f"edge_attr_{l}"],
                               compute_dtype=cd))
    level = 1
    skips = {}
    wplan = window_plan_of(graph)

    # group consecutive same-level layers (plan: ("mp", name, level))
    groups = []
    for _, name, lvl in plan:
        if groups and groups[-1][0] == lvl:
            groups[-1][1].append(name)
        else:
            groups.append((lvl, [name]))
    last_group_of_level = {lvl: i for i, (lvl, _) in enumerate(groups)}
    for gi, (lvl, names) in enumerate(groups):
        while lvl > level:  # implicit down transition(s): partitioned select
            level += 1
            skips[level - 1] = v
            tab = ctx.exchange(f"halo_d_{level}")(v)
            v = tab[ctx.index(f"halo_d_{level}", f"down_idx_{level}")]
        while lvl < level:  # implicit up transition(s): partitioned interp
            tab = ctx.exchange(f"halo_u_{level}")(v)
            v = knn_interpolate(tab,
                                ctx.index(f"halo_u_{level}",
                                          f"up_idx_{level}"),
                                graph.data[f"up_w_{level}"])
            v = jnp.concatenate([v, skips.pop(level - 1)], axis=-1)
            level -= 1
        s = _suf(level)
        fixed_k = (graph.get("fixed_k") if level == 1
                   else graph.get(f"fixed_k_{level}"))
        halo = ctx.halo(f"halo_s{s}", f"senders{s}",
                        pad_to=ctx.plan_pad() if level == 1 else 0)
        # the level's final visit: its last layer's e' has no consumer —
        # forward skip_e_out so the sharded step keeps the single-chip
        # elision (mirrors nn.mugs_gnn run_group's e_dead/tail peel)
        e_dead = last_group_of_level[lvl] == gi
        for li, name in enumerate(names):
            skip = e_dead and li == len(names) - 1 \
                and fixed_k is not None
            v, e[level] = gn_block(
                params[name], v, e[level], None, None, fixed_k=fixed_k,
                compute_dtype=cd, out_activation="selu",
                window_plan=(wplan if level == 1 else None),
                sender_halo=halo, skip_e_out=skip)
    out = apply_mlp(params["decoder"], v, compute_dtype=cd)
    return graph.field[:, -num_fields:] + out


def gp_remus_apply(params: dict, graph: Graph, plan, num_fields: int = 2,
                   axis: str = "graph",
                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """Edge-partitioned REMuS-GNN forward.

    Mirrors ``nn.mus_gnn.remus_apply``: pinverse solves and projections
    are node-local (receiver slabs align with node blocks); the three
    cross-partition accesses are the per-level ``node_origin`` input
    gathers (``halo_o``, one exchange of [field|Re|ω] rows serves every
    level — ``remus_gnn.py:124-130``), the angle-source gathers (the
    folded ``[V, k·H]`` edge table rides the ``halo_s{l}`` node tables —
    ``blocks.py:322-333``), inter-level angle sources (``halo_x``,
    ``blocks.py:360-381``) and the up-path interpolation (``halo_u``,
    ``blocks.py:408-456``).
    """
    cd = compute_dtype
    ctx = _GpCtx(graph, axis)
    from ..nn.blocks import (edge_mp, down_edge_mp, up_edge_mp,
                             edge_scalar_to_node_vector)
    num_levels = graph.num_levels
    field = graph.field
    # one exchange of the level-1 node bundle serves every level's origin
    # gather (the coarse levels' rows are a subset of level-1 rows)
    bundle = jnp.concatenate([field, graph.glob, graph.omega], axis=-1)
    tab_o = (ctx.exchange("halo_o")(bundle) if num_levels > 1 else None)
    nf_in = field.shape[1]
    e, a, xa = {}, {}, {}
    for l in range(1, num_levels + 1):
        s = _suf(l)
        recv = graph.data[f"receivers{s}"]
        unit = graph.data[f"unit_vec{s}"]
        if l == 1:
            f_l, glob_l, omega_l = field, graph.glob, graph.omega
        else:
            row = tab_o[ctx.index("halo_o", f"node_origin_{l}")]
            f_l = row[:, :nf_in]
            glob_l = row[:, nf_in:nf_in + graph.glob.shape[1]]
            omega_l = row[:, nf_in + graph.glob.shape[1]:]
        E_l, V_l = recv.shape[0], f_l.shape[0]
        k_l = E_l // V_l

        def rep(x):
            return jnp.broadcast_to(x[:, None], (V_l, k_l) + x.shape[1:]
                                    ).reshape((E_l,) + x.shape[1:])

        w = rep(f_l).reshape(E_l, -1, 2)
        proj = (w * unit[:, None, :]).sum(axis=-1)
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

    # a[l] is consumed only by this level's edge_mp layers: the last mp op
    # of each level may skip its a' store (mirrors nn.remus_gnn's
    # last_visit peel; the dead slot becomes None — loud contract)
    last_mp_of_level = {op[2]: i for i, op in enumerate(plan)
                        if op[0] == "mp"}
    for i, op in enumerate(plan):
        if op[0] == "mp":
            _, name, l = op
            s = _suf(l)
            # the folded [V_loc, k·H] edge table rides the node halo
            halo = ctx.halo(f"halo_s{s}", f"senders{s}")
            e[l], a[l] = edge_mp(params[name], e[l], a[l],
                                 graph.data[f"angle_src{s}"],
                                 compute_dtype=cd, out_activation="selu",
                                 sender_halo=halo,
                                 skip_a_out=last_mp_of_level[l] == i)
        elif op[0] == "down":
            _, name, tgt = op
            e[tgt] = down_edge_mp(
                params[name], e[tgt - 1], e[tgt], xa[tgt],
                graph.data[f"xangle_src_{tgt}"], compute_dtype=cd,
                out_activation="selu",
                sender_halo=ctx.halo(f"halo_x_{tgt}", f"xangle_src_{tgt}"))
        elif op[0] == "up":
            _, name, src = op
            tgt = src - 1
            st, ss = _suf(tgt), _suf(src)
            e[tgt] = up_edge_mp(
                params[name], e[src], graph.data[f"unit_pinv{ss}"],
                ctx.index(f"halo_u_{src}", f"up_idx_{src}"),
                graph.data[f"up_w_{src}"],
                graph.data[f"receivers{st}"], graph.data[f"unit_vec{st}"],
                e[tgt], compute_dtype=cd,
                interp_exchange=ctx.exchange(f"halo_u_{src}"))
            e[tgt] = _selu(e[tgt])
    dec = apply_mlp(params["decoder"], e[1], compute_dtype=cd)
    out = edge_scalar_to_node_vector(dec, graph.unit_pinv)
    out = out.reshape(out.shape[0], -1)
    return field[:, -num_fields:] + out


def gp_apply_fn(model):
    """The family-matched per-device graph-parallel forward."""
    fam = getattr(model, "family", "mus")
    body = {"mus": gp_mus_apply, "mugs": gp_mugs_apply,
            "remus": gp_remus_apply}[fam]

    def apply(params, graph: Graph, axis: str = "graph"):
        return body(params, graph, model.plan, model.num_fields,
                    axis=axis, compute_dtype=model.compute_dtype)

    return apply


# ----------------------------------------------------------------- wrappers
def make_dp_gp_forward(model, mesh: Mesh):
    """Jitted forward over a 2-axis mesh: batch groups on ``data``,
    each group's graph edge-partitioned on ``graph`` (the full
    DP × graph-parallel composition)."""
    body = gp_apply_fn(model)

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0, 0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        return body(params, graph, axis="graph")[None, None]

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        specs = {k: P("data", "graph") for k in arrays}
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), specs), out_specs=P("data", "graph"),
                       check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)


def make_gp_forward(model, mesh: Mesh, axis: str = "graph"):
    """Jitted sharded forward over the mesh's ``graph`` axis."""
    body = gp_apply_fn(model)

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        return body(params, graph, axis=axis)[None]

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), _graph_specs(arrays, axis)),
                       out_specs=P(axis), check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)


def make_gp_train_step(model, criterion, mesh: Mesh, n_out: int = 1,
                       grad_clip_limit=None, axis: str = "graph"):
    """Jitted training step for ONE edge-partitioned giant mesh.

    The forward runs under shard_map (halo exchange per MP layer); the
    loss is the exact global criterion (``GraphLoss.distributed`` — psum
    of per-term numerators/denominators, incl. the λ_d Dirichlet term);
    parameters are replicated and their gradients reduce automatically
    through the shard_map transpose.  Per-rollout-step optimiser updates
    as in ``training.trainer.make_train_step``.
    """
    import optax
    from ..nn.model import grad_norm2
    opt = optax.scale_by_adam()
    num_fields = model.num_fields
    body = gp_apply_fn(model)
    dist = getattr(criterion, "distributed", None)

    def per_device_loss(params, arrays, statics, t):
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        pred = body(params, graph, axis=axis)
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

        def body_t(carry, t):
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
            return (params, opt_state, field), (loss, gnorm)

        (params, opt_state, _), (losses, gnorms) = jax.lax.scan(
            body_t, (params, opt_state, arrays["field"]),
            jnp.arange(n_out, dtype=jnp.int32))
        return params, opt_state, losses.mean(), gnorms.mean()

    return jax.jit(step)


def make_dp_gp_train_step(model, criterion, mesh: Mesh, n_out: int = 1,
                          grad_clip_limit=None,
                          axes: Tuple[str, str] = ("data", "graph")):
    """Jitted training step over the full 2-axis composition: batch groups
    on ``data`` (DP over DCN/ICI), each group's graph edge-partitioned on
    ``graph`` (halo exchange over ICI) — the real-pod topology
    ``make_hybrid_mesh`` exists for (SURVEY §2.3: DP and graph-partition
    jointly first-class).

    Input graphs come from ``partition_batches`` (arrays
    ``[num_groups, num_parts, ...]``).  The loss is the exact global
    criterion — one fused psum of the per-term numerators/denominators
    over BOTH axes (``GraphLoss.distributed(axes)``) — so composed ==
    single-device bit-for-bit up to reduction order; parameter gradients
    reduce over both axes automatically through the shard_map transpose.
    Per-rollout-step optimiser updates as everywhere else
    (``/root/reference/graphs4cfd/nn/model.py:226-254``).
    """
    import optax
    from ..nn.model import grad_norm2
    opt = optax.scale_by_adam()
    num_fields = model.num_fields
    body = gp_apply_fn(model)
    dist = getattr(criterion, "distributed", None)
    da, ga = axes

    def per_device_loss(params, arrays, statics, t):
        arrays = {k: v[0, 0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        pred = body(params, graph, axis=ga)
        tgt = jax.lax.dynamic_slice_in_dim(graph.target, t * num_fields,
                                           num_fields, axis=1)
        if dist is not None:
            loss = dist(graph, pred, tgt, axes)
        else:
            mask = graph.node_mask
            sq = jnp.where(mask[:, None], (pred - tgt) ** 2, 0.0)
            total = jax.lax.psum(sq.sum(), axes)
            cnt = jax.lax.psum(mask.sum() * num_fields, axes)
            loss = total / jnp.maximum(cnt, 1)
        return loss, pred[None, None]

    def step(params, opt_state, graph: Graph, lr, clip_on):
        arrays, statics = graph.arrays(), graph.statics()

        def loss_t(params, field_shards, t):
            arr = dict(arrays)
            arr["field"] = field_shards
            fn = shard_map(
                partial(per_device_loss, statics=statics, t=t),
                mesh=mesh,
                in_specs=(P(), {k: P(da, ga) for k in arr}),
                out_specs=(P(), P(da, ga)),
                check_vma=False)
            return fn(params, arr)

        def body_t(carry, t):
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
            return (params, opt_state, field), (loss, gnorm)

        (params, opt_state, _), (losses, gnorms) = jax.lax.scan(
            body_t, (params, opt_state, arrays["field"]),
            jnp.arange(n_out, dtype=jnp.int32))
        return params, opt_state, losses.mean(), gnorms.mean()

    return jax.jit(step)


def make_dp_gp_val_step(model, criterion, mesh: Mesh, max_n_out: int,
                        axes: Tuple[str, str] = ("data", "graph")):
    """Validation rollout over the 2-axis composition: ``max_n_out`` steps
    feeding predictions back un-detached (``model.py:260-273``), exact
    global loss per step psum'd over both axes."""
    body = gp_apply_fn(model)
    num_fields = model.num_fields
    dist = getattr(criterion, "distributed", None)
    da, ga = axes

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0, 0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        target = graph.target

        def scan_body(field, t):
            g = graph.replace(field=field)
            pred = body(params, g, axis=ga)
            tgt = jax.lax.dynamic_slice_in_dim(
                target, t * num_fields, num_fields, axis=1)
            if dist is not None:
                loss = dist(g, pred, tgt, axes)
            else:
                mask = g.node_mask
                sq = jnp.where(mask[:, None], (pred - tgt) ** 2, 0.0)
                loss = jax.lax.psum(sq.sum(), axes) / jnp.maximum(
                    jax.lax.psum(mask.sum() * num_fields, axes), 1)
            field = jnp.concatenate([field[:, num_fields:], pred], axis=1)
            return field, loss

        _, losses = jax.lax.scan(scan_body, graph.field,
                                 jnp.arange(max_n_out, dtype=jnp.int32))
        return losses.mean()

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), {k: P(da, ga) for k in arrays}),
                       out_specs=P(), check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)


def regroup_sharded(graph: Graph, num_groups: int) -> List[Graph]:
    """Split a ``collate_sharded`` batch (leading shard axis) back into its
    per-group collated Graphs — the input ``partition_batches`` wants when
    composing DP×GP from one loader batch."""
    arrays, statics = graph.arrays(), graph.statics()
    return [Graph(data={**{k: v[g] for k, v in arrays.items()}, **statics})
            for g in range(num_groups)]


def make_gp_rollout(model, mesh: Mesh, n_out: int, axis: str = "graph"):
    """Partitioned autoregressive rollout (the GP counterpart of
    ``training.rollout.solve`` / ``parallel.make_dp_rollout``): each device
    rolls its node block forward ``n_out`` steps with halo exchange per MP
    layer; returns ``[D, V_local, num_fields*n_out]`` (un-permute level-1
    rows with the partition info's ``perms[1]``)."""
    body = gp_apply_fn(model)
    num_fields = model.num_fields

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})

        def scan_body(field, _):
            g = graph.replace(field=field)
            pred = body(params, g, axis=axis)
            return jnp.concatenate([field[:, num_fields:], pred],
                                   axis=1), pred

        _, preds = jax.lax.scan(scan_body, graph.field, None, length=n_out)
        out = jnp.transpose(preds, (1, 0, 2)).reshape(preds.shape[1], -1)
        return out[None]

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), _graph_specs(arrays, axis)),
                       out_specs=P(axis), check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)


def make_gp_val_step(model, criterion, mesh: Mesh, max_n_out: int,
                     axis: str = "graph"):
    """Partitioned validation rollout: ``max_n_out`` steps feeding
    predictions back un-detached (reference ``model.py:260-273``), loss =
    exact global criterion per step."""
    body = gp_apply_fn(model)
    num_fields = model.num_fields
    dist = getattr(criterion, "distributed", None)

    def per_device(params, arrays: dict, *, statics: dict):
        arrays = {k: v[0] for k, v in arrays.items()}
        graph = Graph(data={**arrays, **statics})
        target = graph.target

        def scan_body(field, t):
            g = graph.replace(field=field)
            pred = body(params, g, axis=axis)
            tgt = jax.lax.dynamic_slice_in_dim(
                target, t * num_fields, num_fields, axis=1)
            if dist is not None:
                loss = dist(g, pred, tgt, axis)
            else:
                mask = g.node_mask
                sq = jnp.where(mask[:, None], (pred - tgt) ** 2, 0.0)
                loss = jax.lax.psum(sq.sum(), axis) / jnp.maximum(
                    jax.lax.psum(mask.sum() * num_fields, axis), 1)
            field = jnp.concatenate([field[:, num_fields:], pred], axis=1)
            return field, loss

        _, losses = jax.lax.scan(scan_body, graph.field,
                                 jnp.arange(max_n_out, dtype=jnp.int32))
        return losses.mean()

    def run(params, graph: Graph):
        arrays, statics = graph.arrays(), graph.statics()
        fn = shard_map(partial(per_device, statics=statics), mesh=mesh,
                       in_specs=(P(), _graph_specs(arrays, axis)),
                       out_specs=P(), check_vma=False)
        return fn(params, arrays)

    return jax.jit(run)
