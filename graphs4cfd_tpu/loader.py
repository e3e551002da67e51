"""Batch assembly: concatenation with index offsets + padding/bucketing.

Replaces the reference's ``Collater``/``DataLoader``
(``/root/reference/graphs4cfd/loader.py:7-76``).  PyG's ``Batch`` offsets
node indices at collate time and the reference patches REMuS angle indices
by hand (``loader.py:18-51``); here a single table of offset rules covers
every per-level array, and the batch is then **padded to size buckets** so
XLA compiles one program per bucket instead of one per ragged batch.

Padding invariants (hold for every consumer in ``nn/``):
* Level arrays are padded with zeros; ``node_mask{_l}`` / ``edge_mask{_l}``
  flag valid rows.
* Fixed-indegree levels keep ``E = k·V`` exactly: pad edges are self-loops
  on pad nodes (sender = receiver = row//k), so the ``[V, k, F]`` reshape
  aggregation stays valid and pad garbage never reaches valid rows.
* ``edge_f2c_{l}`` pads with -1 (masked in ``pool_edges``).
* ``up_w_{l}`` pads with **1** so interpolation normalisation never divides
  by zero (NaNs in pad rows would poison parameter gradients through
  matmuls even when the loss masks them).
* All padded index arrays stay in-bounds; garbage flows only into pad rows.
"""
from __future__ import annotations

import math
import re
from typing import Callable, List, Optional, Sequence

import numpy as np

from .graph import Graph

#: level-1 node-space arrays that concatenate verbatim
_L1_NODE_KEYS = ("field", "target", "omega", "loc", "glob", "bound")
#: static (non-array) keys that must agree across samples
_STATIC_KEYS_RE = re.compile(
    r"^(fixed_k(_\d)?|num_levels|interp_k|wg_pref|wgf_pref)$")


def _suffix_level(key: str) -> int:
    m = re.search(r"_(\d)$", key)
    return int(m.group(1)) if m else 1


def _rules(key: str):
    """→ (count_space, offset_space); spaces are ('node'|'edge', level)."""
    l = _suffix_level(key)
    base = re.sub(r"_\d$", "", key)
    if base in ("pos",):
        return ("node", l), None
    if key in _L1_NODE_KEYS:
        return ("node", 1), None
    if base in ("senders", "receivers"):
        return ("edge", l), ("node", l)
    if base in ("edge_attr", "angle_attr", "xangle_attr", "unit_vec"):
        return ("edge", l), None
    if base == "parent":
        return ("node", l - 1), ("node", l)
    if base == "e_rel":
        return ("node", l - 1), None
    if base == "edge_f2c":
        return ("edge", l - 1), ("edge", l)
    if base == "down_idx":
        return ("node", l), ("node", l - 1)
    if base == "node_origin":
        return ("node", l), ("node", 1)
    if base == "up_idx":
        return ("node", l - 1), ("node", l)
    if base == "up_w":
        return ("node", l - 1), None
    if base == "unit_pinv":
        return ("node", l), None
    if base == "angle_src":
        return ("edge", l), ("edge", l)
    if base == "xangle_src":
        return ("edge", l), ("edge", l - 1)
    if base == "sender_perm":
        return ("edge", l), ("edge", l)
    if base == "sender_sorted":
        return ("edge", l), ("node", l)
    raise KeyError(f"No collate rule for graph key {key!r}")


def _round_up(n: int, mult: int) -> int:
    return mult * math.ceil(n / mult) if mult > 1 else n


def _ladder_windows(window: int, num_nodes: int) -> List[int]:
    """Preferred window first, then doubling fallbacks that still fit the
    table.  Small/multi-sample batches can exceed the planner's miss cap at
    the tuned window (the round-3 (256, 64) folded default does on 2-sample
    collates); a wider window always lowers the miss rate, so ladder up
    before giving up — a slightly-wider fused kernel beats the silent XLA
    fallback every time (BASELINE.md: fused vs unfused ≥ 15 ms).

    The preferred window is seeded unconditionally (even above the 4096
    cap, which only bounds the doubling fallbacks): an explicit
    GRAPHS4CFD_GATHER_WINDOW / ``wg_pref`` override must be attempted
    once rather than silently dropped to the XLA path."""
    out = [window]
    w = window * 2
    while w <= num_nodes and w <= 4096:
        out.append(w)
        w *= 2
    return out


def _add_window_gather_plan(out: dict, num_nodes: int, k: int,
                            exc_pad: Optional[int] = None,
                            blk_pad: Optional[int] = None,
                            pref: Optional[tuple] = None) -> None:
    """Attach the windowed-gather plan for the level-1 sender gather.

    Enables the one-hot MXU gather (``ops.pallas_gather``) on the MP hot
    path; profiling showed XLA's dynamic row gather costs ~43% of the MuS
    train step (BASELINE.md).  Skipped (XLA fallback) when shapes don't
    fit or node numbering isn't spatially sorted (high miss rate).
    """
    import os
    from .ops.window_plan import build_window_gather_plan
    # (window=512, block=128) won the TPU v5e sweep (BASELINE.md): small
    # enough that the fused GN backward's VMEM working set and the
    # overlapping dvs read-modify-write windows stay cheap, large enough
    # that out-of-window exceptions stay rare after SpatialSort
    # a graph-build transform may pin its own (window, block) via the
    # static key ``wg_pref`` (e.g. REMuS, whose optimum differs from the
    # MuS/gMuS one); env vars still override for sweeps
    pw, pb = pref if pref is not None else (512, 128)
    window = int(os.environ.get("GRAPHS4CFD_GATHER_WINDOW", str(pw)))
    E = out["senders"].shape[0]
    b = int(os.environ.get("GRAPHS4CFD_GATHER_BLOCK", str(pb)))
    while b > 1 and num_nodes % b:
        b //= 2
    from .config import record_choice
    block_rows = k * b
    if num_nodes < window or E % block_rows:
        record_choice("wg_plan", "none")
        return
    kwargs = {}
    if exc_pad is not None:
        kwargs["min_exc_pad"] = exc_pad
    if blk_pad is not None:
        kwargs["min_blk_pad"] = blk_pad
    plan = None
    for w in _ladder_windows(window, num_nodes):
        plan = build_window_gather_plan(out["senders"], num_nodes,
                                        block_rows=block_rows, window=w,
                                        stride=b, **kwargs)
        if plan is not None:
            break
    if plan is None:
        record_choice("wg_plan", "none")
        return
    record_choice("wg_plan", f"w{plan.window}")
    out["wg_starts"] = plan.starts
    out["wg_lidx"] = plan.lidx
    out["wg_exc_pos"] = plan.exc_pos
    out["wg_exc_idx"] = plan.exc_idx
    out["wg_window"] = plan.window
    out["wg_block_rows"] = plan.block_rows
    out["wg_exc_lpos"] = plan.exc_lpos
    out["wg_exc_nidx"] = plan.exc_nidx
    out["wg_stride"] = plan.stride


def _add_folded_gather_plan(out: dict, num_nodes: int, k: int,
                            exc_pad: Optional[int] = None,
                            blk_pad: Optional[int] = None,
                            pref: Optional[tuple] = None,
                            level: int = 1) -> None:
    """Attach the edge-row-blocked plan for the folded line-graph EdgeMP
    kernel (``ops.pallas_edgemp``; REMuS level-1 angle chains).

    Same planner as ``_add_window_gather_plan``, but the block is a small
    run of edges (``k`` per node, ``block_nodes`` nodes) — the folded
    kernel's [B, k·H] lane-blocked working set is k× wider per row than
    the node-layout kernel's, so B stays small and the rolling-accumulator
    stride equals ``block_nodes`` table rows.
    """
    import os
    from .ops.window_plan import build_window_gather_plan
    # default (256, 64): round-3 TPU sweep on the REMuS 3-scale step —
    # w1024 80.1 ms, w512 68.4, w384 65.7, **w256 64.2**, w128 66.3.  The
    # folded gather's one-hot MACs scale with window width while the
    # per-block exception padding stayed at X=64 across the whole sweep,
    # so smaller windows are nearly free until ~256; below that the extra
    # misses outweigh the MAC savings.
    pw, pb = pref if pref is not None else (256, 64)
    window = int(os.environ.get("GRAPHS4CFD_FOLD_WINDOW", str(pw)))
    b = int(os.environ.get("GRAPHS4CFD_FOLD_BLOCK", str(pb)))
    while b > 1 and num_nodes % b:
        b //= 2
    block_rows = k * b
    suf = "" if level == 1 else f"_{level}"
    senders = out[f"senders{suf}"]
    E = senders.shape[0]
    from .config import record_choice
    if num_nodes < window or E % block_rows:
        record_choice(f"fold_plan_l{level}", "none")
        return
    kwargs = {}
    if exc_pad is not None:
        kwargs["min_exc_pad"] = exc_pad
    if blk_pad is not None:
        kwargs["min_blk_pad"] = blk_pad
    plan = None
    for w in _ladder_windows(window, num_nodes):
        plan = build_window_gather_plan(senders, num_nodes,
                                        block_rows=block_rows, window=w,
                                        stride=b, **kwargs)
        if plan is not None:
            break
    if plan is None:
        record_choice(f"fold_plan_l{level}", "none")
        return
    record_choice(f"fold_plan_l{level}", f"w{plan.window}")
    tag = "wg_fold" if level == 1 else f"wg_fold{level}"
    out[f"{tag}_starts"] = plan.starts
    out[f"{tag}_lidx"] = plan.lidx
    out[f"{tag}_exc_pos"] = plan.exc_pos
    out[f"{tag}_exc_idx"] = plan.exc_idx
    out[f"{tag}_window"] = plan.window
    out[f"{tag}_block_rows"] = plan.block_rows
    out[f"{tag}_exc_lpos"] = plan.exc_lpos
    out[f"{tag}_exc_nidx"] = plan.exc_nidx
    out[f"{tag}_stride"] = plan.stride


def collate(graphs: Sequence[Graph],
            node_bucket: int = 64,
            edge_bucket: int = 128) -> Graph:
    """Merge per-sample graphs into one padded super-graph."""
    g0 = graphs[0]
    keys = [k for k in g0.data if not _STATIC_KEYS_RE.match(k)]
    static = {k: g0.data[k] for k in g0.data if _STATIC_KEYS_RE.match(k)}
    for g in graphs[1:]:
        for k, v in static.items():
            assert g.data.get(k) == v, f"static key {k} differs across batch"

    # ---- per-level valid counts and offsets --------------------------------
    levels = sorted({_suffix_level(k) for k in keys if k.startswith("pos")})
    counts = {}  # (space, level) -> per-sample counts
    for l in levels:
        pos_key = "pos" if l == 1 else f"pos_{l}"
        counts[("node", l)] = [np.asarray(g.data[pos_key]).shape[0]
                               for g in graphs]
        s_key = "senders" if l == 1 else f"senders_{l}"
        if s_key in g0.data:
            counts[("edge", l)] = [np.asarray(g.data[s_key]).shape[0]
                                   for g in graphs]
    offsets = {space: np.concatenate([[0], np.cumsum(c)])
               for space, c in counts.items()}

    # ---- fixed-k layout info ----------------------------------------------
    def fixed_k_of(level: int) -> Optional[int]:
        if level == 1:
            return static.get("fixed_k")
        return static.get(f"fixed_k_{level}")  # set by gMuS/REMuS transforms

    # ---- padded sizes ------------------------------------------------------
    padded = {}
    for (space, l), c in counts.items():
        total = int(sum(c))
        if space == "node":
            padded[(space, l)] = _round_up(total, node_bucket)
    for (space, l), c in counts.items():
        if space == "edge":
            k = fixed_k_of(l)
            if k is not None:
                padded[(space, l)] = k * padded[("node", l)]
            else:
                padded[(space, l)] = _round_up(int(sum(c)), edge_bucket)

    out = {}
    # ---- concat + offset + pad each key -----------------------------------
    for key in keys:
        count_space, offset_space = _rules(key)
        parts = []
        for i, g in enumerate(graphs):
            arr = np.asarray(g.data[key])
            if offset_space is not None:
                off = int(offsets[offset_space][i])
                if key.startswith("edge_f2c"):
                    arr = np.where(arr >= 0, arr + off, -1)
                else:
                    arr = arr + off
            parts.append(arr)
        merged = np.concatenate(parts, axis=0)
        total_padded = padded[count_space]
        pad_rows = total_padded - merged.shape[0]
        if pad_rows > 0:
            base = re.sub(r"_\d$", "", key)
            if base == "edge_f2c":
                fill = np.full((pad_rows,) + merged.shape[1:], -1,
                               dtype=merged.dtype)
            elif base == "sender_perm":
                # identity on pad rows (their cotangents are zero)
                fill = np.arange(merged.shape[0], total_padded,
                                 dtype=merged.dtype)
            elif base == "sender_sorted":
                # keep global sortedness: pads point at the last pad node
                fill = np.full((pad_rows,), padded[("node",
                                                   count_space[1])] - 1,
                               dtype=merged.dtype)
            elif base == "up_w":
                fill = np.ones((pad_rows,) + merged.shape[1:],
                               dtype=merged.dtype)
            elif base in ("senders", "receivers"):
                k = fixed_k_of(count_space[1])
                if k is not None:
                    # self-loops on pad nodes keep the [V,k] reshape valid
                    start = merged.shape[0]
                    rows = (np.arange(start, start + pad_rows) // k)
                    fill = rows.astype(merged.dtype)
                else:
                    fill = np.zeros((pad_rows,), dtype=merged.dtype)
            else:
                fill = np.zeros((pad_rows,) + merged.shape[1:],
                                dtype=merged.dtype)
            merged = np.concatenate([merged, fill], axis=0)
        out[key] = merged

    # ---- masks + batch vector ---------------------------------------------
    for (space, l), c in counts.items():
        total = int(sum(c))
        name = ("node_mask" if space == "node" else "edge_mask")
        name += "" if l == 1 else f"_{l}"
        mask = np.zeros(padded[(space, l)], dtype=bool)
        mask[:total] = True
        out[name] = mask
    batch = np.concatenate([np.full(c, i, dtype=np.int32)
                            for i, c in enumerate(counts[("node", 1)])])
    out["batch"] = np.concatenate([
        batch, np.full(padded[("node", 1)] - len(batch), len(graphs),
                       dtype=np.int32)])
    out["num_graphs"] = len(graphs)
    out.update(static)
    if static.get("fixed_k") is not None and "senders" in out:
        _add_window_gather_plan(out, padded[("node", 1)],
                                static["fixed_k"],
                                pref=static.get("wg_pref"))
        if "angle_src" in out:         # REMuS: folded line-graph plans,
            _add_folded_gather_plan(out, padded[("node", 1)],
                                    static["fixed_k"],
                                    pref=static.get("wgf_pref"))
            # ... one per coarse level too (L2/L3 angle chains are ~2
            # L1-layer-equivalents of work; coarse levels inherit the
            # level-1 spatial sort through down_idx, so windows stay tight)
            l = 2
            while f"angle_src_{l}" in out:
                if static.get(f"fixed_k_{l}") is not None:
                    _add_folded_gather_plan(out, padded[("node", l)],
                                            static[f"fixed_k_{l}"],
                                            pref=static.get("wgf_pref"),
                                            level=l)
                l += 1
    return Graph(data=out)


def collate_sharded(graphs: Sequence[Graph], num_shards: int,
                    node_bucket: int = 64, edge_bucket: int = 128) -> Graph:
    """Collate into ``num_shards`` equal-shape shard groups with a leading
    shard axis — the input format of the data-parallel ``shard_map`` step.

    Samples are grouped round-robin; every shard is padded to the maximum
    bucketed size over shards, so array ``x`` of per-shard shape ``[N, ...]``
    becomes ``[num_shards, N, ...]`` with **shard-local** indices (no
    cross-shard edges exist by construction, so a device never needs remote
    rows — pure DP with zero halo).
    """
    assert len(graphs) % num_shards == 0, \
        f"batch size {len(graphs)} not divisible by {num_shards} shards"
    from .config import record_choice, suppress_choice_recording
    groups = [list(graphs[i::num_shards]) for i in range(num_shards)]
    # per-shard plan attaches (inside collate and the exploratory rounds
    # below) must not hit the fast-path counters — only the FINAL stacked
    # decision is recorded, once (ADVICE r4 #2)
    with suppress_choice_recording():
        shards = [collate(g, node_bucket, edge_bucket) for g in groups]
    # per-shard gather plans go stale once shards are re-padded below (and
    # their exception buffers may differ in size) — rebuild them afterwards
    dropped_fold_levels = sorted(
        {1 if k == "wg_fold_starts" else int(k[len("wg_fold"):-len("_starts")])
         for k in shards[0].data
         if k.startswith("wg_fold") and k.endswith("_starts")})
    for s in shards:
        for key in [k for k in s.data
                    if k.startswith("wg_") and k != "wg_pref"]:
            del s.data[key]
    # pad every shard to the max padded size per key
    out = {}
    keys = shards[0].data.keys()
    for key in keys:
        vals = [s.data[key] for s in shards]
        if not isinstance(vals[0], np.ndarray):
            assert all(v == vals[0] for v in vals), \
                f"static key {key} differs across shards"
            out[key] = vals[0]
            continue
        max_rows = max(v.shape[0] for v in vals)
        padded_vals = []
        for s, v in zip(shards, vals):
            extra = max_rows - v.shape[0]
            if extra:
                # reuse collate's padding semantics by re-collating would be
                # costly; replicate the pad rules inline
                base = re.sub(r"_\d$", "", key)
                if base == "edge_f2c":
                    fill = np.full((extra,) + v.shape[1:], -1, dtype=v.dtype)
                elif base == "sender_perm":
                    fill = np.arange(v.shape[0], max_rows, dtype=v.dtype)
                elif base == "sender_sorted":
                    nk = "node_mask"
                    fill = np.full((extra,), s.data[nk].shape[0] - 1,
                                   dtype=v.dtype)
                elif base == "up_w":
                    fill = np.ones((extra,) + v.shape[1:], dtype=v.dtype)
                elif base in ("senders", "receivers"):
                    l = _suffix_level(key)
                    k = (s.data.get("fixed_k") if l == 1
                         else s.data.get(f"fixed_k_{l}"))
                    if k is not None:
                        fill = (np.arange(v.shape[0], max_rows) // k).astype(
                            v.dtype)
                    else:
                        fill = np.zeros((extra,), dtype=v.dtype)
                else:
                    fill = np.zeros((extra,) + v.shape[1:], dtype=v.dtype)
                v = np.concatenate([v, fill], axis=0)
            padded_vals.append(v)
        out[key] = np.stack(padded_vals, axis=0)
    # rebuild gather plans per shard on the final padded senders, with a
    # common exception-buffer size so the shard arrays stack
    fixed_k = out.get("fixed_k", shards[0].data.get("fixed_k"))
    wg_pref = out.get("wg_pref", shards[0].data.get("wg_pref"))
    if fixed_k is not None and "senders" in out:
        num_nodes = out["node_mask"].shape[1]
        with suppress_choice_recording():
            per_shard = []
            for i in range(num_shards):
                d = {"senders": out["senders"][i]}
                _add_window_gather_plan(d, num_nodes, fixed_k, pref=wg_pref)
                per_shard.append(d)
            if all("wg_starts" in d for d in per_shard):
                exc_pad = max(d["wg_exc_pos"].shape[0] for d in per_shard)
                blk_pad = max(d["wg_exc_lpos"].shape[1] for d in per_shard)
                # the ladder may have attached different windows per shard;
                # the stacked plan needs ONE static window, so re-plan every
                # shard starting at the widest attached window
                wmax = max(d["wg_window"] for d in per_shard)
                pb = wg_pref[1] if wg_pref is not None else 128
                per_shard = []
                for i in range(num_shards):
                    d = {"senders": out["senders"][i]}
                    _add_window_gather_plan(d, num_nodes, fixed_k,
                                            exc_pad=exc_pad,
                                            blk_pad=blk_pad,
                                            pref=(wmax, pb))
                    per_shard.append(d)
                if (all("wg_starts" in d for d in per_shard)
                        and len({d["wg_window"] for d in per_shard}) == 1
                        and len({d["wg_exc_pos"].shape[0]
                                 for d in per_shard}) == 1
                        and len({d["wg_exc_lpos"].shape[1]
                                 for d in per_shard}) == 1):
                    for key in ("wg_starts", "wg_lidx", "wg_exc_pos",
                                "wg_exc_idx", "wg_exc_lpos", "wg_exc_nidx"):
                        out[key] = np.stack([d[key] for d in per_shard],
                                            axis=0)
                    out["wg_window"] = per_shard[0]["wg_window"]
                    out["wg_block_rows"] = per_shard[0]["wg_block_rows"]
        # ONE record for the whole sharded batch, reflecting what the
        # batch actually carries (including the consistency-check discard)
        record_choice("wg_plan", (f"w{out['wg_window']}"
                                  if "wg_starts" in out else "none"))
    # folded plans are shard-collate artifacts that are dropped above and
    # not rebuilt for the sharded step — surface that instead of letting
    # the shard collates claim an attach
    for lvl in dropped_fold_levels:
        record_choice(f"fold_plan_l{lvl}", "none")
    return Graph(data=out)


class DataLoader:
    """Minimal epoch iterator: sample → per-sample transforms → collate.

    Matches the reference DataLoader surface (``loader.py:64-76``); the
    ``transform`` kwarg (the reference's whole-batch transform, e.g.
    ``GridClustering``/``BuildKnnInterpWeights``) is applied per sample
    *before* collation — equivalent for per-sample clustering semantics and
    required for static-shape padding.
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 transform: Optional[Callable] = None,
                 node_bucket: int = 64, edge_bucket: int = 128,
                 seed: int = 0, drop_last: bool = False,
                 num_workers: int = 0, prefetch: int = 2,
                 num_shards: int = 0,
                 batch_transform: Optional[Callable] = None, **_ignored):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        self.node_bucket = node_bucket
        self.edge_bucket = edge_bucket
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        #: > 0 → yield ``collate_sharded`` batches with a leading shard
        #: axis (the data-parallel train step's input); set by ``fit``
        #: when TrainConfig.devices > 1.  Forces drop_last so every batch
        #: divides evenly.
        self.num_shards = num_shards
        #: applied to the COLLATED batch (the reference's whole-batch
        #: transform semantics — e.g. ``BatchGridClustering`` for the
        #: shared-cell quirk of ``transforms/mus.py:25``)
        self.batch_transform = batch_transform
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return (n // self.batch_size if self.drop_last
                else math.ceil(n / self.batch_size))

    def _make_batch(self, idx):
        gs = [self.dataset[int(i)] for i in idx]
        if self.transform is not None:
            gs = [self.transform(g) for g in gs]
        if self.num_shards:
            if self.batch_transform is not None:
                # Documented limitation (README / PARITY.md): the
                # reference's whole-batch transform semantics
                # (GridClustering cells shared across ALL samples,
                # transforms/mus.py:25) cannot be sharded — cells would
                # couple samples living on different devices.  Under DP
                # use the per-sample transform instead (the framework
                # default, e.g. transforms.GridClustering in the
                # DataLoader ``transform`` pipeline), which is
                # shard-independent by construction.
                raise ValueError(
                    "batch_transform is incompatible with DP sharding "
                    "(whole-batch shared cells would couple shards); "
                    "move the transform into the per-sample `transform` "
                    "pipeline (per-sample clustering) for DP runs")
            return collate_sharded(gs, self.num_shards,
                                   self.node_bucket, self.edge_bucket)
        batch = collate(gs, self.node_bucket, self.edge_bucket)
        if self.batch_transform is not None:
            batch = self.batch_transform(batch)
        return batch

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        drop_last = self.drop_last or self.num_shards > 0
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if drop_last and len(idx) < self.batch_size:
                return
            yield idx

    def __iter__(self):
        if self.num_workers <= 0:
            for idx in self._index_batches():
                yield self._make_batch(idx)
            return
        # thread-pool prefetch: overlaps host graph construction (NumPy/C++
        # kernels release the GIL for the heavy parts) with device compute —
        # the reference's num_workers=4 subprocess analogue
        from concurrent.futures import ThreadPoolExecutor
        import collections
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()
            it = self._index_batches()
            try:
                for _ in range(max(1, self.prefetch) * self.num_workers):
                    pending.append(pool.submit(self._make_batch, next(it)))
            except StopIteration:
                it = iter(())
            while pending:
                batch = pending.popleft().result()
                try:
                    pending.append(pool.submit(self._make_batch, next(it)))
                except StopIteration:
                    pass
                yield batch
