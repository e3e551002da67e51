"""Host-side plan for the windowed one-hot MXU gather.

Profiling on TPU v5e (BASELINE.md ledger) showed XLA's dynamic row gather
pays a fixed per-row penalty (~57 ns/row, independent of index locality),
making the two per-MP-layer gathers (forward ``vs[senders]`` and the
backward permute-gather) ~43% of the whole MuS-GNN train step.  The fix:
with Morton-renumbered nodes (``transforms.SpatialSort``) the senders of a
receiver-sorted edge block fall into a narrow index window, so the gather
can be computed as ``one_hot(local_idx) @ table_window`` on the MXU inside
a Pallas kernel (``ops.pallas_gather``) — no dynamic indexing at all.

This module builds the static plan on host (NumPy):

* per edge-block window start into the node table (block-median centred);
* per edge local index within its block's window (= ``window`` ⇒ miss);
* a padded exception list (edge position, node index) for out-of-window
  senders, patched in/out by small XLA gathers around the kernel.

The plan depends only on topology and is built once per collated batch.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class WindowGatherPlan(NamedTuple):
    starts: np.ndarray    # [num_blocks] int32 — window start row per block
    lidx: np.ndarray      # [M, 1] int32 — index-start, or =window for miss
    exc_pos: np.ndarray   # [P] int32 — edge positions of misses (pad: M)
    exc_idx: np.ndarray   # [P] int32 — node indices of misses (pad: N)
    window: int           # static window width (rows)
    block_rows: int       # static rows per kernel block
    # blocked exception form (for the in-kernel gather of the fused GN
    # block): per-block local row / table index, padded per block
    exc_lpos: np.ndarray  # [num_blocks, X] int32 — local row (pad: block_rows)
    exc_nidx: np.ndarray  # [num_blocks, X] int32 — table row (pad: num_rows)
    # rolling mode: when > 0, starts are monotone with consecutive
    # differences in {0, stride} exactly, enabling the rolling-accumulator
    # backward in the fused GN kernel (dvs rows flushed to HBM once each
    # instead of a window-wide RMW per block)
    stride: int = 0


def _ceil_pow2(n: int, lo: int) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def build_window_gather_plan(indices: np.ndarray,
                             num_rows: int,
                             *,
                             block_rows: int = 1536,
                             window: int = 1024,
                             max_miss_frac: float = 0.25,
                             min_exc_pad: int = 256,
                             min_blk_pad: int = 8,
                             stride: int = 0
                             ) -> Optional[WindowGatherPlan]:
    """Plan ``table[indices]`` as blockwise windowed one-hot matmuls.

    ``indices``: int array [M] of rows into a [num_rows, H] table.  Returns
    None when the layout doesn't fit (M not divisible by ``block_rows``) or
    the miss rate exceeds ``max_miss_frac`` (nodes not spatially sorted —
    the XLA gather fallback is then the better choice).

    ``stride > 0`` requests *rolling* starts: ``start[b] = clip(b*stride +
    off)`` with a single best offset chosen by miss count, guaranteeing
    monotone starts with consecutive differences in {0, stride}.  This is
    what the fused GN backward's rolling dvs accumulator needs; it also
    makes consecutive windows overlap by exactly ``window - stride`` rows
    so kernels can maintain the VMEM window incrementally.
    """
    idx = np.asarray(indices, dtype=np.int64).ravel()
    M = idx.shape[0]
    # window > num_rows would make the kernel's [start, start+window) DMA
    # run past the table — reject instead (callers ladder to other sizes)
    if M == 0 or M % block_rows or num_rows % 8 or window % 8 \
            or window > num_rows:
        return None
    nblocks = M // block_rows
    blocks = idx.reshape(nblocks, block_rows)
    if stride > 0 and (stride % 8 or window % stride or num_rows % stride
                       or num_rows < window):
        stride = 0                     # layout unfit → median fallback
    if stride > 0:
        # rolling starts: pick the miss-minimising offset among stride
        # multiples (the unclipped windows track the receiver blocks)
        base = np.arange(nblocks, dtype=np.int64) * stride
        hi = num_rows - window
        best, starts = None, None
        # off = -window is excluded: the rolling backward flushes exactly
        # the union of windows, and that offset is the only one whose last
        # window cannot be clipped up to ``hi`` — rows past the final
        # window would never be written (garbage gradients).  Every
        # off > -window guarantees start_last == hi ⇒ full [0, num_rows)
        # coverage.
        for off in range(-window + stride, stride, stride):
            s = np.clip(base + off, 0, hi)
            l = blocks - s[:, None]
            n = int(((l < 0) | (l >= window)).sum())
            if best is None or n < best:
                best, starts = n, s
    else:
        # median-centred window, clamped to the table; starts are rounded
        # to sublane multiples (8) so the kernel's dynamic DMA slice is
        # provably tile-aligned for Mosaic
        med = np.median(blocks, axis=1).astype(np.int64)
        starts = np.clip(med - window // 2, 0,
                         max(num_rows - window, 0)).astype(np.int64)
        starts &= ~np.int64(7)
    local = blocks - starts[:, None]
    miss = (local < 0) | (local >= window)
    n_miss = int(miss.sum())
    if n_miss > max_miss_frac * M:
        return None
    local = np.where(miss, window, local).reshape(M)
    flat_miss = miss.reshape(M)
    exc_pos = np.nonzero(flat_miss)[0].astype(np.int64)
    exc_idx = idx[exc_pos]
    P = _ceil_pow2(max(len(exc_pos), 1), min_exc_pad)
    pad = P - len(exc_pos)
    # blocked exception form: per-block (local row, table row) pairs padded
    # to a common power-of-2 width X (pad lpos = block_rows → zero one-hot
    # row in the kernel; pad nidx = num_rows → clip-gather, value masked by
    # the zero one-hot)
    per_block_counts = miss.sum(axis=1)
    X = _ceil_pow2(max(int(per_block_counts.max()), 1), min_blk_pad)
    exc_lpos = np.full((nblocks, X), block_rows, np.int64)
    exc_nidx = np.full((nblocks, X), num_rows, np.int64)
    for b in np.nonzero(per_block_counts)[0]:
        rows = np.nonzero(miss[b])[0]
        exc_lpos[b, :len(rows)] = rows
        exc_nidx[b, :len(rows)] = blocks[b, rows]
    # pad positions point one-past-the-end (dropped by scatter mode='drop');
    # pad node indices point one-past-the-end (dropped by segment_sum)
    exc_pos = np.concatenate([exc_pos, np.full(pad, M, np.int64)])
    exc_idx = np.concatenate([exc_idx, np.full(pad, num_rows, np.int64)])
    return WindowGatherPlan(
        starts=starts.astype(np.int32),
        lidx=local.astype(np.int32).reshape(M, 1),
        exc_pos=exc_pos.astype(np.int32),
        exc_idx=exc_idx.astype(np.int32),
        window=window,
        block_rows=block_rows,
        exc_lpos=exc_lpos.astype(np.int32),
        exc_nidx=exc_nidx.astype(np.int32),
        stride=int(stride),
    )


def apply_plan_numpy(table: np.ndarray, plan: WindowGatherPlan) -> np.ndarray:
    """Reference executor (for tests): must equal ``table[indices]``."""
    M = plan.lidx.shape[0]
    nblocks = M // plan.block_rows
    out = np.zeros((M, table.shape[1]), table.dtype)
    lidx = plan.lidx.reshape(nblocks, plan.block_rows)
    for b in range(nblocks):
        w = table[plan.starts[b]:plan.starts[b] + plan.window]
        li = lidx[b]
        hit = li < plan.window
        rows = np.where(hit, li, 0)
        vals = w[np.minimum(rows, len(w) - 1)]
        out[b * plan.block_rows:(b + 1) * plan.block_rows] = \
            np.where(hit[:, None], vals, 0)
    live = plan.exc_pos < M
    out[plan.exc_pos[live]] = table[plan.exc_idx[live]]
    return out
