"""Windowed one-hot MXU gather — Pallas replacement for XLA's row gather.

Motivation (BASELINE.md ledger): XLA lowers ``table[indices]`` on TPU to a
per-row dynamic access costing ~57 ns/row regardless of index locality;
the two per-MP-layer gathers were ~43% of the MuS-GNN train step.  With
Morton-sorted nodes the senders of each receiver-sorted edge block fall in
a narrow window of the node table, so the gather becomes

    out[block] = one_hot(local_idx, W) @ table[start : start + W]

— an MXU matmul fed by one contiguous DMA, no dynamic indexing.  The
backward transposes the same matmul and accumulates into the (overlapping)
windows with a read-modify-write DMA; the TPU grid executes sequentially
(``dimension_semantics=("arbitrary",)``), so the RMW is race-free.
Out-of-window "exception" rows (plan-padded, a few % after SpatialSort)
are patched by small XLA gathers around the kernel.

The plan (window starts, local indices, exceptions) is topology-static and
built on host by ``ops.window_plan.build_window_gather_plan``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot(lidx, block_rows, window, dtype):
    # lidx: [block_rows, 1] int32; value == window marks a miss (zero row)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block_rows, window), 1)
    return (lidx == iota).astype(dtype)


def _fwd_kernel(window, block_rows, stride, out_dtype,
                starts_ref, lidx_ref, tab_hbm, out_ref, win, sem):
    # NB: incremental window maintenance (DMA only the stride new rows per
    # block, sliding the VMEM window) was tried for rolling plans and
    # REGRESSED the MuS step 46.3→48.2 ms on TPU v5e — the predicated
    # DMA chains + VMEM slide cost more than the full-window DMA they
    # replace (BASELINE.md, parked results).  Full-window DMA per block:
    del stride
    b = pl.program_id(0)
    start = pl.multiple_of(starts_ref[b], 8)  # plan rounds starts to 8
    dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(start, window), :],
                                win, sem)
    dma.start()
    oh = _onehot(lidx_ref[:], block_rows, window, out_dtype)
    dma.wait()
    out_ref[:] = jnp.dot(oh, win[:].astype(out_dtype),
                         preferred_element_type=jnp.float32
                         ).astype(out_dtype)


def _bwd_kernel(window, block_rows, stride, starts_ref, lidx_ref, ct_ref,
                dtab_hbm_in, dtab_hbm, win, sem_in, sem_out):
    # dtab_hbm_in is aliased to dtab_hbm (zeros-initialised f32 table);
    # sequential grid makes the read-modify-write race-free.
    del dtab_hbm_in
    b = pl.program_id(0)
    start = pl.multiple_of(starts_ref[b], 8)  # plan rounds starts to 8
    rd = pltpu.make_async_copy(dtab_hbm.at[pl.ds(start, window), :],
                               win, sem_in)
    rd.start()
    # one-hot selection is exact in any dtype; keep MXU inputs in the
    # cotangent's dtype (bf16 on TPU = full MXU rate) with f32 accumulate
    ct = ct_ref[:]
    oh = _onehot(lidx_ref[:], block_rows, window, ct.dtype)
    upd = jnp.dot(oh.T, ct, preferred_element_type=jnp.float32)
    rd.wait()
    win[:] += upd
    wr = pltpu.make_async_copy(win, dtab_hbm.at[pl.ds(start, window), :],
                               sem_out)
    wr.start()
    wr.wait()


def _bwd_kernel_rolling(window, block_rows, stride, starts_ref, lidx_ref,
                        ct_ref, dtab_hbm, acc, sem):
    """Rolling-accumulator transpose: monotone stride plans let the window
    cotangent live in a persistent VMEM accumulator; each stride-chunk of
    rows is flushed to HBM exactly once when the window slides past it
    (vs. a window-wide read-modify-write DMA per block)."""
    b = pl.program_id(0)
    nsteps = pl.num_programs(0)
    start = pl.multiple_of(starts_ref[b], 8)
    prev = pl.multiple_of(starts_ref[jnp.maximum(b - 1, 0)], 8)
    shift = start - prev
    flush = pltpu.make_async_copy(acc.at[pl.ds(0, stride), :],
                                  dtab_hbm.at[pl.ds(prev, stride), :], sem)

    @pl.when(b == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(shift > 0)
    def _flush_start():
        flush.start()

    ct = ct_ref[:]
    oh = _onehot(lidx_ref[:], block_rows, window, ct.dtype)
    upd = jnp.dot(oh.T, ct, preferred_element_type=jnp.float32)

    @pl.when(shift > 0)
    def _slide():
        flush.wait()
        acc[0:window - stride, :] = acc[stride:window, :]
        acc[window - stride:window, :] = jnp.zeros(
            (stride, acc.shape[1]), acc.dtype)
    acc[:] += upd

    @pl.when(b == nsteps - 1)
    def _flush_tail():
        fin = pltpu.make_async_copy(
            acc, dtab_hbm.at[pl.ds(start, window), :], sem)
        fin.start()
        fin.wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _windowed_take(table, lidx, starts, exc_pos, exc_idx,
                   window, block_rows, interpret, stride, zero_tail=False):
    out, _ = _wt_fwd(table, lidx, starts, exc_pos, exc_idx,
                     window, block_rows, interpret, stride)
    return out


def _wt_fwd(table, lidx, starts, exc_pos, exc_idx,
            window, block_rows, interpret, stride=0):
    M = lidx.shape[0]
    H = table.shape[1]
    nblocks = M // block_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_rows, H), lambda b, s: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((window, H), table.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    kernel = functools.partial(_fwd_kernel, window, block_rows, stride,
                               table.dtype)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, H), table.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(starts, lidx, table)
    # patch out-of-window rows (padded exc_pos == M rows are dropped)
    exc_vals = jnp.take(table, exc_idx, axis=0, mode="clip")
    out = out.at[exc_pos].set(exc_vals, mode="drop")
    return out, (table.shape[0], lidx, starts, exc_pos, exc_idx)


def _wt_vjp_fwd(table, lidx, starts, exc_pos, exc_idx,
                window, block_rows, interpret, stride, zero_tail=False):
    return _wt_fwd(table, lidx, starts, exc_pos, exc_idx,
                   window, block_rows, interpret, stride)


def _wt_vjp_bwd(window, block_rows, interpret, stride, zero_tail, res, ct):
    N, lidx, starts, exc_pos, exc_idx = res
    M, H = ct.shape
    nblocks = M // block_rows
    rolling = stride > 0
    # exception rows were overwritten in the forward, so their kernel-path
    # contribution must be zero: miss rows already have lidx == window
    # (zero one-hot row), and their true contribution flows through the
    # scatter-add below.
    in_specs = [
        pl.BlockSpec((block_rows, 1), lambda b, s: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, H), lambda b, s: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((window, H), jnp.float32),
               pltpu.SemaphoreType.DMA(())]
    if rolling:
        # every table row is flushed exactly once → no zeros alias input
        kernel = functools.partial(_bwd_kernel_rolling, window, block_rows,
                                   stride)
        operands = (starts, lidx, ct)
        aliases = {}
    else:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.SemaphoreType.DMA(()))
        kernel = functools.partial(_bwd_kernel, window, block_rows, stride)
        operands = (starts, lidx, ct, jnp.zeros((N, H), jnp.float32))
        aliases = {3: 0}   # zeros table -> output (after the scalar-
        # prefetch operand, inputs are: lidx, ct, zeros)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    dtab = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, H), jnp.float32),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)
    if rolling and zero_tail:
        # graph-parallel tables extend past the rolling flush coverage;
        # rows the flush never writes hold garbage — zero them (their true
        # cotangents enter through the exception scatter-add below)
        covered = starts[-1] + window
        rows = jax.lax.broadcasted_iota(jnp.int32, dtab.shape, 0)
        dtab = jnp.where(rows < covered, dtab, 0)
    # exception rows: scatter-add their cotangent (pad exc_idx == N drops)
    ct_exc = jnp.take(ct.astype(jnp.float32), exc_pos, axis=0, mode="clip")
    live = (exc_pos < M)[:, None].astype(jnp.float32)
    dtab = dtab.at[exc_idx].add(ct_exc * live, mode="drop")
    return (dtab, None, None, None, None)


_windowed_take.defvjp(_wt_vjp_fwd, _wt_vjp_bwd)


def windowed_take(table: jnp.ndarray, plan, *,
                  interpret: bool = False,
                  zero_tail: bool = False) -> jnp.ndarray:
    """``table[indices]`` via the windowed one-hot MXU kernel.

    ``plan`` carries (starts, lidx, exc_pos, exc_idx) as device arrays plus
    static ``window``/``block_rows`` (see ``ops.window_plan``).  Gradient
    flows to ``table`` only.
    """
    starts, lidx, exc_pos, exc_idx, window, block_rows = plan[:6]
    stride = int(plan[8]) if len(plan) > 8 and plan[8] is not None else 0
    return _windowed_take(table, lidx, starts, exc_pos, exc_idx,
                          int(window), int(block_rows), interpret, stride,
                          zero_tail)


def supports(table_rows: int, m: int, window: int, block_rows: int,
             h: int = 128) -> bool:
    """``h`` is the table feature width: Mosaic requires the window DMA's
    lane-dim slice be a multiple of the 128-lane tile, so narrow tables
    (e.g. width-64 demo models) must take the XLA gather fallback —
    interpret mode does not check this proof (BASELINE.md r3 ledger), so
    the gate lives here, not in the kernel."""
    return table_rows >= window and m % block_rows == 0 and h % 128 == 0
