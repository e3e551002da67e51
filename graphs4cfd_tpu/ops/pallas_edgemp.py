"""Pallas folded line-graph EdgeMP kernel — the REMuS level-1 hot path.

``nn/blocks.py:edge_mp`` (the reference's ``EdgeMP``,
``/root/reference/graphs4cfd/nn/blocks.py:293-333``) is a GN block on the
line graph: angles play edges, edges play nodes.  Routing it through the
node-layout fused GN kernel (``ops/pallas_gnblock.py``) still materialises
the gathered angle-source states ``asg = es[angle_src]`` as an ``[E·k, H]``
HBM array around the kernel (~2.8 ms/layer of the REMuS step,
BASELINE.md).  Fusing that gather mode-B style does not transfer: the
``[B, k·H] → [k·B, H]`` relayout (lane→sublane split) does not lower in
Mosaic, and per-angle one-hot columns over ``window·k`` table rows cost 5×
the gather MACs.

This kernel instead runs the whole angle chain in **folded layout**
``[B, k·H]`` — the layout the windowed one-hot gather naturally produces
from the ``[V, k·H]``-reshaped edge table (``tab[v] = es[v·k:(v+1)·k]``
concatenated, a free row-major reshape):

  * every angle-MLP matmul becomes k lane-block matmuls
    ``h[:, jH:(j+1)H]`` (same FLOPs, k smaller MXU calls); LayerNorm per
    lane block;
  * the sender gather is the plain node-style one-hot MXU matmul
    ``one_hot(lidx) @ tab_window`` (``ops/window_plan.py`` plan with
    edge-row blocks) — no relayout anywhere;
  * the receiver-edge projection ``e·Wr`` broadcast-adds to every lane
    block; aggregation ``meanₖ`` is a lane-block sum — free in this
    layout;
  * the backward mirrors the windowed GN kernel: remat per block, f32
    weight-grad scratch over the sequential grid, and the rolling
    ``d_tab`` accumulator (each table row flushed to HBM exactly once as
    the monotone window slides).

The custom-VJP boundary holds (a, tab, e, xval): ``tab = (e@Ws).reshape``
and the exception values are computed outside, so Ws and the exception
rows get their cotangents through XLA's (cheap) transpose ops.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mlp import _selu, _dselu, _chain_forward, _apply_ln
from .pallas_gnblock import (_split, _ln_backward, _chain_backward,
                             _wg_gather_block, _ring_dma)


def _fwd_math_folded(a, vsg, e, k, aw, ab, aln, ew, eb, eln, save=False,
                     out_selu=False, out_a=True):
    """One block of folded EdgeMP math.

    ``a`` is ``[B, k·fa]`` (angle features folded along lanes), ``vsg`` is
    the gathered ``[B, k·H]`` angle-source states, ``e`` is ``[B, fe]``.
    ``aw[0]`` is ``[fa+fe, H] = [Wa; Wr]`` (the Ws rows are consumed
    outside through the table).  Saved intermediates are pre-SELU.

    ``out_a=False`` (with ``save=False``) skips materialising the folded
    ``a′`` — for layers whose angle output has no consumer (the last
    EdgeMP of a level's final MP group), saving its [E, k·H] HBM write.
    The aggregation still needs every lane block's post-LN value, so only
    the concat/SELU/store is skipped, not the math.
    """
    fa = a.shape[-1] // k
    H = vsg.shape[-1] // k
    w1 = aw[0]
    wa, wr = w1[:fa], w1[fa:]
    er = jnp.dot(e, wr, preferred_element_type=jnp.float32)
    outs, h1s, pres, xhats, rstds = [], [], [], [], []
    aggr = None
    for j in range(k):
        a_j = a[:, j * fa:(j + 1) * fa]
        h1 = jnp.dot(a_j, wa, preferred_element_type=jnp.float32) \
            + vsg[:, j * H:(j + 1) * H].astype(jnp.float32) + er + ab[0][0]
        a_pre, pre_j = _chain_forward(h1, aw[1:], ab[1:], True)
        if aln is not None:
            a_out, xh, rs = _apply_ln(a_pre, aln[0], aln[1])
        else:
            a_out, xh, rs = a_pre, None, None
        if out_a or save:
            outs.append(a_out)
        aggr = a_out if aggr is None else aggr + a_out
        if save:
            h1s.append(h1)
            pres.append(pre_j)
            xhats.append(xh)
            rstds.append(rs)
    aggr = aggr / k
    faggr = aggr.shape[-1]
    wa2, wv = ew[0][:faggr], ew[0][faggr:]
    hn = jnp.dot(aggr.astype(ew[0].dtype), wa2,
                 preferred_element_type=jnp.float32) \
        + jnp.dot(e, wv, preferred_element_type=jnp.float32) + eb[0][0]
    e_pre, n_pre = _chain_forward(hn, ew[1:], eb[1:], True)
    if eln is not None:
        e_new, n_xhat, n_rstd = _apply_ln(e_pre, eln[0], eln[1])
    else:
        e_new, n_xhat, n_rstd = e_pre, None, None
    if not save:
        if out_selu:
            e_new = _selu(e_new)
            if out_a:
                outs = [_selu(o) for o in outs]
        return (jnp.concatenate(outs, axis=-1) if out_a else None), e_new
    return (outs, e_new, h1s, pres, xhats, rstds, aggr, hn, n_pre,
            n_xhat, n_rstd)


def _make_fwd_kernel_fold(n_a, n_e, has_aln, has_eln, k, out_dtype,
                          out_selu, window, block_rows, stride=0,
                          ring=False, skip_a=False):
    def kernel(*refs):
        starts_ref = refs[0]
        a_ref, e_ref, lidx_ref, xlp_ref, xval_ref, tab_hbm = refs[1:7]
        if skip_a:
            flat = [r[:] for r in refs[7:-3]]
            a_out, e_out = None, refs[-3]
        else:
            flat = [r[:] for r in refs[7:-4]]
            a_out, e_out = refs[-4], refs[-3]
        win, sem = refs[-2], refs[-1]
        b = pl.program_id(0)
        start = pl.multiple_of(starts_ref[b], 8)
        if ring:
            rot, wait = _ring_dma(tab_hbm, win, sem, starts_ref, b, start,
                                  window, stride)
        else:
            rot = None
            dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(start, window), :],
                                        win, sem)
            dma.start()
            wait = dma.wait
        aw, ab, aln, ew, eb, eln = _split(flat, n_a, n_e, has_aln, has_eln)
        wait()
        vsg, _, _ = _wg_gather_block(lidx_ref[:], xlp_ref[0], xval_ref[0],
                                     win[:], block_rows, window,
                                     a_ref.dtype, rot=rot)
        a_fold, e_new = _fwd_math_folded(a_ref[:], vsg.astype(a_ref.dtype),
                                         e_ref[:], k, aw, ab, aln,
                                         ew, eb, eln, out_selu=out_selu,
                                         out_a=not skip_a)
        if not skip_a:
            a_out[:] = a_fold.astype(out_dtype)
        e_out[:] = e_new.astype(out_dtype)
    return kernel


def _make_bwd_kernel_fold(n_a, n_e, has_aln, has_eln, k, in_dtype,
                          out_selu, window, block_rows, stride=0,
                          ring=False, skip_a=False):
    n_params = 2 * n_a + 2 * n_e + (2 if has_aln else 0) \
        + (2 if has_eln else 0)
    rolling = stride > 0

    def kernel(*refs):
        starts_ref = refs[0]
        idx = 1
        a_ref, e_ref, lidx_ref, xlp_ref, xval_ref, tab_hbm = \
            refs[idx:idx + 6]
        idx += 6
        if skip_a:
            ga_ref, ge_ref = None, refs[idx]
            idx += 1
        else:
            ga_ref, ge_ref = refs[idx], refs[idx + 1]
            idx += 2
        if not rolling:
            idx += 1                   # zero-initialised dtab alias input
        flat = [r[:] for r in refs[idx:idx + n_params]]
        idx += n_params
        da_ref, de_ref, dxval_ref, dtab_hbm = refs[idx:idx + 4]
        idx += 4
        dparams = refs[idx:idx + n_params]
        idx += n_params
        # win2 doubles as the rolling dtab accumulator (f32)
        win, win2, sem, sem2 = refs[idx:idx + 4]
        idx += 4
        sparams = refs[idx:idx + n_params]

        b = pl.program_id(0)
        start = pl.multiple_of(starts_ref[b], 8)
        if ring:
            rot, wait = _ring_dma(tab_hbm, win, sem, starts_ref, b, start,
                                  window, stride)
        else:
            rot = None
            dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(start, window), :],
                                        win, sem)
            dma.start()
            wait = dma.wait

        if rolling:
            prev = pl.multiple_of(starts_ref[jnp.maximum(b - 1, 0)], 8)
            shift = start - prev
            acc = win2
            if ring:
                # acc rows are in ring (physical) coordinates too — the
                # slot of the expiring table rows [prev, prev+stride) is
                # complete once the window moves past them
                s0 = starts_ref[0]
                phys_prev = pl.multiple_of(
                    jax.lax.rem(prev - s0 + window, window), 8)
                flush = pltpu.make_async_copy(
                    acc.at[pl.ds(phys_prev, stride), :],
                    dtab_hbm.at[pl.ds(prev, stride), :], sem2)
            else:
                flush = pltpu.make_async_copy(
                    acc.at[pl.ds(0, stride), :],
                    dtab_hbm.at[pl.ds(prev, stride), :], sem2)

            @pl.when(shift > 0)
            def _flush_start():
                flush.start()

        aw, ab, aln, ew, eb, eln = _split(flat, n_a, n_e, has_aln, has_eln)
        s_aw, s_ab, s_aln, s_ew, s_eb, s_eln = _split(
            list(sparams), n_a, n_e, has_aln, has_eln)

        step = pl.program_id(0)
        nsteps = pl.num_programs(0)

        @pl.when(step == 0)
        def _init():
            for s in sparams:
                s[:] = jnp.zeros_like(s)
            if rolling:
                win2[:] = jnp.zeros_like(win2)

        a, e = a_ref[:], e_ref[:]
        wait()
        vsg_f32, oh, ohx = _wg_gather_block(
            lidx_ref[:], xlp_ref[0], xval_ref[0], win[:],
            block_rows, window, a.dtype, rot=rot)
        vsg = vsg_f32.astype(a.dtype)
        (outs, e_new, h1s, pres, xhats, rstds, aggr, hn, n_pre,
         n_xhat, n_rstd) = _fwd_math_folded(
            a, vsg, e, k, aw, ab, aln, ew, eb, eln, save=True)

        ge = ge_ref[:].astype(jnp.float32)
        if out_selu:
            ge = ge * _dselu(e_new)

        # ---- edge (line-graph node) chain backward -------------------------
        if has_eln:
            s_eln[0][:] += (ge * n_xhat).sum(axis=0, keepdims=True)
            s_eln[1][:] += ge.sum(axis=0, keepdims=True)
            da = _ln_backward(ge, n_xhat, n_rstd, eln[0])
        else:
            da = ge
        dhn = _chain_backward(da, hn, n_pre, ew[1:], eb[1:],
                              s_ew[1:], s_eb[1:], preact_input=True)
        faggr = aggr.shape[-1]
        wa2, wv = ew[0][:faggr], ew[0][faggr:]
        dhn_c = dhn.astype(ew[0].dtype)
        s_ew[0][:faggr] += jnp.dot(aggr.astype(ew[0].dtype).T, dhn_c,
                                   preferred_element_type=jnp.float32)
        s_ew[0][faggr:] += jnp.dot(e.astype(ew[0].dtype).T, dhn_c,
                                   preferred_element_type=jnp.float32)
        s_eb[0][:] += dhn.sum(axis=0, keepdims=True)
        daggr = jnp.dot(dhn_c, wa2.T, preferred_element_type=jnp.float32)
        de = jnp.dot(dhn_c, wv.T, preferred_element_type=jnp.float32)

        # ---- angle chain backward, per lane block --------------------------
        fa = a.shape[-1] // k
        H = vsg.shape[-1] // k
        w1 = aw[0]
        wa, wr = w1[:fa], w1[fa:]
        sum_dh1 = None
        da_cols, dh1_cols = [], []
        for j in range(k):
            if skip_a:
                # a′ has no consumer (last layer of a level's final MP
                # group) — its cotangent is identically zero
                d_out = daggr / k
            else:
                ga_j = ga_ref[:, j * H:(j + 1) * H].astype(jnp.float32)
                if out_selu:
                    ga_j = ga_j * _dselu(outs[j])
                d_out = ga_j + daggr / k
            if has_aln:
                s_aln[0][:] += (d_out * xhats[j]).sum(axis=0, keepdims=True)
                s_aln[1][:] += d_out.sum(axis=0, keepdims=True)
                da_j = _ln_backward(d_out, xhats[j], rstds[j], aln[0])
            else:
                da_j = d_out
            dh1 = _chain_backward(da_j, h1s[j], pres[j], aw[1:], ab[1:],
                                  s_aw[1:], s_ab[1:], preact_input=True)
            dh1_c = dh1.astype(aw[0].dtype)
            s_aw[0][:fa] += jnp.dot(
                a[:, j * fa:(j + 1) * fa].astype(aw[0].dtype).T, dh1_c,
                preferred_element_type=jnp.float32)
            s_ab[0][:] += dh1.sum(axis=0, keepdims=True)
            sum_dh1 = dh1 if sum_dh1 is None else sum_dh1 + dh1
            da_cols.append(jnp.dot(dh1_c, wa.T,
                                   preferred_element_type=jnp.float32))
            dh1_cols.append(dh1_c)
        sum_c = sum_dh1.astype(aw[0].dtype)
        s_aw[0][fa:] += jnp.dot(e.astype(aw[0].dtype).T, sum_c,
                                preferred_element_type=jnp.float32)
        de = de + jnp.dot(sum_c, wr.T, preferred_element_type=jnp.float32)
        da_ref[:] = jnp.concatenate(da_cols, axis=-1).astype(in_dtype)
        de_ref[:] = de.astype(in_dtype)

        # ---- windowed-gather backward: dtab + exception grads --------------
        dh1_fold = jnp.concatenate(dh1_cols, axis=-1)       # [B, k·H]
        if not rolling:
            rd = pltpu.make_async_copy(dtab_hbm.at[pl.ds(start, window), :],
                                       win2, sem2)
            rd.start()
        dxval_ref[0] = jnp.dot(ohx.T, dh1_fold,
                               preferred_element_type=jnp.float32).astype(
                                   dxval_ref.dtype)
        upd = jnp.dot(oh.T, dh1_fold, preferred_element_type=jnp.float32)
        if rolling and ring:
            # oh is already in ring coordinates, so upd accumulates into
            # the matching acc slots; on shift, the expired slot has been
            # flushed — zero it for its new table rows (no window-wide
            # VMEM slide)
            @pl.when(shift > 0)
            def _recycle():
                flush.wait()
                acc[pl.ds(phys_prev, stride), :] = jnp.zeros(
                    (stride, acc.shape[1]), acc.dtype)
            acc[:] += upd

            @pl.when(step == nsteps - 1)
            def _flush_tail_ring():
                # final window rows live at physical slot p → table row
                # start + ((p·stride − rot) mod window); one DMA per slot
                for p in range(window // stride):
                    dst = pl.multiple_of(
                        start + jax.lax.rem(p * stride - rot + window,
                                            window), 8)
                    fin = pltpu.make_async_copy(
                        acc.at[pl.ds(p * stride, stride), :],
                        dtab_hbm.at[pl.ds(dst, stride), :], sem2)
                    fin.start()
                    fin.wait()
        elif rolling:
            @pl.when(shift > 0)
            def _slide():
                flush.wait()
                acc[0:window - stride, :] = acc[stride:window, :]
                acc[window - stride:window, :] = jnp.zeros(
                    (stride, acc.shape[1]), acc.dtype)
            acc[:] += upd

            @pl.when(step == nsteps - 1)
            def _flush_tail():
                fin = pltpu.make_async_copy(
                    acc, dtab_hbm.at[pl.ds(start, window), :], sem2)
                fin.start()
                fin.wait()
        else:
            rd.wait()
            win2[:] += upd
            wr_dma = pltpu.make_async_copy(
                win2, dtab_hbm.at[pl.ds(start, window), :], sem2)
            wr_dma.start()
            wr_dma.wait()

        @pl.when(step == nsteps - 1)
        def _write():
            for d, s in zip(dparams, sparams):
                d[:] = s[:]
    return kernel


def _fold_specs(a, e, lidx, xlp, xval, block):
    X = xlp.shape[-1]
    return [
        pl.BlockSpec((block, a.shape[-1]), lambda b, s: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, e.shape[-1]), lambda b, s: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), lambda b, s: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, X), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, X, xval.shape[-1]), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]


_FOLD_STATICS = (8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19)


@functools.partial(jax.custom_vjp, nondiff_argnums=_FOLD_STATICS)
def _edgemp_fold(a, tab, e, xval, flat_params, lidx, starts, xlp,
                 n_a, n_e, has_aln, has_eln, k, block, interpret, out_selu,
                 window, stride, ring, skip_a):
    return _edgemp_fold_fwd_impl(a, tab, e, xval, flat_params, lidx, starts,
                                 xlp, n_a, n_e, has_aln, has_eln, k, block,
                                 interpret, out_selu, window, stride, ring,
                                 skip_a)


def _edgemp_fold_fwd_impl(a, tab, e, xval, flat_params, lidx, starts, xlp,
                          n_a, n_e, has_aln, has_eln, k, block, interpret,
                          out_selu, window, stride=0, ring=False,
                          skip_a=False):
    E = a.shape[0]
    grid = (E // block,)
    kH = tab.shape[-1]
    H = kH // k
    in_specs = _fold_specs(a, e, lidx, xlp, xval, block)
    inv2 = lambda b, s: (0, 0)
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, inv2,
                                     memory_space=pltpu.VMEM))
    kernel = _make_fwd_kernel_fold(n_a, n_e, has_aln, has_eln, k, a.dtype,
                                   out_selu, window, block, stride, ring,
                                   skip_a)
    a_spec = pl.BlockSpec((block, kH), lambda b, s: (b, 0),
                          memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((block, H), lambda b, s: (b, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=((e_spec,) if skip_a else (a_spec, e_spec)),
        scratch_shapes=[pltpu.VMEM((window, kH), tab.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    a_shape = jax.ShapeDtypeStruct((E, kH), a.dtype)
    e_shape = jax.ShapeDtypeStruct((E, H), a.dtype)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=((e_shape,) if skip_a else (a_shape, e_shape)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(starts, a, e, lidx, xlp, xval, tab, *flat_params)
    if skip_a:
        return outs[0]
    return outs


def _edgemp_fold_vjp_fwd(a, tab, e, xval, flat_params, lidx, starts, xlp,
                         n_a, n_e, has_aln, has_eln, k, block, interpret,
                         out_selu, window, stride, ring, skip_a):
    out = _edgemp_fold_fwd_impl(a, tab, e, xval, flat_params, lidx, starts,
                                xlp, n_a, n_e, has_aln, has_eln, k, block,
                                interpret, out_selu, window, stride, ring,
                                skip_a)
    return out, (a, tab, e, xval, flat_params, lidx, starts, xlp)


def _edgemp_fold_vjp_bwd(n_a, n_e, has_aln, has_eln, k, block, interpret,
                         out_selu, window, stride, ring, skip_a, res, g):
    a, tab, e, xval, flat_params, lidx, starts, xlp = res
    if skip_a:
        ga, ge = None, g
    else:
        ga, ge = g
    rolling = stride > 0
    E = a.shape[0]
    grid = (E // block,)
    kH = tab.shape[-1]
    H = kH // k
    X = xlp.shape[-1]
    in_specs = _fold_specs(a, e, lidx, xlp, xval, block)
    ct_specs = ([] if skip_a else
                [pl.BlockSpec((block, kH), lambda b, s: (b, 0),
                              memory_space=pltpu.VMEM)])
    ct_specs.append(pl.BlockSpec((block, H), lambda b, s: (b, 0),
                                 memory_space=pltpu.VMEM))
    if not rolling:
        ct_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    in_specs = in_specs + ct_specs
    inv2 = lambda b, s: (0, 0)
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, inv2,
                                     memory_space=pltpu.VMEM))
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype),
                  jax.ShapeDtypeStruct(e.shape, e.dtype),
                  jax.ShapeDtypeStruct(xval.shape, jnp.float32),
                  jax.ShapeDtypeStruct(tab.shape, jnp.float32)]
    out_specs = [pl.BlockSpec((block, a.shape[-1]), lambda b, s: (b, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((block, e.shape[-1]), lambda b, s: (b, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, X, kH), lambda b, s: (b, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pl.ANY)]
    for p in flat_params:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(p.shape, inv2,
                                      memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((window, kH), tab.dtype),
               pltpu.VMEM((window, kH), jnp.float32),
               pltpu.SemaphoreType.DMA(()),
               pltpu.SemaphoreType.DMA(())]
    scratch += [pltpu.VMEM(p.shape, jnp.float32) for p in flat_params]
    kernel = _make_bwd_kernel_fold(n_a, n_e, has_aln, has_eln, k, a.dtype,
                                   out_selu, window, block, stride, ring,
                                   skip_a)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=tuple(out_specs), scratch_shapes=scratch)
    operands = [starts, a, e, lidx, xlp, xval, tab]
    if not skip_a:
        operands.append(ga)
    operands.append(ge)
    aliases = {}
    if not rolling:
        aliases = {len(operands): 3}    # zeros -> dtab output
        operands.append(jnp.zeros(tab.shape, jnp.float32))
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=tuple(out_shapes),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands, *flat_params)
    da, de, dxval, dtab = outs[0], outs[1], outs[2], outs[3]
    dflat = tuple(outs[4:])
    return (da, dtab.astype(tab.dtype), de, dxval.astype(xval.dtype), dflat,
            None, None, None)


_edgemp_fold.defvjp(_edgemp_fold_vjp_fwd, _edgemp_fold_vjp_bwd)


def supports_folded(plan, angle_mlp: dict, edge_mlp: dict, E: int, V: int,
                    k: int, fa: int, fe: int) -> bool:
    """Gate: blocked-exception plan present, edge-row blocking fits, all
    lane dims 128-aligned, VMEM working set bounded (block·k·H)."""
    if plan is None or len(plan) < 8 or plan[6] is None:
        return False
    window, block = int(plan[4]), int(plan[5])
    stride = int(plan[8]) if len(plan) > 8 and plan[8] is not None else 0
    if block % 8 or E % block or V < window:
        return False
    if stride and (window % stride or V % stride):
        return False
    dims = [fa, fe] \
        + [l["w"].shape[1] for l in angle_mlp["layers"]] \
        + [l["w"].shape[1] for l in edge_mlp["layers"]]
    if any(d % 128 for d in dims):
        return False
    H = angle_mlp["layers"][-1]["w"].shape[1]
    # backward working set ≈ (3 + n_layers)·block·k·H f32 + 2 windows;
    # measured on v5e: block=320 (k=5, H=128) compiles at ~13 MB scoped
    # VMEM, block=640 OOMs at 24.7 MB vs the 16 MB limit — the bound must
    # reject the latter
    return block * k * H <= 64 * 1024 * 4


def edge_mp_folded(angle_mlp: dict, edge_mlp: dict, a, tab, e, k: int,
                   plan, *, compute_dtype=jnp.float32,
                   interpret: bool = False,
                   out_activation: str = None,
                   skip_a_out: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run one EdgeMP layer through the folded kernel.

    ``a`` is ``[E, k, fa]`` angles, ``tab`` the ``[V, k·H]`` angle-source
    table (``(e@Ws).reshape(V, k·H)``, computed by the caller so Ws's
    cotangent flows through XLA), ``e`` the ``[E, fe]`` edge states.
    Returns ``(e_new, a_new[E, k, H])``.

    ``skip_a_out``: the caller asserts ``a′`` has no consumer (last layer
    of a level's final MP group) — the kernel then skips the [E, k·H]
    store and the backward skips its zero cotangent read; the returned
    ``a`` is the *input* angles, to be ignored.
    """
    if out_activation not in (None, "selu"):
        raise ValueError(f"unsupported out_activation {out_activation!r}")
    E, _, fa = a.shape
    starts, lidx = plan[0], plan[1]
    window = int(plan[4])
    block = int(plan[5])
    exc_lpos, exc_nidx = plan[6], plan[7]
    stride = int(plan[8]) if len(plan) > 8 and plan[8] is not None else 0
    cd = compute_dtype
    act = cd if cd != jnp.float32 else jnp.float32
    fe = e.shape[-1]
    w1 = angle_mlp["layers"][0]["w"]
    wa_wr = jnp.concatenate([w1[:fa], w1[fa + fe:]], axis=0).astype(cd)
    aw = (wa_wr,) + tuple(l["w"].astype(cd)
                          for l in angle_mlp["layers"][1:])
    ab = tuple(l["b"].reshape(1, -1).astype(jnp.float32)
               for l in angle_mlp["layers"])
    aln = ((angle_mlp["ln"]["scale"].reshape(1, -1).astype(jnp.float32),
            angle_mlp["ln"]["bias"].reshape(1, -1).astype(jnp.float32))
           if "ln" in angle_mlp else ())
    ew = tuple(l["w"].astype(cd) for l in edge_mlp["layers"])
    eb = tuple(l["b"].reshape(1, -1).astype(jnp.float32)
               for l in edge_mlp["layers"])
    eln = ((edge_mlp["ln"]["scale"].reshape(1, -1).astype(jnp.float32),
            edge_mlp["ln"]["bias"].reshape(1, -1).astype(jnp.float32))
           if "ln" in edge_mlp else ())
    flat = (*aw, *ab, *aln, *ew, *eb, *eln)
    tab = tab.astype(act)
    nblocks, X = exc_nidx.shape
    xval = jnp.take(tab, exc_nidx.reshape(-1), axis=0,
                    mode="clip").reshape(nblocks, X, tab.shape[-1])
    xlp3 = exc_lpos.reshape(nblocks, 1, X)
    a_fold = a.reshape(E, k * fa).astype(act)
    # ring-buffer window maintenance (stride-new rows per block instead of
    # the full-window re-DMA); requires the rolling-start invariant
    import os
    # default ON: measured 84.2 -> 81.6 ms on the REMuS 3-scale step (the
    # folded window re-DMA is window/stride = 16x the table per layer)
    ring = (stride > 0 and window % stride == 0
            and os.environ.get("GRAPHS4CFD_FOLD_RING", "1")
            not in ("0", "false"))
    out = _edgemp_fold(a_fold, tab, e.astype(act), xval, flat,
                       lidx, starts, xlp3,
                       len(aw), len(ew), bool(aln), bool(eln), k,
                       block, interpret,
                       out_activation == "selu", window, stride,
                       ring, skip_a_out)
    if skip_a_out:
        # a′ was never stored (caller asserts it has no consumer); return
        # None so accidental consumption fails loudly at trace time
        # (VERDICT r4 #5 — same contract as pallas_gnblock/skip_e_out)
        return out, None
    a_new, e_new = out
    return e_new, a_new.reshape(E, k, -1)
