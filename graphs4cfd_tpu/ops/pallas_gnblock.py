"""Pallas fused GN-block kernel — one VMEM pass per message-passing layer.

Fuses the whole fixed-indegree GN block (``nn/blocks.py:gn_block``; the
reference's ``GNBlock``, ``/root/reference/graphs4cfd/nn/blocks.py:147-190``)
for the canonical receiver-sorted exact-k edge layout:

    h₁    = e·We + vsg + repeatₖ(v·Wr) + b₁        (fused first edge layer)
    e'    = SELU-chain + LayerNorm over h₁          (edge MLP tail)
    aggr  = meanₖ(e')                               (fixed-k aggregation)
    hₙ    = aggr·Wa + v·Wv + bₙ                     (fused first node layer)
    v'    = SELU-chain + LayerNorm over hₙ          (node MLP tail)

With an edge block of ``k·B`` rows per node block of ``B`` rows, receivers
are local to the block, so aggregation is an in-VMEM reshape-mean and the
kernel reads (e, vsg, v) once and writes (e', v') once — everything between
lives in VMEM.  The sender projection ``vsg = (v·Ws)[senders]`` stays
outside (a global gather), keeping a clean custom-VJP boundary: its
cotangent flows back through XLA's gather transpose.

The backward kernel recomputes all intermediates per block (remat) and
accumulates weight gradients in f32 VMEM scratch across the sequential TPU
grid.  ``d e'`` receives both the downstream edge-state cotangent and the
aggregation path: ``de' = g_e + repeatₖ(daggr)/k``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mlp import _selu, _dselu, _chain_forward, _apply_ln

import os
DEFAULT_NODE_BLOCK = int(os.environ.get("GRAPHS4CFD_GN_BLOCK", "256"))


def _ln_backward(g, xhat, rstd, scale):
    dxhat = g * scale[0]
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    return (dxhat - m1 - xhat * m2) * rstd


def _chain_backward(da, x_first, preacts, ws, bs, sws, sbs,
                    preact_input: bool):
    """Backprop a Linear/SELU chain given d(pre-LN output); accumulates dW
    into scratch refs; returns d(chain input) (pre-activation if
    ``preact_input``)."""
    n = len(ws)
    for i in range(n - 1, -1, -1):
        if i > 0:
            h_prev = _selu(preacts[i - 1])
        elif preact_input:
            h_prev = _selu(x_first.astype(jnp.float32))
        else:
            h_prev = x_first.astype(jnp.float32)
        da_c = da.astype(ws[i].dtype)
        sws[i][:] += jnp.dot(h_prev.astype(ws[i].dtype).T, da_c,
                             preferred_element_type=jnp.float32)
        sbs[i][:] += da.sum(axis=0, keepdims=True)
        dh = jnp.dot(da_c, ws[i].T, preferred_element_type=jnp.float32)
        if i > 0:
            da = dh * _dselu(preacts[i - 1])
        elif preact_input:
            return dh * _dselu(x_first.astype(jnp.float32))
        else:
            return dh
    return da


def _fwd_math(e, vsg, v, k, ew, eb, eln, nw, nb, nln, save=False,
              out_selu=False):
    """Shared forward math on one block. Returns e_new, v_new (+ residual
    intermediates when ``save``; the saved values are pre-SELU so the
    backward can form the activation derivative).

    ``out_selu`` fuses the engines' inter-layer SELU
    (``mus_gnn.py:320-366``: SELU after every MP layer) into the kernel —
    aggregation still consumes the *pre*-SELU edge state, only the block
    outputs are activated.  Without the fusion the activation is a
    separate XLA pass that re-reads and re-writes both outputs from HBM
    (pallas_call is an opaque fusion barrier)."""
    Eb = e.shape[0]
    B = Eb // k
    # first edge layer (We is ew[0][:Fe], Wr is ew[0][Fe:])
    fe = e.shape[-1]
    we, wr = ew[0][:fe], ew[0][fe:]
    h1 = jnp.dot(e, we, preferred_element_type=jnp.float32)
    h1 = h1 + vsg.astype(jnp.float32)
    vr = jnp.dot(v, wr, preferred_element_type=jnp.float32)
    h1 = h1 + jnp.repeat(vr, k, axis=0)
    h1 = h1 + eb[0][0]
    e_pre, e_preacts = _chain_forward(h1, ew[1:], eb[1:], True)
    if eln is not None:
        e_new, e_xhat, e_rstd = _apply_ln(e_pre, eln[0], eln[1])
    else:
        e_new, e_xhat, e_rstd = e_pre, None, None
    aggr = e_new.reshape(B, k, -1).mean(axis=1)
    fa = aggr.shape[-1]
    wa, wv = nw[0][:fa], nw[0][fa:]
    hn = jnp.dot(aggr.astype(nw[0].dtype), wa,
                 preferred_element_type=jnp.float32) \
        + jnp.dot(v, wv, preferred_element_type=jnp.float32) + nb[0][0]
    v_pre, n_preacts = _chain_forward(hn, nw[1:], nb[1:], True)
    if nln is not None:
        v_new, n_xhat, n_rstd = _apply_ln(v_pre, nln[0], nln[1])
    else:
        v_new, n_xhat, n_rstd = v_pre, None, None
    if not save:
        if out_selu:
            return _selu(e_new), _selu(v_new)
        return e_new, v_new
    return (e_new, v_new, h1, e_preacts, e_xhat, e_rstd, aggr, hn,
            n_preacts, n_xhat, n_rstd)


def _split(flat, n_e, n_n, has_eln, has_nln):
    i = 0
    ew = flat[i:i + n_e]; i += n_e
    eb = flat[i:i + n_e]; i += n_e
    eln = flat[i:i + 2] if has_eln else None; i += 2 if has_eln else 0
    nw = flat[i:i + n_n]; i += n_n
    nb = flat[i:i + n_n]; i += n_n
    nln = flat[i:i + 2] if has_nln else None; i += 2 if has_nln else 0
    return ew, eb, eln, nw, nb, nln


def _make_fwd_kernel(n_e, n_n, has_eln, has_nln, k, out_dtype, out_selu,
                     skip_e=False):
    def kernel(*refs):
        e_ref, vsg_ref, v_ref = refs[0], refs[1], refs[2]
        if skip_e:
            flat = [r[:] for r in refs[3:-1]]
            e_out, v_out = None, refs[-1]
        else:
            flat = [r[:] for r in refs[3:-2]]
            e_out, v_out = refs[-2], refs[-1]
        ew, eb, eln, nw, nb, nln = _split(flat, n_e, n_n, has_eln, has_nln)
        e_new, v_new = _fwd_math(e_ref[:], vsg_ref[:], v_ref[:], k,
                                 ew, eb, eln, nw, nb, nln,
                                 out_selu=out_selu)
        if not skip_e:
            e_out[:] = e_new.astype(out_dtype)
        v_out[:] = v_new.astype(out_dtype)
    return kernel


def _make_bwd_kernel(n_e, n_n, has_eln, has_nln, k, in_dtype, out_selu,
                     skip_e=False):
    n_params = 2 * n_e + 2 * n_n + (2 if has_eln else 0) \
        + (2 if has_nln else 0)

    def kernel(*refs):
        idx = 0
        e_ref, vsg_ref, v_ref = refs[idx], refs[idx + 1], refs[idx + 2]
        idx += 3
        if skip_e:
            # e' had no consumer: its cotangent is identically zero and is
            # neither materialised in HBM nor read here
            ge_ref, gv_ref = None, refs[idx]
            idx += 1
        else:
            ge_ref, gv_ref = refs[idx], refs[idx + 1]
            idx += 2
        flat = [r[:] for r in refs[idx:idx + n_params]]
        idx += n_params
        de_ref, dvsg_ref, dv_ref = refs[idx], refs[idx + 1], refs[idx + 2]
        idx += 3
        dparams = refs[idx:idx + n_params]
        idx += n_params
        sparams = refs[idx:idx + n_params]

        ew, eb, eln, nw, nb, nln = _split(flat, n_e, n_n, has_eln, has_nln)
        # scratch views in the same order as flat
        s_ew, s_eb, s_eln, s_nw, s_nb, s_nln = _split(
            list(sparams), n_e, n_n, has_eln, has_nln)

        step = pl.program_id(0)
        nsteps = pl.num_programs(0)

        @pl.when(step == 0)
        def _init():
            for s in sparams:
                s[:] = jnp.zeros_like(s)

        e, vsg, v = e_ref[:], vsg_ref[:], v_ref[:]
        (e_new, v_new, h1, e_preacts, e_xhat, e_rstd, aggr, hn,
         n_preacts, n_xhat, n_rstd) = _fwd_math(
            e, vsg, v, k, ew, eb, eln, nw, nb, nln, save=True)
        Eb = e.shape[0]
        B = Eb // k
        gv = gv_ref[:].astype(jnp.float32)
        ge = None if skip_e else ge_ref[:].astype(jnp.float32)
        if out_selu:
            # cotangents arrive w.r.t. selu(outputs); e_new/v_new from the
            # recompute are the pre-SELU values.
            gv = gv * _dselu(v_new)
            if ge is not None:
                ge = ge * _dselu(e_new)

        # ---- node chain backward -----------------------------------------
        if has_nln:
            s_nln[0][:] += (gv * n_xhat).sum(axis=0, keepdims=True)
            s_nln[1][:] += gv.sum(axis=0, keepdims=True)
            da = _ln_backward(gv, n_xhat, n_rstd, nln[0])
        else:
            da = gv
        # chain layers nw[1:] take hn as pre-activation input
        dhn = _chain_backward(da, hn, n_preacts, nw[1:], nb[1:],
                              s_nw[1:], s_nb[1:], preact_input=True)
        # first node layer: hn = aggr@Wa + v@Wv + nb1
        fa = aggr.shape[-1]
        wa, wv = nw[0][:fa], nw[0][fa:]
        dhn_c = dhn.astype(nw[0].dtype)
        s_nw[0][:fa] += jnp.dot(aggr.astype(nw[0].dtype).T, dhn_c,
                                preferred_element_type=jnp.float32)
        s_nw[0][fa:] += jnp.dot(v.astype(nw[0].dtype).T, dhn_c,
                                preferred_element_type=jnp.float32)
        s_nb[0][:] += dhn.sum(axis=0, keepdims=True)
        daggr = jnp.dot(dhn_c, wa.T, preferred_element_type=jnp.float32)
        dv = jnp.dot(dhn_c, wv.T, preferred_element_type=jnp.float32)

        # ---- aggregation backward: de' += repeat(daggr)/k ----------------
        de_new = jnp.repeat(daggr / k, k, axis=0)
        if ge is not None:
            de_new = de_new + ge

        # ---- edge chain backward -----------------------------------------
        if has_eln:
            s_eln[0][:] += (de_new * e_xhat).sum(axis=0, keepdims=True)
            s_eln[1][:] += de_new.sum(axis=0, keepdims=True)
            da = _ln_backward(de_new, e_xhat, e_rstd, eln[0])
        else:
            da = de_new
        dh1 = _chain_backward(da, h1, e_preacts, ew[1:], eb[1:],
                              s_ew[1:], s_eb[1:], preact_input=True)
        # first edge layer: h1 = e@We + vsg + repeat(v@Wr) + b1
        fe = e.shape[-1]
        we, wr = ew[0][:fe], ew[0][fe:]
        dh1_c = dh1.astype(ew[0].dtype)
        s_ew[0][:fe] += jnp.dot(e.astype(ew[0].dtype).T, dh1_c,
                                preferred_element_type=jnp.float32)
        dvr = dh1.reshape(B, k, -1).sum(axis=1)
        s_ew[0][fe:] += jnp.dot(v.astype(ew[0].dtype).T,
                                dvr.astype(ew[0].dtype),
                                preferred_element_type=jnp.float32)
        s_eb[0][:] += dh1.sum(axis=0, keepdims=True)
        de_ref[:] = jnp.dot(dh1_c, we.T,
                            preferred_element_type=jnp.float32).astype(
                                in_dtype)
        dvsg_ref[:] = dh1.astype(in_dtype)
        dv = dv + jnp.dot(dvr.astype(ew[0].dtype), wr.T,
                          preferred_element_type=jnp.float32)
        dv_ref[:] = dv.astype(in_dtype)

        @pl.when(step == nsteps - 1)
        def _write():
            for d, s in zip(dparams, sparams):
                d[:] = s[:]
    return kernel


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _gn_fused(e, vsg, v, flat_params, n_e, n_n, has_eln, has_nln, k, block,
              interpret, out_selu, skip_e=False):
    return _gn_fused_fwd_impl(e, vsg, v, flat_params, n_e, n_n, has_eln,
                              has_nln, k, block, interpret, out_selu,
                              skip_e)


def _common_specs(e, vsg, v, flat_params, k, block):
    B = block
    Eb = k * B
    H = vsg.shape[-1]
    in_specs = [
        pl.BlockSpec((Eb, e.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Eb, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, v.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inv2 = lambda i: (0, 0)
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, inv2,
                                     memory_space=pltpu.VMEM))
    return in_specs, Eb, H


def _gn_fused_fwd_impl(e, vsg, v, flat_params, n_e, n_n, has_eln, has_nln,
                       k, block, interpret, out_selu, skip_e=False):
    grid = (v.shape[0] // block,)
    in_specs, Eb, H = _common_specs(e, vsg, v, flat_params, k, block)
    kernel = _make_fwd_kernel(n_e, n_n, has_eln, has_nln, k, e.dtype,
                              out_selu, skip_e)
    e_spec = pl.BlockSpec((Eb, H), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((block, H), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    e_shape = jax.ShapeDtypeStruct((e.shape[0], H), e.dtype)
    v_shape = jax.ShapeDtypeStruct((v.shape[0], H), e.dtype)
    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=((v_spec,) if skip_e else (e_spec, v_spec)),
        out_shape=((v_shape,) if skip_e else (e_shape, v_shape)),
        interpret=interpret,
    )(e, vsg, v, *flat_params)
    # skip_e: single (v_new) output — no [E, H] e' store at all
    return out[0] if skip_e else out


def _gn_vjp_fwd(e, vsg, v, flat_params, n_e, n_n, has_eln, has_nln, k,
                block, interpret, out_selu, skip_e=False):
    out = _gn_fused_fwd_impl(e, vsg, v, flat_params, n_e, n_n, has_eln,
                             has_nln, k, block, interpret, out_selu,
                             skip_e)
    return out, (e, vsg, v, flat_params)


def _gn_vjp_bwd(n_e, n_n, has_eln, has_nln, k, block, interpret, out_selu,
                skip_e, res, g):
    e, vsg, v, flat_params = res
    if skip_e:
        ge, gv = None, g
    else:
        ge, gv = g
    grid = (v.shape[0] // block,)
    in_specs, Eb, H = _common_specs(e, vsg, v, flat_params, k, block)
    # insert cotangent specs after (e, vsg, v); skip_e has no e' cotangent
    ct_specs = ([] if skip_e else
                [pl.BlockSpec((Eb, H), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]) \
        + [pl.BlockSpec((block, H), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
    in_specs = in_specs[:3] + ct_specs + in_specs[3:]
    inv2 = lambda i: (0, 0)
    out_shapes = [jax.ShapeDtypeStruct(e.shape, e.dtype),
                  jax.ShapeDtypeStruct(vsg.shape, vsg.dtype),
                  jax.ShapeDtypeStruct(v.shape, v.dtype)]
    out_specs = [pl.BlockSpec((Eb, e.shape[-1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((Eb, H), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((block, v.shape[-1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for p in flat_params:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(p.shape, inv2,
                                      memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM(p.shape, jnp.float32) for p in flat_params]
    kernel = _make_bwd_kernel(n_e, n_n, has_eln, has_nln, k, e.dtype,
                              out_selu, skip_e)
    cts = (gv,) if skip_e else (ge, gv)
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes), scratch_shapes=scratch,
        interpret=interpret,
    )(e, vsg, v, *cts, *flat_params)
    de, dvsg, dv = outs[0], outs[1], outs[2]
    return de, dvsg, dv, tuple(outs[3:])


_gn_fused.defvjp(_gn_vjp_fwd, _gn_vjp_bwd)


def supports(edge_mlp: dict, node_mlp: dict, num_nodes: int, fe: int,
             fv: int, k: int, block: int = DEFAULT_NODE_BLOCK) -> bool:
    """Shape gate: node count divisible by the block, all feature dims
    lane-aligned (multiples of 128)."""
    if num_nodes % block:
        return False
    dims = [fe, fv] \
        + [l["w"].shape[1] for l in edge_mlp["layers"]] \
        + [l["w"].shape[1] for l in node_mlp["layers"]]
    return all(d % 128 == 0 for d in dims)


def gn_block_fused(edge_mlp: dict, node_mlp: dict, e, vsg, v, k: int, *,
                   compute_dtype=jnp.float32,
                   block: int = DEFAULT_NODE_BLOCK,
                   interpret: bool = False,
                   out_activation: str = None,
                   skip_e_out: bool = False) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """Run the fused GN block.

    ``vsg`` is the pre-gathered sender projection ``(v@Ws)[senders]``;
    the edge-MLP first-layer weight passed to the kernel is ``[We; Wr]``
    (the Ws rows are consumed outside).  ``out_activation='selu'`` fuses
    the engines' inter-layer SELU into the kernel outputs.

    ``skip_e_out``: the caller asserts e' has no consumer — the kernel
    skips the [E, H] e' store and the backward never materialises/reads
    its zero cotangent; the returned edge state is ``None`` (loud
    contract, VERDICT r4 #5).
    """
    if out_activation not in (None, "selu"):
        raise ValueError(f"unsupported out_activation {out_activation!r}")
    cd = compute_dtype
    act = cd if cd != jnp.float32 else jnp.float32
    fe = e.shape[-1]
    fv = v.shape[-1]
    w1 = edge_mlp["layers"][0]["w"]
    we_wr = jnp.concatenate([w1[:fe], w1[fe + fv:]], axis=0).astype(cd)
    ew = (we_wr,) + tuple(l["w"].astype(cd)
                          for l in edge_mlp["layers"][1:])
    eb = tuple(l["b"].reshape(1, -1).astype(jnp.float32)
               for l in edge_mlp["layers"])
    eln = ((edge_mlp["ln"]["scale"].reshape(1, -1).astype(jnp.float32),
            edge_mlp["ln"]["bias"].reshape(1, -1).astype(jnp.float32))
           if "ln" in edge_mlp else ())
    nw = tuple(l["w"].astype(cd) for l in node_mlp["layers"])
    nb = tuple(l["b"].reshape(1, -1).astype(jnp.float32)
               for l in node_mlp["layers"])
    nln = ((node_mlp["ln"]["scale"].reshape(1, -1).astype(jnp.float32),
            node_mlp["ln"]["bias"].reshape(1, -1).astype(jnp.float32))
           if "ln" in node_mlp else ())
    flat = (*ew, *eb, *eln, *nw, *nb, *nln)
    out = _gn_fused(e.astype(act), vsg.astype(act), v.astype(act), flat,
                    len(ew), len(nw), bool(eln), bool(nln), k, block,
                    interpret, out_activation == "selu", skip_e_out)
    if skip_e_out:
        return None, out
    return out


# --------------------------------------------------------------- windowed-
# gather fusion: the sender projection table ``vs = v@Ws`` stays in HBM and
# each block's rows are gathered *inside* the kernel as
# ``one_hot(local_idx) @ DMA'd window`` (+ a small per-block exception
# matmul), eliminating the [E, H] vsg materialisation roundtrip that cost
# ~11 ms/step at the MuS-GNN headline workload (BASELINE.md ledger).
# Plan arrays come from ``ops.window_plan`` via ``loader.collate``.

def _wg_gather_block(lidx, xlp, xval, win, block_rows, window, dtype,
                     rot=None):
    """In-VMEM windowed gather for one edge block: one-hot MXU matmul over
    the DMA'd table window plus the per-block exception overlay.

    ``rot`` (scalar) selects ring-buffer window layout: physical row of
    window-relative index i is ``(i + rot) % window`` (the folded-kernel
    ring mode keeps the VMEM window as a circular buffer and DMAs only the
    stride-new rows per block)."""
    if rot is not None:
        lp = lidx + rot
        lp = jnp.where(lp >= window, lp - window, lp)
        # miss sentinel (lidx == window) must stay out of range after the
        # wrap, not alias physical row ``rot``
        lp = jnp.where(lidx < window, lp, window)
        oh = _wg_onehot(lp, block_rows, window, dtype)
    else:
        oh = _wg_onehot(lidx, block_rows, window, dtype)
    vsg = jnp.dot(oh, win.astype(dtype), preferred_element_type=jnp.float32)
    X = xlp.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, X), 0)
    ohx = (rows == xlp).astype(dtype)          # pad lpos=block_rows → zero
    vsg = vsg + jnp.dot(ohx, xval.astype(dtype),
                        preferred_element_type=jnp.float32)
    return vsg, oh, ohx


def _wg_onehot(lidx, rows, window, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, window), 1)
    return (lidx == iota).astype(dtype)


def _ring_dma(tab_hbm, win, sem, starts_ref, b, start, window, stride):
    """Ring-buffer window maintenance: block 0 loads the full window; each
    later block DMAs only the ``stride`` NEW table rows into the slot their
    expired predecessors occupied (physical row of table row t is
    ``(t - starts[0]) % window`` — valid because rolling starts move by
    exactly 0 or ``stride`` per block).  Replaces the full window DMA whose
    re-read traffic is ``window/stride``× the table size per layer.
    Returns (rot, wait_fn)."""
    s0 = starts_ref[0]
    prev = pl.multiple_of(starts_ref[jnp.maximum(b - 1, 0)], 8)
    shift = start - prev
    rot = jax.lax.rem(start - s0, window)
    full = pltpu.make_async_copy(tab_hbm.at[pl.ds(start, window), :],
                                 win, sem)
    num_rows = tab_hbm.shape[0]
    # when shift > 0: prev + window <= num_rows - stride (starts <= hi);
    # the min is a no-op then and only guards the never-started case
    # re-assert sublane alignment: jnp.minimum drops the multiple_of
    # annotation and real Mosaic (unlike interpret mode) must PROVE the
    # DMA start is tile-aligned; both operands are multiples of 8 (prev is
    # annotated, window/stride/num_rows come from the 8-aligned planner)
    src = pl.multiple_of(jnp.minimum(prev + window, num_rows - stride), 8)
    phys = pl.multiple_of(jax.lax.rem(prev - s0 + window, window), 8)
    chunk = pltpu.make_async_copy(tab_hbm.at[pl.ds(src, stride), :],
                                  win.at[pl.ds(phys, stride), :], sem)

    @pl.when(b == 0)
    def _start_full():
        full.start()

    @pl.when((b > 0) & (shift > 0))
    def _start_chunk():
        chunk.start()

    def wait():
        @pl.when(b == 0)
        def _wait_full():
            full.wait()

        @pl.when((b > 0) & (shift > 0))
        def _wait_chunk():
            chunk.wait()

    return rot, wait


def _make_fwd_kernel_wg(n_e, n_n, has_eln, has_nln, k, out_dtype, out_selu,
                        window, block_rows, stride=0, ring=False,
                        skip_e=False):
    def kernel(*refs):
        starts_ref = refs[0]
        e_ref, v_ref, lidx_ref, xlp_ref, xval_ref, vs_hbm = refs[1:7]
        if skip_e:
            flat = [r[:] for r in refs[7:-3]]
            e_out, v_out = None, refs[-3]
        else:
            flat = [r[:] for r in refs[7:-4]]
            e_out, v_out = refs[-4], refs[-3]
        win, sem = refs[-2], refs[-1]
        b = pl.program_id(0)
        start = pl.multiple_of(starts_ref[b], 8)
        if ring:
            rot, wait = _ring_dma(vs_hbm, win, sem, starts_ref, b, start,
                                  window, stride)
        else:
            rot = None
            dma = pltpu.make_async_copy(vs_hbm.at[pl.ds(start, window), :],
                                        win, sem)
            dma.start()
            wait = dma.wait
        ew, eb, eln, nw, nb, nln = _split(flat, n_e, n_n, has_eln, has_nln)
        wait()
        vsg, _, _ = _wg_gather_block(lidx_ref[:], xlp_ref[0],
                                     xval_ref[0], win[:],
                                     block_rows, window, e_ref.dtype,
                                     rot=rot)
        e_new, v_new = _fwd_math(e_ref[:], vsg.astype(e_ref.dtype),
                                 v_ref[:], k, ew, eb, eln, nw, nb, nln,
                                 out_selu=out_selu)
        if not skip_e:
            e_out[:] = e_new.astype(out_dtype)
        v_out[:] = v_new.astype(out_dtype)
    return kernel


def _make_bwd_kernel_wg(n_e, n_n, has_eln, has_nln, k, in_dtype, out_selu,
                        window, block_rows, stride=0, ring=False,
                        skip_e=False):
    n_params = 2 * n_e + 2 * n_n + (2 if has_eln else 0) \
        + (2 if has_nln else 0)
    rolling = stride > 0

    def kernel(*refs):
        starts_ref = refs[0]
        idx = 1
        e_ref, v_ref, lidx_ref, xlp_ref, xval_ref, vs_hbm = \
            refs[idx:idx + 6]
        idx += 6
        if skip_e:
            ge_ref, gv_ref = None, refs[idx]
            idx += 1
        else:
            ge_ref, gv_ref = refs[idx], refs[idx + 1]
            idx += 2
        if not rolling:
            idx += 1                   # zero-initialised dvs alias input
        flat = [r[:] for r in refs[idx:idx + n_params]]
        idx += n_params
        de_ref, dv_ref, dxval_ref, dvs_hbm = refs[idx:idx + 4]
        idx += 4
        dparams = refs[idx:idx + n_params]
        idx += n_params
        # win2 doubles as the rolling dvs accumulator (f32) in rolling mode
        win, win2, sem, sem2 = refs[idx:idx + 4]
        idx += 4
        sparams = refs[idx:idx + n_params]

        b = pl.program_id(0)
        start = pl.multiple_of(starts_ref[b], 8)
        if ring:
            rot, wait = _ring_dma(vs_hbm, win, sem, starts_ref, b, start,
                                  window, stride)
        else:
            rot = None
            dma = pltpu.make_async_copy(vs_hbm.at[pl.ds(start, window), :],
                                        win, sem)
            dma.start()
            wait = dma.wait

        if rolling:
            # monotone starts (planner: diffs in {0, stride}); rows
            # [prev, start) got their last contribution in block b-1, so
            # flush them now, overlapped with this block's main math
            prev = pl.multiple_of(starts_ref[jnp.maximum(b - 1, 0)], 8)
            shift = start - prev
            acc = win2
            if ring:
                # acc rows in ring (physical) coordinates: flush the slot
                # of the expiring rows [prev, prev+stride)
                s0 = starts_ref[0]
                phys_prev = pl.multiple_of(
                    jax.lax.rem(prev - s0 + window, window), 8)
                flush = pltpu.make_async_copy(
                    acc.at[pl.ds(phys_prev, stride), :],
                    dvs_hbm.at[pl.ds(prev, stride), :], sem2)
            else:
                flush = pltpu.make_async_copy(
                    acc.at[pl.ds(0, stride), :],
                    dvs_hbm.at[pl.ds(prev, stride), :], sem2)

            @pl.when(shift > 0)
            def _flush_start():
                flush.start()

        ew, eb, eln, nw, nb, nln = _split(flat, n_e, n_n, has_eln, has_nln)
        s_ew, s_eb, s_eln, s_nw, s_nb, s_nln = _split(
            list(sparams), n_e, n_n, has_eln, has_nln)

        step = pl.program_id(0)
        nsteps = pl.num_programs(0)

        @pl.when(step == 0)
        def _init():
            for s in sparams:
                s[:] = jnp.zeros_like(s)
            if rolling:
                win2[:] = jnp.zeros_like(win2)

        e, v = e_ref[:], v_ref[:]
        wait()
        vsg_f32, oh, ohx = _wg_gather_block(
            lidx_ref[:], xlp_ref[0], xval_ref[0], win[:],
            block_rows, window, e.dtype, rot=rot)
        vsg = vsg_f32.astype(e.dtype)
        (e_new, v_new, h1, e_preacts, e_xhat, e_rstd, aggr, hn,
         n_preacts, n_xhat, n_rstd) = _fwd_math(
            e, vsg, v, k, ew, eb, eln, nw, nb, nln, save=True)
        Eb = e.shape[0]
        B = Eb // k
        gv = gv_ref[:].astype(jnp.float32)
        if out_selu:
            gv = gv * _dselu(v_new)
        if skip_e:
            # e′ has no consumer (last MP layer before an up/decoder) —
            # its cotangent is identically zero
            ge = None
        else:
            ge = ge_ref[:].astype(jnp.float32)
            if out_selu:
                ge = ge * _dselu(e_new)

        # ---- node chain backward (identical to mode A) --------------------
        if has_nln:
            s_nln[0][:] += (gv * n_xhat).sum(axis=0, keepdims=True)
            s_nln[1][:] += gv.sum(axis=0, keepdims=True)
            da = _ln_backward(gv, n_xhat, n_rstd, nln[0])
        else:
            da = gv
        dhn = _chain_backward(da, hn, n_preacts, nw[1:], nb[1:],
                              s_nw[1:], s_nb[1:], preact_input=True)
        fa = aggr.shape[-1]
        wa, wv = nw[0][:fa], nw[0][fa:]
        dhn_c = dhn.astype(nw[0].dtype)
        s_nw[0][:fa] += jnp.dot(aggr.astype(nw[0].dtype).T, dhn_c,
                                preferred_element_type=jnp.float32)
        s_nw[0][fa:] += jnp.dot(v.astype(nw[0].dtype).T, dhn_c,
                                preferred_element_type=jnp.float32)
        s_nb[0][:] += dhn.sum(axis=0, keepdims=True)
        daggr = jnp.dot(dhn_c, wa.T, preferred_element_type=jnp.float32)
        dv = jnp.dot(dhn_c, wv.T, preferred_element_type=jnp.float32)

        dagg_rep = jnp.repeat(daggr / k, k, axis=0)
        de_new = dagg_rep if ge is None else ge + dagg_rep

        # ---- edge chain backward (identical to mode A) ---------------------
        if has_eln:
            s_eln[0][:] += (de_new * e_xhat).sum(axis=0, keepdims=True)
            s_eln[1][:] += de_new.sum(axis=0, keepdims=True)
            da = _ln_backward(de_new, e_xhat, e_rstd, eln[0])
        else:
            da = de_new
        dh1 = _chain_backward(da, h1, e_preacts, ew[1:], eb[1:],
                              s_ew[1:], s_eb[1:], preact_input=True)
        fe = e.shape[-1]
        we, wr = ew[0][:fe], ew[0][fe:]
        dh1_c = dh1.astype(ew[0].dtype)
        s_ew[0][:fe] += jnp.dot(e.astype(ew[0].dtype).T, dh1_c,
                                preferred_element_type=jnp.float32)
        dvr = dh1.reshape(B, k, -1).sum(axis=1)
        s_ew[0][fe:] += jnp.dot(v.astype(ew[0].dtype).T,
                                dvr.astype(ew[0].dtype),
                                preferred_element_type=jnp.float32)
        s_eb[0][:] += dh1.sum(axis=0, keepdims=True)
        de_ref[:] = jnp.dot(dh1_c, we.T,
                            preferred_element_type=jnp.float32).astype(
                                in_dtype)
        dv = dv + jnp.dot(dvr.astype(ew[0].dtype), wr.T,
                          preferred_element_type=jnp.float32)
        dv_ref[:] = dv.astype(in_dtype)

        # ---- windowed-gather backward: dvs accumulation + exception grads --
        if not rolling:
            rd = pltpu.make_async_copy(dvs_hbm.at[pl.ds(start, window), :],
                                       win2, sem2)
            rd.start()
        dxval_ref[0] = jnp.dot(ohx.T, dh1_c,
                               preferred_element_type=jnp.float32).astype(
                                   dxval_ref.dtype)
        upd = jnp.dot(oh.T, dh1_c, preferred_element_type=jnp.float32)
        if rolling and ring:
            # oh is in ring coordinates so upd lands on the matching acc
            # slots; the expired slot is flushed then zeroed for its new
            # table rows (no window-wide VMEM slide)
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
                        dvs_hbm.at[pl.ds(dst, stride), :], sem2)
                    fin.start()
                    fin.wait()
        elif rolling:
            # rolling accumulator: retire the flushed rows, slide the
            # window, add this block's contribution; each dvs row is
            # DMA-written exactly once (vs. the window-wide RMW of the
            # non-rolling path — ~window/stride× less HBM traffic)
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
                    acc, dvs_hbm.at[pl.ds(start, window), :], sem2)
                fin.start()
                fin.wait()
        else:
            rd.wait()
            win2[:] += upd
            wr_dma = pltpu.make_async_copy(
                win2, dvs_hbm.at[pl.ds(start, window), :], sem2)
            wr_dma.start()
            wr_dma.wait()

        @pl.when(step == nsteps - 1)
        def _write():
            for d, s in zip(dparams, sparams):
                d[:] = s[:]
    return kernel


def _wg_specs(e, v, lidx, xlp, xval, k, block):
    """Input block specs; ``xlp`` is the [nblocks, 1, X] local-row array."""
    Eb = k * block
    X = xlp.shape[-1]
    return [
        pl.BlockSpec((Eb, e.shape[-1]), lambda b, s: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, v.shape[-1]), lambda b, s: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Eb, 1), lambda b, s: (b, 0),
                     memory_space=pltpu.VMEM),
        # [nblocks, 1, X] so the (1, 1, X) block satisfies TPU tiling
        # (sublane block dim equals the array dim)
        pl.BlockSpec((1, 1, X), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, X, xval.shape[-1]), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]


_WG_STATICS = (8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20)


@functools.partial(jax.custom_vjp, nondiff_argnums=_WG_STATICS)
def _gn_fused_wg(e, vs, v, xval, flat_params, lidx, starts, xlp,
                 n_e, n_n, has_eln, has_nln, k, block, interpret, out_selu,
                 window, stride, zero_tail=False, ring=False, skip_e=False):
    return _gn_wg_fwd_impl(e, vs, v, xval, flat_params, lidx, starts, xlp,
                           n_e, n_n, has_eln, has_nln, k, block, interpret,
                           out_selu, window, stride, ring, skip_e)


def _gn_wg_fwd_impl(e, vs, v, xval, flat_params, lidx, starts, xlp,
                    n_e, n_n, has_eln, has_nln, k, block, interpret,
                    out_selu, window, stride=0, ring=False, skip_e=False):
    grid = (v.shape[0] // block,)
    Eb = k * block
    H = vs.shape[-1]
    in_specs = _wg_specs(e, v, lidx, xlp, xval, k, block)
    inv2 = lambda b, s: (0, 0)
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, inv2,
                                     memory_space=pltpu.VMEM))
    kernel = _make_fwd_kernel_wg(n_e, n_n, has_eln, has_nln, k, e.dtype,
                                 out_selu, window, Eb, stride, ring, skip_e)
    e_spec = pl.BlockSpec((Eb, H), lambda b, s: (b, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((block, H), lambda b, s: (b, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=((v_spec,) if skip_e else (e_spec, v_spec)),
        scratch_shapes=[pltpu.VMEM((window, H), vs.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    e_shape = jax.ShapeDtypeStruct((e.shape[0], H), e.dtype)
    v_shape = jax.ShapeDtypeStruct((v.shape[0], H), e.dtype)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=((v_shape,) if skip_e else (e_shape, v_shape)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(starts, e, v, lidx, xlp, xval, vs, *flat_params)
    if skip_e:
        return outs[0]
    return outs


def _gn_wg_vjp_fwd(e, vs, v, xval, flat_params, lidx, starts, xlp,
                   n_e, n_n, has_eln, has_nln, k, block, interpret,
                   out_selu, window, stride, zero_tail=False, ring=False,
                   skip_e=False):
    out = _gn_wg_fwd_impl(e, vs, v, xval, flat_params, lidx, starts, xlp,
                          n_e, n_n, has_eln, has_nln, k, block, interpret,
                          out_selu, window, stride, ring, skip_e)
    return out, (e, vs, v, xval, flat_params, lidx, starts, xlp)


def _gn_wg_vjp_bwd(n_e, n_n, has_eln, has_nln, k, block, interpret,
                   out_selu, window, stride, zero_tail, ring, skip_e,
                   res, g):
    e, vs, v, xval, flat_params, lidx, starts, xlp = res
    if skip_e:
        ge, gv = None, g
    else:
        ge, gv = g
    rolling = stride > 0
    grid = (v.shape[0] // block,)
    Eb = k * block
    H = vs.shape[-1]
    X = xlp.shape[-1]
    in_specs = _wg_specs(e, v, lidx, xlp, xval, k, block)
    ct_specs = ([] if skip_e else
                [pl.BlockSpec((Eb, H), lambda b, s: (b, 0),
                              memory_space=pltpu.VMEM)])
    ct_specs.append(pl.BlockSpec((block, H), lambda b, s: (b, 0),
                                 memory_space=pltpu.VMEM))
    if not rolling:
        # zero-initialised dvs buffer, aliased to the dvs output (the
        # rolling path writes every dvs row exactly once → no init needed)
        ct_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    in_specs = in_specs + ct_specs
    inv2 = lambda b, s: (0, 0)
    for p in flat_params:
        in_specs.append(pl.BlockSpec(p.shape, inv2,
                                     memory_space=pltpu.VMEM))
    out_shapes = [jax.ShapeDtypeStruct(e.shape, e.dtype),
                  jax.ShapeDtypeStruct(v.shape, v.dtype),
                  jax.ShapeDtypeStruct(xval.shape, jnp.float32),
                  jax.ShapeDtypeStruct(vs.shape, jnp.float32)]
    out_specs = [pl.BlockSpec((Eb, e.shape[-1]), lambda b, s: (b, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((block, v.shape[-1]), lambda b, s: (b, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, X, H), lambda b, s: (b, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pl.ANY)]
    for p in flat_params:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(p.shape, inv2,
                                      memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((window, H), vs.dtype),
               pltpu.VMEM((window, H), jnp.float32),
               pltpu.SemaphoreType.DMA(()),
               pltpu.SemaphoreType.DMA(())]
    scratch += [pltpu.VMEM(p.shape, jnp.float32) for p in flat_params]
    kernel = _make_bwd_kernel_wg(n_e, n_n, has_eln, has_nln, k, e.dtype,
                                 out_selu, window, Eb, stride, ring, skip_e)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=tuple(out_specs), scratch_shapes=scratch)
    # operand order: starts, e, v, lidx, xlp, xval, vs, [ge,] gv[, zeros],
    # *flat — rolling mode needs no zeros (each dvs row flushed once)
    operands = [starts, e, v, lidx, xlp, xval, vs]
    if not skip_e:
        operands.append(ge)
    operands.append(gv)
    aliases = {}
    if not rolling:
        aliases = {len(operands): 3}    # zeros -> dvs output
        operands.append(jnp.zeros(vs.shape, jnp.float32))
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=tuple(out_shapes),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands, *flat_params)
    de, dv, dxval, dvs = outs[0], outs[1], outs[2], outs[3]
    dflat = tuple(outs[4:])
    if rolling and zero_tail:
        # graph-parallel tables extend past the rolling flush coverage
        # (the halo region sits after the last window); rows the flush
        # never writes hold garbage — zero them.  Their true cotangents
        # flow through the exception path (xval) added by the caller's
        # gather transpose.
        covered = starts[-1] + window
        rows = jax.lax.broadcasted_iota(jnp.int32, dvs.shape, 0)
        dvs = jnp.where(rows < covered, dvs, 0)
    # accumulate in f32, hand back in the primal dtypes
    return (de, dvs.astype(vs.dtype), dv, dxval.astype(xval.dtype), dflat,
            None, None, None)


_gn_fused_wg.defvjp(_gn_wg_vjp_fwd, _gn_wg_vjp_bwd)


def supports_wg(plan, num_nodes: int, k: int,
                table_rows: int = None) -> bool:
    """Gate for the in-kernel windowed gather: the GN kernel adopts the
    plan's edge blocking (node block = block_rows // k — the loader plans
    at node-block 128, sized so the backward's VMEM working set fits the
    16 MB scoped limit), so the plan's block must be a whole number of
    nodes and divide the node count; blocked exception arrays must be
    present.  ``table_rows`` (graph-parallel: the halo-extended local
    table is wider than the node block) defaults to ``num_nodes``."""
    if plan is None or len(plan) < 8 or plan[6] is None:
        return False
    window, block_rows = int(plan[4]), int(plan[5])
    if block_rows % k:
        return False
    block = block_rows // k
    stride = int(plan[8]) if len(plan) > 8 and plan[8] is not None else 0
    rows = num_nodes if table_rows is None else table_rows
    if stride and (window % stride or rows % stride):
        return False
    # block > 128 overflows the 16 MB VMEM scoped limit in the backward
    # kernel (one-hot + remat activations + RMW window scratch)
    return (block % 8 == 0 and block <= 128 and num_nodes % block == 0
            and rows >= window)


def gn_block_fused_wg(edge_mlp: dict, node_mlp: dict, e, vs, v, k: int,
                      plan, *, compute_dtype=jnp.float32,
                      interpret: bool = False,
                      out_activation: str = None,
                      zero_tail: bool = False,
                      skip_e_out: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused GN block with the sender gather *inside* the kernel.

    ``vs = v @ Ws`` is the full sender-projection table (HBM resident);
    each block DMAs its plan window and gathers by one-hot MXU matmul,
    eliminating the ``[E, H]`` vsg materialisation of ``gn_block_fused``.
    Exception rows enter through a small per-block overlay whose values
    (``vs[exc_nidx]``) are gathered outside, so their cotangent flows back
    through XLA's (cheap, small) gather transpose.
    """
    if out_activation not in (None, "selu"):
        raise ValueError(f"unsupported out_activation {out_activation!r}")
    starts, lidx = plan[0], plan[1]
    window = int(plan[4])
    block = int(plan[5]) // k          # kernel blocking follows the plan
    exc_lpos, exc_nidx = plan[6], plan[7]
    stride = int(plan[8]) if len(plan) > 8 and plan[8] is not None else 0
    cd = compute_dtype
    act = cd if cd != jnp.float32 else jnp.float32
    fe = e.shape[-1]
    fv = v.shape[-1]
    w1 = edge_mlp["layers"][0]["w"]
    we_wr = jnp.concatenate([w1[:fe], w1[fe + fv:]], axis=0).astype(cd)
    ew = (we_wr,) + tuple(l["w"].astype(cd)
                          for l in edge_mlp["layers"][1:])
    eb = tuple(l["b"].reshape(1, -1).astype(jnp.float32)
               for l in edge_mlp["layers"])
    eln = ((edge_mlp["ln"]["scale"].reshape(1, -1).astype(jnp.float32),
            edge_mlp["ln"]["bias"].reshape(1, -1).astype(jnp.float32))
           if "ln" in edge_mlp else ())
    nw = tuple(l["w"].astype(cd) for l in node_mlp["layers"])
    nb = tuple(l["b"].reshape(1, -1).astype(jnp.float32)
               for l in node_mlp["layers"])
    nln = ((node_mlp["ln"]["scale"].reshape(1, -1).astype(jnp.float32),
            node_mlp["ln"]["bias"].reshape(1, -1).astype(jnp.float32))
           if "ln" in node_mlp else ())
    flat = (*ew, *eb, *eln, *nw, *nb, *nln)
    vs = vs.astype(act)
    nblocks, X = exc_nidx.shape
    xval = jnp.take(vs, exc_nidx.reshape(-1), axis=0,
                    mode="clip").reshape(nblocks, X, vs.shape[-1])
    xlp3 = exc_lpos.reshape(nblocks, 1, X)
    ring = (stride > 0 and window % stride == 0
            and os.environ.get("GRAPHS4CFD_WG_RING", "0")
            not in ("0", "false"))
    out = _gn_fused_wg(e.astype(act), vs, v.astype(act), xval, flat,
                       lidx, starts, xlp3,
                       len(ew), len(nw), bool(eln), bool(nln), k, block,
                       interpret, out_activation == "selu", window,
                       stride, zero_tail, ring, skip_e_out)
    if skip_e_out:
        # e′ has no consumer (caller-asserted): the kernel skipped its
        # store, so there is nothing true to return — hand back ``None``
        # (LOUD contract, VERDICT r4 #5 / ADVICE r3 #2): any accidental
        # consumption fails at trace time instead of silently reading
        # stale numbers.  Deadness is computed in the engines
        # (mus_gnn/mugs_gnn run_mp_group ``e_dead``/``can_skip``,
        # remus_gnn ``last_visit``); ``blocks.gn_block`` enforces the
        # same contract on every dispatch path.
        return None, out
    return out
