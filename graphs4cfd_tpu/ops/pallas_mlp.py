"""Pallas fused MLP-chain kernel — the framework's hot compute kernel.

The MuS/REMuS workload is HBM-bandwidth-bound: every MP layer pushes
several ``[E, 128]`` activation tensors through HBM
(``nn/blocks.py:gn_block``).  This kernel fuses an entire reference-style
MLP (Linear→SELU→…→Linear→LayerNorm,
``/root/reference/graphs4cfd/nn/blocks.py:117-144``) into one VMEM-resident
pass over row blocks: the input is read once, the output written once, and
all intermediate layers live in VMEM.  The custom VJP recomputes the
intermediates inside the backward kernel (remat-style) so only the input is
saved; dW/db accumulate in f32 VMEM scratch across the sequential TPU grid
and are written at the last block.

Chain semantics (two entry modes):
  * ``preact_input=False``: ``x`` is the layer-0 input —
    ``a_i = h_{i-1}W_i + b_i``, ``h_i = selu(a_i)`` between layers, output
    ``a_{n-1}`` (+ optional LayerNorm).
  * ``preact_input=True``: ``x`` is already the *pre-activation* output of
    a fused first layer (see ``nn.blocks._edge_first_layer``); the chain
    starts with ``h = selu(x)``.

Weights use the standard ``{"layers": [...], "ln": ...}`` pytree; rows
must be a multiple of ``block`` (collate buckets guarantee it).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SELU_ALPHA = 1.6732632423543772848170429916717
_SELU_SCALE = 1.0507009873554804934193349852946

DEFAULT_BLOCK = 512


def _selu(a):
    return _SELU_SCALE * jnp.where(a > 0, a, _SELU_ALPHA * (jnp.exp(a) - 1.0))


def _dselu(a):
    return _SELU_SCALE * jnp.where(a > 0, 1.0, _SELU_ALPHA * jnp.exp(a))


def _chain_forward(x, ws, bs, preact_input: bool):
    """Returns (pre-LN output, list of layer pre-activations ``a_i``)."""
    preacts = []
    if preact_input:
        h = _selu(x.astype(jnp.float32))
    else:
        h = x
    a = None
    for i in range(len(ws)):
        a = jnp.dot(h.astype(ws[i].dtype), ws[i],
                    preferred_element_type=jnp.float32) + bs[i][0]
        preacts.append(a)
        if i < len(ws) - 1:
            h = _selu(a)
    return a, preacts


def _apply_ln(out, scale, bias):
    mean = out.mean(axis=-1, keepdims=True)
    cent = out - mean
    var = (cent * cent).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = cent * rstd
    return xhat * scale[0] + bias[0], xhat, rstd


def _make_fwd_kernel(n: int, preact_input: bool, has_ln: bool, out_dtype):
    def kernel(*refs):
        x_ref = refs[0]
        ws = [refs[1 + i][:] for i in range(n)]
        bs = [refs[1 + n + i][:] for i in range(n)]
        out_ref = refs[-1]
        out, _ = _chain_forward(x_ref[:], ws, bs, preact_input)
        if has_ln:
            out, _, _ = _apply_ln(out, refs[1 + 2 * n][:], refs[2 + 2 * n][:])
        out_ref[:] = out.astype(out_dtype)
    return kernel


def _make_bwd_kernel(n: int, preact_input: bool, has_ln: bool, x_dtype):
    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        g_ref = refs[idx]; idx += 1
        ws = [refs[idx + i][:] for i in range(n)]; idx += n
        bs = [refs[idx + i][:] for i in range(n)]; idx += n
        ln_scale = refs[idx][:] if has_ln else None
        idx += 1 if has_ln else 0
        dx_ref = refs[idx]; idx += 1
        dws = refs[idx:idx + n]; idx += n
        dbs = refs[idx:idx + n]; idx += n
        dlns = refs[idx:idx + 2] if has_ln else ()
        idx += 2 if has_ln else 0
        sws = refs[idx:idx + n]; idx += n
        sbs = refs[idx:idx + n]; idx += n
        slns = refs[idx:idx + 2] if has_ln else ()

        step = pl.program_id(0)
        nsteps = pl.num_programs(0)

        @pl.when(step == 0)
        def _init():
            for s in list(sws) + list(sbs) + list(slns):
                s[:] = jnp.zeros_like(s)

        x = x_ref[:]
        out, preacts = _chain_forward(x, ws, bs, preact_input)
        g = g_ref[:].astype(jnp.float32)
        if has_ln:
            _, xhat, rstd = _apply_ln(out, ln_scale,
                                      jnp.zeros_like(ln_scale))
            slns[0][:] += (g * xhat).sum(axis=0, keepdims=True)
            slns[1][:] += g.sum(axis=0, keepdims=True)
            dxhat = g * ln_scale[0]
            m1 = dxhat.mean(axis=-1, keepdims=True)
            m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
            da = (dxhat - m1 - xhat * m2) * rstd
        else:
            da = g
        for i in range(n - 1, -1, -1):
            if i > 0:
                h_prev = _selu(preacts[i - 1])
            elif preact_input:
                h_prev = _selu(x.astype(jnp.float32))
            else:
                h_prev = x.astype(jnp.float32)
            da_c = da.astype(ws[i].dtype)
            sws[i][:] += jnp.dot(h_prev.astype(ws[i].dtype).T, da_c,
                                 preferred_element_type=jnp.float32)
            sbs[i][:] += da.sum(axis=0, keepdims=True)
            dh = jnp.dot(da_c, ws[i].T, preferred_element_type=jnp.float32)
            if i > 0:
                da = dh * _dselu(preacts[i - 1])
            elif preact_input:
                dx_ref[:] = (dh * _dselu(x.astype(jnp.float32))).astype(
                    x_dtype)
            else:
                dx_ref[:] = dh.astype(x_dtype)

        @pl.when(step == nsteps - 1)
        def _write():
            for d, s in zip(list(dws) + list(dbs) + list(dlns),
                            list(sws) + list(sbs) + list(slns)):
                d[:] = s[:]
    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused(x, flat_params, preact_input, has_ln, block, interpret):
    return _fused_fwd_impl(x, flat_params, preact_input, has_ln, block,
                           interpret)


def _split_flat(flat_params, has_ln):
    n = (len(flat_params) - (2 if has_ln else 0)) // 2
    ws = flat_params[:n]
    bs = flat_params[n:2 * n]
    ln = tuple(flat_params[2 * n:]) if has_ln else ()
    return n, ws, bs, ln


def _fused_fwd_impl(x, flat_params, preact_input, has_ln, block, interpret):
    n, ws, bs, ln = _split_flat(flat_params, has_ln)
    rows, fin = x.shape
    fout = ws[-1].shape[1]
    grid = (rows // block,)
    inv2 = lambda i: (0, 0)
    in_specs = [pl.BlockSpec((block, fin), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(w.shape, inv2, memory_space=pltpu.VMEM)
                 for w in ws]
    in_specs += [pl.BlockSpec(b.shape, inv2, memory_space=pltpu.VMEM)
                 for b in bs]
    in_specs += [pl.BlockSpec(p.shape, inv2, memory_space=pltpu.VMEM)
                 for p in ln]
    kernel = _make_fwd_kernel(n, preact_input, has_ln, x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, fout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, fout), x.dtype),
        interpret=interpret,
    )(x, *ws, *bs, *ln)


def _fused_vjp_fwd(x, flat_params, preact_input, has_ln, block, interpret):
    out = _fused_fwd_impl(x, flat_params, preact_input, has_ln, block,
                          interpret)
    return out, (x, flat_params)


def _fused_vjp_bwd(preact_input, has_ln, block, interpret, res, g):
    x, flat_params = res
    n, ws, bs, ln = _split_flat(flat_params, has_ln)
    rows, fin = x.shape
    grid = (rows // block,)
    inv2 = lambda i: (0, 0)
    in_specs = [pl.BlockSpec((block, fin), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, g.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(w.shape, inv2, memory_space=pltpu.VMEM)
                 for w in ws]
    in_specs += [pl.BlockSpec(b.shape, inv2, memory_space=pltpu.VMEM)
                 for b in bs]
    if has_ln:
        in_specs.append(pl.BlockSpec(ln[0].shape, inv2,
                                     memory_space=pltpu.VMEM))
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    out_specs = [pl.BlockSpec((block, fin), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for p in list(ws) + list(bs) + list(ln):
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(p.shape, inv2,
                                      memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM(p.shape, jnp.float32)
               for p in list(ws) + list(bs) + list(ln)]
    kernel = _make_bwd_kernel(n, preact_input, has_ln, x.dtype)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, g, *ws, *bs, *(ln[:1] if has_ln else ()))
    dx = outs[0]
    return dx, tuple(outs[1:])


_fused.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def supports(params: dict, rows: int, in_dim: int,
             block: int = DEFAULT_BLOCK) -> bool:
    """Whether the fused kernel handles this MLP/shape combination."""
    if rows % block:
        return False
    if in_dim % 128:
        return False
    return all(l["w"].shape[1] % 128 == 0 for l in params["layers"])


def fused_mlp(params: dict, x: jnp.ndarray, *, start: int = 0,
              compute_dtype=jnp.float32, block: int = DEFAULT_BLOCK,
              interpret: bool = False) -> jnp.ndarray:
    """Fused replacement for ``nn.mlp.apply_mlp_tail`` semantics.

    ``start=0``: full MLP on input ``x``.  ``start=1``: ``x`` is the
    pre-activation output of layer 0 (gather-fused first layer) and the
    kernel runs layers ``1..n``.
    """
    has_ln = "ln" in params
    layers = params["layers"][start:]
    cd = compute_dtype
    ws = tuple(l["w"].astype(cd) for l in layers)
    bs = tuple(l["b"].reshape(1, -1).astype(jnp.float32) for l in layers)
    ln = ((params["ln"]["scale"].reshape(1, -1).astype(jnp.float32),
           params["ln"]["bias"].reshape(1, -1).astype(jnp.float32))
          if has_ln else ())
    act = cd if cd != jnp.float32 else jnp.float32
    out = _fused(x.astype(act), (*ws, *bs, *ln), start > 0, has_ln, block,
                 interpret)
    return out
