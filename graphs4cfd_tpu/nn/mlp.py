"""Functional MLP matching the reference's ``blocks.MLP``.

Reference semantics (``/root/reference/graphs4cfd/nn/blocks.py:117-144``):
``Linear → SELU`` repeated, final ``Linear`` with no activation, optional
trailing ``LayerNorm``.  For a width tuple ``w`` of length L there are L
linear layers: ``in→w[0]``, ``w[i]→w[i+1]`` for i<L-2, ``w[-2]→w[-1]``.

Initialisation follows torch ``nn.Linear`` defaults — weights and biases
drawn from ``U(-1/√fan_in, 1/√fan_in)`` — so training dynamics match the
reference.  Parameters are plain pytrees (dicts of arrays); compute runs in
the caller's dtype policy (bf16 matmuls with f32 params by default at the
model level).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

ArchTuple = Tuple[int, Sequence[int], bool]  # (input_size, widths, layer_norm)


def init_mlp(key: jax.Array, input_size: int, widths: Sequence[int],
             layer_norm: bool = False) -> dict:
    """Create parameters for one MLP from a reference-style arch tuple."""
    dims = [int(input_size)] + [int(w) for w in widths]
    params = {"layers": []}
    for i in range(len(widths)):
        key, sub = jax.random.split(key)
        fan_in = dims[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        kw, kb = jax.random.split(sub)
        params["layers"].append({
            "w": jax.random.uniform(kw, (fan_in, dims[i + 1]),
                                    jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (dims[i + 1],),
                                    jnp.float32, -bound, bound),
        })
    if layer_norm:
        params["ln"] = {"scale": jnp.ones((dims[-1],), jnp.float32),
                        "bias": jnp.zeros((dims[-1],), jnp.float32)}
    return params


def apply_mlp(params: dict, x: jnp.ndarray, *,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """Forward pass.  Matmuls run in ``compute_dtype`` (bf16 on TPU puts
    them on the MXU); activations, LayerNorm statistics and the output stay
    f32 for parity with the reference."""
    return apply_mlp_tail(params, x, start=0, compute_dtype=compute_dtype)


def apply_mlp_tail(params: dict, h: jnp.ndarray, *, start: int,
                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """Apply the MLP from layer ``start`` onward.

    ``start=0`` is the full MLP; ``start=1`` expects ``h`` to be the
    *pre-activation* output of the first layer (used by blocks that fuse
    the first-layer matmul with gathers — see ``nn.blocks.gn_block``).
    """
    layers = params["layers"]
    n = len(layers)
    cd = compute_dtype
    if h.ndim == 2 and n - start >= 1:
        from ..config import pallas_enabled
        if pallas_enabled():
            from ..ops.pallas_mlp import fused_mlp, supports
            if supports({"layers": layers[start:], **({"ln": params["ln"]}
                                                      if "ln" in params else {})},
                        h.shape[0], h.shape[1]):
                interpret = jax.default_backend() != "tpu"
                return fused_mlp(params, h, start=start, compute_dtype=cd,
                                 interpret=interpret)
    full_low = cd != jnp.float32
    # f32 policy: matmuls in cd, activations f32 (bit-parity with the
    # reference).  bf16 policy (TrainConfig.mixed_precision — the TPU
    # analogue of the reference's AMP, model.py:202-209): activations stay
    # bf16 end-to-end, halving HBM traffic on the [E, 128] tensors that
    # dominate this workload; LayerNorm statistics still accumulate in f32.
    act = cd if full_low else jnp.float32
    if start > 0:
        h = jax.nn.selu(h.astype(act)) if start < n else h.astype(act)
    for i in range(start, n):
        lyr = layers[i]
        w = lyr["w"].astype(cd)
        h = (h.astype(cd) @ w).astype(act) + lyr["b"].astype(act)
        if i < n - 1:
            h = jax.nn.selu(h)
    if "ln" in params:
        hf = h.astype(jnp.float32)
        mean = hf.mean(axis=-1, keepdims=True)
        var = ((hf - mean) ** 2).mean(axis=-1, keepdims=True)
        hf = (hf - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (hf * params["ln"]["scale"] + params["ln"]["bias"]).astype(act)
    return h


def mlp_output_size(arch_tuple: ArchTuple) -> int:
    return int(arch_tuple[1][-1])
