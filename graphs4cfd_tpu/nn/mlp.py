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
    layers = params["layers"]
    n = len(layers)
    h = x
    for i, lyr in enumerate(layers):
        w = lyr["w"].astype(compute_dtype)
        h = (h.astype(compute_dtype) @ w).astype(jnp.float32) + lyr["b"]
        if i < n - 1:
            h = jax.nn.selu(h)
    if "ln" in params:
        mean = h.mean(axis=-1, keepdims=True)
        var = ((h - mean) ** 2).mean(axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * params["ln"]["scale"] + params["ln"]["bias"]
    return h


def mlp_output_size(arch_tuple: ArchTuple) -> int:
    return int(arch_tuple[1][-1])
