"""Normalization layers (reference: vllm/model_executor/layers/layernorm.py).

Plain jnp: XLA fuses the norm into neighboring elementwise ops, which is
what the reference's fused CUDA kernels (layernorm_kernels.cu:12,40)
exist to do by hand.
"""
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array,
             eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def fused_add_rms_norm(
    x: jax.Array, residual: jax.Array, weight: jax.Array,
    eps: float = 1e-6) -> Tuple[jax.Array, jax.Array]:
    """Returns (normed(x + residual), x + residual) — the residual-update
    + norm pairing of layernorm_kernels.cu:40."""
    added = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(
        x.dtype)
    return rms_norm(added, weight, eps), added


def layer_norm(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array],
               eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
