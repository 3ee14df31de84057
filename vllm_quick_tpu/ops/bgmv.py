"""Batched-gather LoRA matvec (the Punica BGMV analogue; reference:
csrc/punica/punica_ops.cc:74+, vllm/lora/punica.py:16-60).

TPU-native design (SURVEY §2.7 Punica row): instead of a custom
gather-GEMV kernel, the per-token LoRA selection is a one-hot mask on
the slot axis folded into two dense matmuls —

    h[t, l, r] = x[t, :] @ A[l, :, :]        (small: L*r columns)
    h *= onehot(idx[t], L)
    y[t, :]   = h.reshape(T, L*r) @ B.reshape(L*r, N)

both land on the MXU with static shapes; the masked slot axis costs
L*r extra columns (L=max_loras is small), never a [T, N, L] tensor.
"""
from typing import Optional

import jax
import jax.numpy as jnp


def bgmv(
    x: jax.Array,          # [T, K]
    lora_a: jax.Array,     # [L, K, R]
    lora_b: jax.Array,     # [L, R, N] (scaling folded in)
    indices: jax.Array,    # [T] int32 slot per token; -1 = no LoRA
) -> jax.Array:
    """y[t] = x[t] @ A[idx[t]] @ B[idx[t]] (0 where idx < 0)."""
    l, k, r = lora_a.shape
    t = x.shape[0]
    xf = x.astype(jnp.float32)
    h = jnp.einsum("tk,lkr->tlr", xf, lora_a.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    mask = jax.nn.one_hot(indices, l, dtype=jnp.float32)     # [T, L]
    h = h * mask[:, :, None]
    y = jnp.dot(h.reshape(t, l * r),
                lora_b.astype(jnp.float32).reshape(l * r, -1),
                preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def apply_lora(y: jax.Array, x: jax.Array, lora_a: jax.Array,
               lora_b: jax.Array,
               indices: Optional[jax.Array]) -> jax.Array:
    """y += bgmv(x) with arbitrary leading dims on x/y."""
    if indices is None:
        return y
    lead = x.shape[:-1]
    delta = bgmv(x.reshape(-1, x.shape[-1]), lora_a, lora_b,
                 indices.reshape(-1))
    return y + delta.reshape(*lead, -1).astype(y.dtype)
