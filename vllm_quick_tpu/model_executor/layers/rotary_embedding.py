"""Rotary position embeddings with scaling variants.

Capability parity with the reference (vllm/model_executor/layers/
rotary_embedding.py:1-374): neox and gpt-j rotation styles; linear,
dynamic-NTK and YaRN scaling. The fused CUDA op is unnecessary on TPU —
XLA fuses the cos/sin gather + rotate into the surrounding ops.
"""
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


class RotaryEmbedding:
    """Precomputed cos/sin table applied by position index."""

    def __init__(
        self,
        head_size: int,
        rotary_dim: int,
        max_position_embeddings: int,
        base: float,
        is_neox_style: bool = True,
    ) -> None:
        self.head_size = head_size
        self.rotary_dim = rotary_dim
        self.max_position_embeddings = max_position_embeddings
        self.base = base
        self.is_neox_style = is_neox_style
        self.cos_sin = self._compute_cos_sin_cache()  # [max_pos, rot_dim]

    def _compute_inv_freq(self, base: float) -> jnp.ndarray:
        return 1.0 / (base**(jnp.arange(0, self.rotary_dim, 2,
                                        dtype=jnp.float32) /
                             self.rotary_dim))

    def _compute_cos_sin_cache(self) -> jnp.ndarray:
        inv_freq = self._compute_inv_freq(self.base)
        t = jnp.arange(self.max_position_embeddings, dtype=jnp.float32)
        freqs = jnp.outer(t, inv_freq)                     # [P, rot/2]
        return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)

    def __call__(
        self,
        positions: jax.Array,   # [...] int32
        query: jax.Array,       # [..., num_heads, head_size]
        key: jax.Array,         # [..., num_kv_heads, head_size]
    ) -> Tuple[jax.Array, jax.Array]:
        cs = self.cos_sin[positions]                       # [..., rot_dim]
        cos, sin = jnp.split(cs, 2, axis=-1)               # [..., rot/2]
        cos = cos[..., None, :]
        sin = sin[..., None, :]
        return (self._apply(query, cos, sin),
                self._apply(key, cos, sin))

    def full_cos_sin(self, positions: jax.Array) -> jax.Array:
        """[..., 2, rot_dim] full-width cos/sin rows (halves duplicated,
        neox layout) for the in-kernel rotation of the fused decode
        attention path (ops/paged_attention.py). Identical gathers
        across layers CSE to one under jit."""
        cs = self.cos_sin[positions]                   # [..., rot_dim]
        cos, sin = jnp.split(cs, 2, axis=-1)
        return jnp.stack(
            [jnp.concatenate([cos, cos], axis=-1),
             jnp.concatenate([sin, sin], axis=-1)], axis=-2)

    def _apply(self, x: jax.Array, cos: jax.Array,
               sin: jax.Array) -> jax.Array:
        dtype = x.dtype
        rot = x[..., :self.rotary_dim].astype(jnp.float32)
        rest = x[..., self.rotary_dim:]
        if self.is_neox_style:
            x1 = rot[..., :self.rotary_dim // 2]
            x2 = rot[..., self.rotary_dim // 2:]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            rotated = jnp.concatenate([o1, o2], axis=-1)
        else:
            x1 = rot[..., 0::2]
            x2 = rot[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x2 * cos + x1 * sin
            rotated = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
        rotated = rotated.astype(dtype)
        if rest.shape[-1] == 0:
            return rotated
        return jnp.concatenate([rotated, rest], axis=-1)


class LinearScalingRotaryEmbedding(RotaryEmbedding):
    """Position interpolation: positions divided by ``scaling_factor``."""

    def __init__(self, head_size, rotary_dim, max_position_embeddings, base,
                 is_neox_style, scaling_factor: float) -> None:
        self.scaling_factor = scaling_factor
        super().__init__(head_size, rotary_dim, max_position_embeddings,
                         base, is_neox_style)

    def _compute_cos_sin_cache(self) -> jnp.ndarray:
        inv_freq = self._compute_inv_freq(self.base)
        max_len = int(self.max_position_embeddings * self.scaling_factor)
        t = jnp.arange(max_len, dtype=jnp.float32) / self.scaling_factor
        freqs = jnp.outer(t, inv_freq)
        return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)


class DynamicNTKScalingRotaryEmbedding(RotaryEmbedding):
    """NTK-aware base rescaling for contexts beyond the trained length."""

    def __init__(self, head_size, rotary_dim, max_position_embeddings, base,
                 is_neox_style, scaling_factor: float) -> None:
        self.scaling_factor = scaling_factor
        super().__init__(head_size, rotary_dim, max_position_embeddings,
                         base, is_neox_style)

    def _compute_cos_sin_cache(self) -> jnp.ndarray:
        max_len = int(self.max_position_embeddings * self.scaling_factor)
        base = self.base * (
            (self.scaling_factor * max_len / self.max_position_embeddings) -
            (self.scaling_factor - 1))**(self.rotary_dim /
                                         (self.rotary_dim - 2))
        inv_freq = self._compute_inv_freq(base)
        t = jnp.arange(max_len, dtype=jnp.float32)
        freqs = jnp.outer(t, inv_freq)
        return jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)], axis=-1)


def _yarn_find_correction_dim(num_rotations, dim, base,
                              max_position_embeddings) -> float:
    return (dim * math.log(max_position_embeddings /
                           (num_rotations * 2 * math.pi))) / \
        (2 * math.log(base))


def _yarn_find_correction_range(low_rot, high_rot, dim, base,
                                max_position_embeddings) -> Tuple[int, int]:
    low = math.floor(
        _yarn_find_correction_dim(low_rot, dim, base,
                                  max_position_embeddings))
    high = math.ceil(
        _yarn_find_correction_dim(high_rot, dim, base,
                                  max_position_embeddings))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp_mask(low: float, high: float,
                           dim: int) -> jnp.ndarray:
    if low == high:
        high += 0.001
    ramp = (jnp.arange(dim, dtype=jnp.float32) - low) / (high - low)
    return jnp.clip(ramp, 0, 1)


def _yarn_get_mscale(scale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * math.log(scale) + 1.0


class YaRNScalingRotaryEmbedding(RotaryEmbedding):
    """YaRN: NTK-by-parts interpolation + attention temperature mscale."""

    def __init__(self, head_size, rotary_dim, max_position_embeddings, base,
                 is_neox_style, scaling_factor: float, *,
                 extrapolation_factor: float = 1.0,
                 attn_factor: float = 1.0,
                 beta_fast: int = 32,
                 beta_slow: int = 1) -> None:
        self.scaling_factor = scaling_factor
        self.extrapolation_factor = extrapolation_factor
        self.attn_factor = attn_factor
        self.beta_fast = beta_fast
        self.beta_slow = beta_slow
        self.mscale = float(_yarn_get_mscale(scaling_factor) * attn_factor)
        super().__init__(head_size, rotary_dim, max_position_embeddings,
                         base, is_neox_style)

    def _compute_inv_freq(self, scaling_factor: float) -> jnp.ndarray:
        pos_freqs = self.base**(jnp.arange(0, self.rotary_dim, 2,
                                           dtype=jnp.float32) /
                                self.rotary_dim)
        inv_freq_extrapolation = 1.0 / pos_freqs
        inv_freq_interpolation = 1.0 / (scaling_factor * pos_freqs)
        low, high = _yarn_find_correction_range(
            self.beta_fast, self.beta_slow, self.rotary_dim, self.base,
            self.max_position_embeddings)
        mask = (1 - _yarn_linear_ramp_mask(low, high, self.rotary_dim // 2)
                ) * self.extrapolation_factor
        return (inv_freq_interpolation * (1 - mask) +
                inv_freq_extrapolation * mask)

    def _compute_cos_sin_cache(self) -> jnp.ndarray:
        inv_freq = self._compute_inv_freq(self.scaling_factor)
        t = jnp.arange(
            int(self.max_position_embeddings * self.scaling_factor),
            dtype=jnp.float32)
        freqs = jnp.outer(t, inv_freq)
        return jnp.concatenate(
            [jnp.cos(freqs) * self.mscale,
             jnp.sin(freqs) * self.mscale], axis=-1)


def get_rope(
    head_size: int,
    rotary_dim: int,
    max_position: int,
    base: float,
    is_neox_style: bool = True,
    rope_scaling: Optional[Dict[str, Any]] = None,
) -> RotaryEmbedding:
    """Factory matching the reference's get_rope (rotary_embedding.py:328)."""
    if rope_scaling is None:
        return RotaryEmbedding(head_size, rotary_dim, max_position, base,
                               is_neox_style)
    scaling_type = rope_scaling.get("type") or rope_scaling.get("rope_type")
    factor = rope_scaling.get("factor", 1.0)
    if scaling_type == "linear":
        return LinearScalingRotaryEmbedding(head_size, rotary_dim,
                                            max_position, base,
                                            is_neox_style, factor)
    if scaling_type == "dynamic":
        return DynamicNTKScalingRotaryEmbedding(head_size, rotary_dim,
                                                max_position, base,
                                                is_neox_style, factor)
    if scaling_type == "yarn":
        original_max = rope_scaling["original_max_position_embeddings"]
        extra = {
            k: v
            for k, v in rope_scaling.items()
            if k in ("extrapolation_factor", "attn_factor", "beta_fast",
                     "beta_slow")
        }
        return YaRNScalingRotaryEmbedding(head_size, rotary_dim,
                                          original_max, base, is_neox_style,
                                          factor, **extra)
    raise ValueError(f"Unknown RoPE scaling type {scaling_type}")
