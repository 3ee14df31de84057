"""Paged attention layer module.

Reference parity: vllm/model_executor/layers/attention.py:96-347 —
writes new KV into the paged cache, then runs the prompt (causal
flash-style) or decode (paged) attention path. GQA is handled by head
grouping; ALiBi and sliding window are supported on both paths.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.ops.attention import (paged_decode_attention_ref,
                                          prefill_attention,
                                          prefix_prefill_attention)
from vllm_quick_tpu.ops.cache_ops import (reshape_and_cache,
                                          reshape_and_cache_prefill)
from vllm_quick_tpu.ops.paged_attention import (paged_decode_attention,
                                                use_pallas_attention)
from vllm_quick_tpu.ops.ring_attention import (ring_prefill_attention,
                                               sp_decode_attention)

# Fused cache array [NB, 2, H, S, D] (K at index 0, V at 1 of axis 1).
KVCache = jax.Array


class Attention:
    """Static per-layer attention config; stateless apply."""

    def __init__(
        self,
        num_heads: int,
        head_size: int,
        scale: float,
        num_kv_heads: Optional[int] = None,
        alibi_slopes: Optional[jax.Array] = None,
        sliding_window: Optional[int] = None,
        ctx=None,
    ) -> None:
        self.num_heads = num_heads
        self.head_size = head_size
        self.scale = float(scale)
        self.num_kv_heads = num_kv_heads or num_heads
        self.alibi_slopes = alibi_slopes
        self.sliding_window = sliding_window
        self.ctx = ctx
        assert self.num_heads % self.num_kv_heads == 0
        if ctx is not None and ctx.sp_size > 1:
            assert alibi_slopes is None and sliding_window is None, (
                "context parallelism (sp > 1) supports plain causal "
                "attention only")

    def fused_rope_write_ok(self, meta: InputMetadata, kv_cache: KVCache,
                            rotary_dim: int, is_neox_style: bool) -> bool:
        """Whether the single-call rope+write+attend decode kernel
        (ops/paged_attention.py::paged_decode_attention_fused) applies:
        plain causal decode (no ALiBi, no sliding window — the window
        ring layout breaks the kernel's append-only slot masking), no
        context parallelism, full-head neox rope, compiled-kernel cache
        geometry."""
        from vllm_quick_tpu.ops.paged_attention import fused_rope_write_ok
        if meta.is_prompt or self.sliding_window is not None:
            return False
        if self.ctx is not None and self.ctx.sp_size > 1:
            return False
        if meta.block_tables is None or meta.slot_mapping.ndim != 1:
            return False
        return fused_rope_write_ok(self.head_size, rotary_dim,
                                   is_neox_style, kv_cache.shape[3],
                                   kv_cache.dtype, self.alibi_slopes)

    def decode_fused_rope_write(
        self,
        q: jax.Array,         # [B, Hq, D] PRE-rope
        k: jax.Array,         # [B, Hkv, D] PRE-rope
        v: jax.Array,         # [B, Hkv, D]
        cos_sin: jax.Array,   # [B, 2, D] (RotaryEmbedding.full_cos_sin)
        kv_cache: KVCache,
        meta: InputMetadata,
    ) -> Tuple[jax.Array, KVCache]:
        """rope + cache write + paged attention in one Pallas call;
        caller gates with :meth:`fused_rope_write_ok`."""
        from vllm_quick_tpu.ops.paged_attention import (
            paged_decode_attention_fused)
        out, kv_cache = paged_decode_attention_fused(
            q, k, v, cos_sin, kv_cache, meta.block_tables,
            meta.context_lens, meta.slot_mapping, self.scale)
        b = q.shape[0]
        return (out.reshape(b, self.num_heads * self.head_size),
                kv_cache)

    def __call__(
        self,
        query: jax.Array,     # [B, L, Hq*D] prefill | [B, Hq*D] decode
        key: jax.Array,       # [..., Hkv*D]
        value: jax.Array,     # [..., Hkv*D]
        kv_cache: KVCache,    # [NB, 2, Hkv, S, D] fused
        meta: InputMetadata,
        positions: Optional[jax.Array] = None,   # [B, L] global (sp)
    ) -> Tuple[jax.Array, KVCache]:
        lead = query.shape[:-1]
        q = query.reshape(*lead, self.num_heads, self.head_size)
        k = key.reshape(*lead, self.num_kv_heads, self.head_size)
        v = value.reshape(*lead, self.num_kv_heads, self.head_size)

        # Write this step's K/V to the paged cache first (attention.py:129).
        if meta.is_prompt and k.ndim == 4 and meta.slot_mapping.ndim == 2:
            # Block-granular prompt write (ops/cache_ops.py).
            kv_cache = reshape_and_cache_prefill(k, v, kv_cache,
                                                 meta.slot_mapping)
        else:
            flat_k = k.reshape(-1, self.num_kv_heads, self.head_size)
            flat_v = v.reshape(-1, self.num_kv_heads, self.head_size)
            kv_cache = reshape_and_cache(flat_k, flat_v, kv_cache,
                                         meta.slot_mapping.reshape(-1))

        sp = self.ctx is not None and self.ctx.sp_size > 1
        if sp:
            # Context parallelism (absent in the reference, which
            # rejects prompts beyond one batch: core/scheduler.py:
            # 193-202). Sequence/block-pool shards per sp rank; see
            # ops/ring_attention.py for the collective patterns.
            if meta.is_prompt:
                assert meta.block_tables is None, (
                    "prefix caching is not supported under sp")
                out = ring_prefill_attention(
                    q, k, v, meta.prompt_lens, self.scale,
                    self.ctx.sp_axis, self.ctx.sp_size,
                    positions=positions)
            else:
                out = sp_decode_attention(
                    q, kv_cache, meta.block_tables, meta.context_lens,
                    self.scale, self.ctx.sp_axis)
            out = out.reshape(*lead, self.num_heads * self.head_size)
            return out, kv_cache

        if meta.is_prompt:
            if meta.block_tables is not None:
                # Prefix-cached prompt: attend over cached context too
                # (reference: attention.py:207-223 Triton path).
                out = prefix_prefill_attention(
                    q, k, v, kv_cache[:, 0], kv_cache[:, 1],
                    meta.block_tables, meta.context_lens,
                    meta.prompt_lens, self.scale,
                    alibi_slopes=self.alibi_slopes,
                    sliding_window=self.sliding_window)
            else:
                out = prefill_attention(
                    q, k, v, meta.prompt_lens, self.scale,
                    alibi_slopes=self.alibi_slopes,
                    sliding_window=self.sliding_window)
        else:
            if use_pallas_attention(self.head_size, kv_cache.shape[3],
                                    kv_cache.dtype):
                out = paged_decode_attention(
                    q, kv_cache, meta.block_tables,
                    meta.context_lens, self.scale,
                    alibi_slopes=self.alibi_slopes,
                    sliding_window=self.sliding_window)
            else:
                out = paged_decode_attention_ref(
                    q, kv_cache[:, 0], kv_cache[:, 1], meta.block_tables,
                    meta.context_lens, self.scale,
                    alibi_slopes=self.alibi_slopes,
                    sliding_window=self.sliding_window)
        out = out.reshape(*lead, self.num_heads * self.head_size)
        return out, kv_cache
