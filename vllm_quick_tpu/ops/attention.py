"""Attention ops: batched causal prefill and paged decode.

jnp reference implementations (ground truth + CPU path). The Pallas
decode kernel in ``paged_attention_pallas.py`` is the production path;
both share the cache layout documented in cache_ops.py.

Reference parity: vllm/model_executor/layers/attention.py (prompt via
flash attention :139-206, decode via paged_attention v1/v2 :275-347,
ALiBi :241-272, sliding window) and csrc/attention/attention_kernels.cu
(GQA :141-142, fp8 KV load-convert :219-228).
"""
import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_alibi_slopes(total_num_heads: int) -> jax.Array:
    """Standard ALiBi slope schedule (power-of-two interpolation)."""
    closest = 2**math.floor(math.log2(total_num_heads))
    base = 2.0**(-(2.0**-(math.log2(closest) - 3)))
    powers = [base**(i + 1) for i in range(closest)]
    if closest != total_num_heads:
        extra_base = 2.0**(-(2.0**-(math.log2(2 * closest) - 3)))
        num_extra = min(closest, total_num_heads - closest)
        powers += [extra_base**(2 * i + 1) for i in range(num_extra)]
    return jnp.asarray(powers, dtype=jnp.float32)


def _flash_prefill_ok(l: int, d: int, alibi_slopes,
                      sliding_window) -> bool:
    """Gate for the Pallas flash kernel: plain causal attention at
    MXU-friendly shapes on a TPU backend. Everything else uses the
    jnp path (which is also the CPU/test ground truth)."""
    from vllm_quick_tpu.ops.quant_matmul import default_backend_is_tpu
    import os
    if os.environ.get("VLLM_TPU_NO_FLASH"):
        return False
    # l >= 128: verified on chip at l=128 (round 4). Keeping short-len
    # buckets on the flash kernel matters for MEMORY, not just speed —
    # the XLA path materializes [B, H, L, L] f32 logits, and a
    # (b=32, l=128) serving bucket's temps (3.32 GiB) OOM'd a 7B engine
    # mid-serving where the probed (8, 512) bucket (1.49 GiB) fit.
    return (alibi_slopes is None and sliding_window is None
            and d % 128 == 0 and l % 128 == 0 and l >= 128
            and default_backend_is_tpu())


def _flash_prefill(q, k, v, scale):
    """Causal flash attention via the Pallas TPU kernel. Right-padded
    batches need no explicit mask: causal masking alone keeps pad KEYS
    (which sit after every real query) out of real rows, and pad rows'
    garbage is never read (their KV lands in the null block and only
    the last real token's hidden state is gathered)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention)
    b, l, hq, d = q.shape
    hkv = k.shape[2]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if hkv != hq:
        g = hq // hkv
        kt = jnp.repeat(kt, g, axis=1)
        vt = jnp.repeat(vt, g, axis=1)
    out = flash_attention(qt, kt, vt, causal=True, sm_scale=scale)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def prefill_attention(
    q: jax.Array,              # [B, L, num_heads, D]
    k: jax.Array,              # [B, L, num_kv_heads, D]
    v: jax.Array,              # [B, L, num_kv_heads, D]
    prompt_lens: jax.Array,    # [B] int32 (tokens beyond len are pad)
    scale: float,
    alibi_slopes: Optional[jax.Array] = None,   # [num_heads]
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Batched causal self-attention over (padded) prompts.

    Dispatches to the Pallas flash kernel at MXU shapes (the XLA path
    materializes the [L, L] logits and is HBM-bound — measured 7% MXU
    at L=1024, see benchmarks/kernels/benchmark_prefill_attention.py);
    otherwise fp32 softmax with GQA head-group reshape.
    """
    b, l, hq, d = q.shape
    if _flash_prefill_ok(l, d, alibi_slopes, sliding_window):
        return _flash_prefill(q, k, v, scale)
    hkv = k.shape[2]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, l, hkv, g, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # [B, Hkv, G, Lq, Lk]
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * scale

    pos = jnp.arange(l)
    causal = pos[None, :, None] >= pos[None, None, :]          # [1, Lq, Lk]
    valid = pos[None, None, :] < prompt_lens[:, None, None]    # [B, 1, Lk]
    mask = jnp.logical_and(causal, valid)
    if sliding_window is not None:
        in_window = pos[None, :, None] - pos[None, None, :] < sliding_window
        mask = jnp.logical_and(mask, in_window)
    if alibi_slopes is not None:
        slopes = alibi_slopes.reshape(hkv, g)
        bias = slopes[None, :, :, None, None] * (
            pos[None, None, None, None, :] -
            pos[None, None, None, :, None]).astype(jnp.float32)
        logits = logits + bias
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vf)
    return out.reshape(b, l, hq, d).astype(q.dtype)


def paged_decode_attention_ref(
    q: jax.Array,               # [B, num_heads, D]
    k_cache: jax.Array,         # [num_blocks, Hkv, block_size, D]
    v_cache: jax.Array,         # [num_blocks, Hkv, block_size, D]
    block_tables: jax.Array,    # [B, max_blocks] int32
    context_lens: jax.Array,    # [B] int32 (includes current token)
    scale: float,
    alibi_slopes: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Gather-based paged attention for one decode token per sequence.

    Ground truth for the Pallas kernel and the CPU execution path. The
    current token's K/V must already be written to the cache (same
    contract as the reference: attention.py:129-137 writes first, then
    attends).
    """
    b, hq, d = q.shape
    _, hkv, bs, _ = k_cache.shape
    g = hq // hkv
    mb = block_tables.shape[1]
    t = mb * bs

    flat = block_tables.reshape(-1)                       # [B*MB]
    # [B*MB, Hkv, S, D] -> [B, Hkv, T, D]
    k = k_cache[flat].reshape(b, mb, hkv, bs, d).swapaxes(1, 2) \
        .reshape(b, hkv, t, d)
    v = v_cache[flat].reshape(b, mb, hkv, bs, d).swapaxes(1, 2) \
        .reshape(b, hkv, t, d)

    qf = q.astype(jnp.float32).reshape(b, hkv, g, d)
    # HIGHEST: TPU f32 matmuls default to bf16 passes; this is the
    # ground-truth path, so force full f32 (clarity over speed).
    logits = jnp.einsum("bhgd,bhtd->bhgt", qf,
                        k.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST) * scale

    pos = jnp.arange(t)[None, :]                          # [1, T]
    mask = pos < context_lens[:, None]                    # [B, T]
    if sliding_window is not None:
        mask = jnp.logical_and(
            mask, pos >= context_lens[:, None] - sliding_window)
    if alibi_slopes is not None:
        slopes = alibi_slopes.reshape(hkv, g)
        dist = (pos - (context_lens[:, None] - 1)).astype(jnp.float32)
        logits = logits + slopes[None, :, :, None] * dist[:, None, None, :]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgt,bhtd->bhgd", probs, v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, hq, d).astype(q.dtype)


def prefix_prefill_attention(
    q: jax.Array,               # [B, L, num_heads, D] (new tokens only)
    k: jax.Array,               # [B, L, num_kv_heads, D]
    v: jax.Array,               # [B, L, num_kv_heads, D]
    k_cache: jax.Array,         # [num_blocks, Hkv, S, D]
    v_cache: jax.Array,         # [num_blocks, Hkv, S, D]
    block_tables: jax.Array,    # [B, max_blocks] int32 (prefix blocks)
    prefix_lens: jax.Array,     # [B] int32 cached-context lengths
    prompt_lens: jax.Array,     # [B] int32 NEW token counts (pad -> 0)
    scale: float,
    alibi_slopes: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Attention of new prompt tokens over [cached prefix + new tokens]
    (the reference's Triton context_attention_fwd,
    triton_kernel/prefix_prefill.py:609)."""
    b, l, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    s = k_cache.shape[2]
    mb = block_tables.shape[1]
    p_max = mb * s

    # Gather cached prefix K/V: [B, MB*S, Hkv, D].
    kc = k_cache[block_tables].astype(jnp.float32)
    vc = v_cache[block_tables].astype(jnp.float32)
    kc = kc.transpose(0, 1, 3, 2, 4).reshape(b, p_max, hkv, d)
    vc = vc.transpose(0, 1, 3, 2, 4).reshape(b, p_max, hkv, d)

    k_full = jnp.concatenate([kc, k.astype(jnp.float32)], axis=1)
    v_full = jnp.concatenate([vc, v.astype(jnp.float32)], axis=1)

    qf = q.astype(jnp.float32).reshape(b, l, hkv, g, d)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qf, k_full) * scale

    new_idx = jnp.arange(l)
    qpos = prefix_lens[:, None] + new_idx[None, :]             # [B, L]
    kpos = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(p_max)[None, :], (b, p_max)),
         qpos], axis=1)                                        # [B, P+L]
    key_valid = jnp.concatenate(
        [jnp.arange(p_max)[None, :] < prefix_lens[:, None],
         new_idx[None, :] < prompt_lens[:, None]], axis=1)     # [B, P+L]
    mask = jnp.logical_and(kpos[:, None, :] <= qpos[:, :, None],
                           key_valid[:, None, :])              # [B, L, P+L]
    if sliding_window is not None:
        mask = jnp.logical_and(
            mask, qpos[:, :, None] - kpos[:, None, :] < sliding_window)
    if alibi_slopes is not None:
        slopes = alibi_slopes.reshape(hkv, g)
        bias = slopes[None, :, :, None, None] * (
            kpos[:, None, None, None, :]
            - qpos[:, None, None, :, None]).astype(jnp.float32)
        logits = logits + bias
    logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v_full)
    return out.reshape(b, l, hq, d).astype(q.dtype)
