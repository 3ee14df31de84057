"""Context parallelism: ring-attention prefill + partial paged decode.

The reference has NO sequence/context parallelism — a prompt longer
than max_num_batched_tokens is rejected outright
(vllm/core/scheduler.py:193-202) and max context is bounded by one
GPU's paged-KV capacity. On TPU the natural long-context lever is a
mesh axis: shard the sequence (prefill) and the paged block pool
(decode) over ``sp`` ranks, so both the O(T^2) prefill FLOPs and the
O(T) per-step KV stream scale out with chips.

Two collective patterns, both pure XLA (ICI-routed by the compiler):

* **Prefill** — classic ring attention: each rank holds one contiguous
  chunk of Q/K/V; K/V chunks rotate around the ring with
  ``lax.ppermute`` while flash-style online-softmax statistics
  accumulate per Q chunk. Peak memory per rank stays O(T/sp), so the
  reachable context grows linearly with the ring size.
* **Decode** — each rank computes attention over its local shard of
  the block pool, emitting unnormalized (num, sumexp, max) partials;
  a pmax/psum log-sum-exp combine produces exact softmax attention
  over the full context.

Numerics match ops/attention.py's reference paths bit-for-eps
(tests/distributed/test_ring_attention.py).
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def ring_prefill_attention(
    q: jax.Array,              # [B, Tl, Hq, D] this rank's chunk
    k: jax.Array,              # [B, Tl, Hkv, D]
    v: jax.Array,              # [B, Tl, Hkv, D]
    prompt_lens: jax.Array,    # [B] GLOBAL prompt lengths (pads -> 0)
    scale: float,
    axis_name: str,
    sp_size: int,
    positions: Optional[jax.Array] = None,   # [B, Tl] global positions
) -> jax.Array:
    """Causal self-attention over a sequence sharded into ``sp_size``
    per-rank chunks; returns this rank's output chunk.

    K/V rotate ring-wise (rank i sends to i+1), so after rotation step
    s rank r holds chunk (r - s) mod sp — every rank sees every chunk
    exactly once while only two chunks are ever resident.

    Chunk-to-rank assignment is free: when ``positions`` is given, the
    causal mask uses those explicit global positions (e.g. the
    block-strided layout the engine uses, which also balances causal
    work across ranks); when omitted, rank r is assumed to hold the
    contiguous range [r*Tl, (r+1)*Tl). Fully-masked pairs cost one
    wasted matmul; contiguous layout wastes the standard (sp-1)/2sp,
    strided layouts less.
    """
    b, tl, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    idx = jax.lax.axis_index(axis_name)
    qf = q.astype(jnp.float32).reshape(b, tl, hkv, g, d)
    qf = jnp.moveaxis(qf, 1, 3)                      # [B, Hkv, G, Tq, D]
    if positions is None:
        q_pos = jnp.broadcast_to(idx * tl + jnp.arange(tl),
                                 (b, tl))            # [B, Tq] global
    else:
        q_pos = positions

    # K-slice width: bounds the materialized [.., Tq, KC] logits so
    # peak memory stays O(Tl * KC) per rotation, not O(Tl^2) — at the
    # long contexts sp exists for, a full [Tl, Tl] slab would be GBs.
    # Largest power-of-two divisor of Tl capped at 512, so any chunk
    # length gets sliced (tl is even in practice; odd tl degrades to
    # one slice).
    kc = tl
    for cand in (512, 256, 128, 64, 32, 16, 8, 4, 2):
        if tl % cand == 0:
            kc = min(cand, tl)
            break
    n_sub = tl // kc

    m0 = jnp.full((b, hkv, g, tl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, tl), jnp.float32)
    a0 = jnp.zeros((b, hkv, g, tl, d), jnp.float32)
    perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]

    def body(s, carry):
        # K positions travel WITH the K/V chunks around the ring, so
        # any chunk-to-rank layout masks correctly.
        k_cur, v_cur, kp, m, l, acc = carry

        def sub(j, carry2):
            m, l, acc = carry2
            ks = jax.lax.dynamic_slice_in_dim(k_cur, j * kc, kc, axis=1)
            vs = jax.lax.dynamic_slice_in_dim(v_cur, j * kc, kc, axis=1)
            k_pos = jax.lax.dynamic_slice_in_dim(kp, j * kc, kc,
                                                 axis=1)  # [B, KC]
            logits = jnp.einsum(
                "bhgqd,bkhd->bhgqk", qf, ks.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST) * scale
            mask = jnp.logical_and(                   # [B, Tq, KC]
                q_pos[:, :, None] >= k_pos[:, None, :],
                k_pos[:, None, :] < prompt_lens[:, None, None])
            logits = jnp.where(mask[:, None, None], logits, NEG_INF)
            row_max = jnp.max(logits, axis=-1)
            m_new = jnp.maximum(m, row_max)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(logits - m_safe[..., None])
            p = jnp.where(mask[:, None, None], p, 0.0)
            alpha = jnp.where(jnp.isfinite(m),
                              jnp.exp(m - m_safe), 0.0)
            l = l * alpha + jnp.sum(p, axis=-1)
            acc = acc * alpha[..., None] + jnp.einsum(
                "bhgqk,bkhd->bhgqd", p, vs.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST)
            return m_new, l, acc

        m, l, acc = jax.lax.fori_loop(0, n_sub, sub, (m, l, acc))
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        kp_nxt = jax.lax.ppermute(kp, axis_name, perm)
        return k_nxt, v_nxt, kp_nxt, m, l, acc

    _, _, _, m, l, acc = jax.lax.fori_loop(
        0, sp_size, body, (k, v, q_pos, m0, l0, a0))
    out = jnp.where(l[..., None] > 0, acc / jnp.maximum(l[..., None],
                                                        1e-38), 0.0)
    out = jnp.moveaxis(out, 3, 1).reshape(b, tl, hq, d)  # [B,Tq,Hq,D]
    return out.astype(q.dtype)


def paged_decode_attention_partial(
    q: jax.Array,               # [B, Hq, D]
    k_cache: jax.Array,         # [NB_local, Hkv, S, D] local pool shard
    v_cache: jax.Array,
    block_tables: jax.Array,    # [B, MB_local] LOCAL block ids
    context_lens: jax.Array,    # [B] tokens resident on THIS rank
    scale: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Unnormalized attention partials over a local pool shard:
    (num [B,Hq,D] f32 = sum p_i * v_i at local max, l [B,Hq] = sum p_i,
    m [B,Hq] = local max logit). Ranks with context_lens == 0 return
    (0, 0, -inf) and drop out of the combine."""
    b, hq, d = q.shape
    _, hkv, bs, _ = k_cache.shape
    g = hq // hkv
    mb = block_tables.shape[1]
    t = mb * bs

    flat = block_tables.reshape(-1)
    k = k_cache[flat].reshape(b, mb, hkv, bs, d).swapaxes(1, 2) \
        .reshape(b, hkv, t, d)
    v = v_cache[flat].reshape(b, mb, hkv, bs, d).swapaxes(1, 2) \
        .reshape(b, hkv, t, d)

    qf = q.astype(jnp.float32).reshape(b, hkv, g, d)
    logits = jnp.einsum("bhgd,bhtd->bhgt", qf, k.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST) * scale
    pos = jnp.arange(t)[None, :]
    mask = pos < context_lens[:, None]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)                         # [B,Hkv,G]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe[..., None])
    p = jnp.where(mask[:, None, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    num = jnp.einsum("bhgt,bhtd->bhgd", p, v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return (num.reshape(b, hq, d), l.reshape(b, hq), m.reshape(b, hq))


def sp_decode_attention(
    q: jax.Array,               # [B, Hq, D] (replicated over sp)
    kv_cache: jax.Array,        # [NB_local, 2, Hkv, S, D] fused shard
    block_tables: jax.Array,    # [B, MB_local] local block ids
    context_lens: jax.Array,    # [B] local context per rank
    scale: float,
    axis_name: str,
) -> jax.Array:
    """Exact paged decode attention over an sp-sharded block pool:
    per-rank partials + log-sum-exp combine (pmax + 2 psum).

    The combine is exact: with global max M, each rank rescales by
    exp(m - M) before the sums, so softmax normalization happens once
    over the full context. Partials come from the Pallas decode kernel
    at its full DMA-pipelined rate on TPU; the jnp gather path is the
    CPU/odd-shape fallback.
    """
    from vllm_quick_tpu.ops.paged_attention import (
        paged_decode_attention_partials, use_pallas_attention)
    if use_pallas_attention(q.shape[-1], kv_cache.shape[3],
                            kv_cache.dtype):
        num, l, m = paged_decode_attention_partials(
            q, kv_cache, block_tables, context_lens, scale)
    else:
        num, l, m = paged_decode_attention_partial(
            q, kv_cache[:, 0], kv_cache[:, 1], block_tables,
            context_lens, scale)
    mg = jax.lax.pmax(m, axis_name)                     # [B,Hq] global
    mg_safe = jnp.where(jnp.isfinite(mg), mg, 0.0)
    alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - mg_safe), 0.0)
    num_g = jax.lax.psum(num * alpha[..., None], axis_name)
    l_g = jax.lax.psum(l * alpha, axis_name)
    out = jnp.where(l_g[..., None] > 0,
                    num_g / jnp.maximum(l_g[..., None], 1e-38), 0.0)
    return out.astype(q.dtype)
