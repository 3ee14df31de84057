"""Pallas paged-attention decode kernel.

TPU-native replacement for the reference's PagedAttention v1/v2 CUDA
kernels (csrc/attention/attention_kernels.cu:91-560): grid over
sequences; the block table is scalar-prefetched into SMEM; each KV
block is fetched for *all* heads with one large HBM->VMEM DMA (double
buffered) — the DMA-issue-rate analogue of the CUDA kernel's coalesced
warp loads; softmax is online (running max/denominator) in fp32, like
the CUDA kernel's online softmax + v2 partitioning. GQA processes each
kv-head's whole query group together (attention_kernels.cu:141-142).

Layout contract (ops/cache_ops.py):
    k_cache, v_cache: [num_blocks, num_kv_heads, block_size, head_dim]
"""
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_quick_tpu.ops.attention import NEG_INF


def use_pallas_attention(head_size: int = 128,
                         block_size: int = 16,
                         kv_dtype=jnp.bfloat16) -> bool:
    """Compiled Pallas path requires lane-aligned head_dim (the cache's
    last dim is tiled (·,128) in HBM; a narrower head cannot be
    memref-sliced) and sublane-aligned block_size (8 for 16/32-bit KV,
    32 for fp8/int8 KV per the (32, 128) tile rule)."""
    if os.environ.get("VLLM_TPU_DISABLE_PALLAS_ATTN"):
        return False
    min_sublane = 32 if jnp.dtype(kv_dtype).itemsize == 1 else 8
    if head_size % 128 != 0 or block_size % min_sublane != 0:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False


# DMA pipeline depth. Per-block KV fetches are independent *contiguous*
# DMAs (a strided destination would shatter each copy into H pieces, a
# strided VMEM group view costs relayout copies — both measured slower).
# Compute per block is a single batched-over-heads MXU dot, so the
# per-iteration dispatch overhead stays small; depth hides DMA latency
# (measured raw pipelined copy: ~0.1 us/block).
_N_BUF = 8


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,    # [B, MB] int32 (SMEM)
    context_lens_ref,    # [B] int32 (SMEM)
    # inputs
    q_ref,               # [1, Hkv*Gp, D] VMEM
    k_hbm,               # [NB, Hkv, S, D] ANY (HBM)
    v_hbm,               # [NB, Hkv, S, D] ANY (HBM)
    alibi_ref,           # [Hkv*Gp, 1] f32 VMEM or None
    # outputs
    o_ref,               # [1, Hkv*Gp, D] VMEM (fp32)
    # scratch
    k_buf, v_buf,        # [N_BUF, Hkv, S, D] VMEM
    k_sem, v_sem,        # [N_BUF] DMA semaphores
    *,
    block_size: int,
    num_kv_heads: int,
    gp: int,
    scale: float,
    sliding_window: Optional[int],
):
    b = pl.program_id(0)
    ctx = context_lens_ref[b]
    s_blk = block_size
    num_blocks = jax.lax.div(ctx + s_blk - 1, s_blk)
    h = num_kv_heads

    def start_dma(slot, j):
        blk = block_tables_ref[b, j]
        pltpu.make_async_copy(k_hbm.at[blk], k_buf.at[slot],
                              k_sem.at[slot]).start()
        pltpu.make_async_copy(v_hbm.at[blk], v_buf.at[slot],
                              v_sem.at[slot]).start()

    def wait_dma(slot):
        pltpu.make_async_copy(k_buf.at[slot], k_buf.at[slot],
                              k_sem.at[slot]).wait()
        pltpu.make_async_copy(v_buf.at[slot], v_buf.at[slot],
                              v_sem.at[slot]).wait()

    for j0 in range(_N_BUF):
        @pl.when(j0 < num_blocks)
        def _(j0=j0):
            start_dma(j0, j0)

    rows = h * gp
    d = q_ref.shape[-1]
    q3 = q_ref[0].astype(jnp.float32).reshape(h, gp, d)  # [H, Gp, D]

    def body(j, carry):
        m, l, acc = carry                  # [rows,1], [rows,1], [rows,D]
        slot = jax.lax.rem(j, _N_BUF)
        wait_dma(slot)

        kb = k_buf[slot].astype(jnp.float32)             # [H, S, D]
        # One batched-over-heads MXU dot: [H, Gp, S].
        s = jax.lax.dot_general(
            q3, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s.reshape(rows, s_blk) * scale

        pos = j * s_blk + jax.lax.broadcasted_iota(
            jnp.int32, (rows, s_blk), 1)
        mask = pos < ctx
        if sliding_window is not None:
            mask = jnp.logical_and(mask, pos >= ctx - sliding_window)
        if alibi_ref is not None:
            slopes = alibi_ref[:, :]                     # [rows, 1]
            s = s + slopes * (pos - (ctx - 1)).astype(jnp.float32)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)                           # [rows, S]
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)

        vb = v_buf[slot].astype(jnp.float32)             # [H, S, D]
        pv = jax.lax.dot_general(
            p.reshape(h, gp, s_blk), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [H, Gp, D]
        acc = acc * alpha + pv.reshape(rows, d)

        @pl.when(j + _N_BUF < num_blocks)
        def _():
            start_dma(slot, j + _N_BUF)

        return m_new, l_new, acc

    m0 = jnp.full((rows, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((rows, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((rows, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))
    o_ref[0] = acc / jnp.maximum(l, 1e-20)


@functools.partial(
    jax.jit,
    static_argnames=("gp", "scale", "sliding_window", "interpret"))
def _paged_decode(q, k_cache, v_cache, block_tables, context_lens,
                  alibi, *, gp, scale, sliding_window, interpret=False):
    b, rows, d = q.shape
    nb, hkv, s, _ = k_cache.shape

    kernel = functools.partial(
        _decode_kernel,
        block_size=s,
        num_kv_heads=hkv,
        gp=gp,
        scale=scale,
        sliding_window=sliding_window,
    )

    in_specs = [
        pl.BlockSpec((1, rows, d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if alibi is not None:
        in_specs.append(pl.BlockSpec((rows, 1), lambda i, *_: (0, 0)))
        args = [q, k_cache, v_cache, alibi]
    else:
        # Pallas maps None inputs through; pass a dummy removed below.
        def kernel_noalibi(bt, cl, q_ref, k_hbm, v_hbm, o_ref,
                           k_buf, v_buf, k_sem, v_sem):
            return _decode_kernel(bt, cl, q_ref, k_hbm, v_hbm, None,
                                  o_ref, k_buf, v_buf, k_sem, v_sem,
                                  block_size=s, num_kv_heads=hkv, gp=gp,
                                  scale=scale,
                                  sliding_window=sliding_window)
        kernel = kernel_noalibi
        args = [q, k_cache, v_cache]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, d), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, hkv, s, d), k_cache.dtype),
            pltpu.VMEM((_N_BUF, hkv, s, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, d), jnp.float32),
        interpret=interpret,
    )(block_tables, context_lens, *args)


def paged_decode_attention(
    q: jax.Array,               # [B, Hq, D]
    k_cache: jax.Array,         # [NB, Hkv, S, D]
    v_cache: jax.Array,
    block_tables: jax.Array,    # [B, MB] int32
    context_lens: jax.Array,    # [B] int32
    scale: float,
    alibi_slopes: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    b, hq, d = q.shape
    hkv = k_cache.shape[1]
    g = hq // hkv
    # Pad each kv-head's query group to a sublane multiple.
    gp = max(8, -(-g // 8) * 8)
    qg = q.reshape(b, hkv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    qg = qg.reshape(b, hkv * gp, d)
    alibi = None
    if alibi_slopes is not None:
        al = jnp.pad(alibi_slopes.reshape(hkv, g), ((0, 0), (0, gp - g)))
        alibi = al.reshape(hkv * gp, 1).astype(jnp.float32)
    out = _paged_decode(qg.astype(jnp.bfloat16), k_cache, v_cache,
                        block_tables.astype(jnp.int32),
                        context_lens.astype(jnp.int32), alibi,
                        gp=gp, scale=float(scale),
                        sliding_window=sliding_window,
                        interpret=interpret)
    out = out.reshape(b, hkv, gp, d)[:, :, :g, :].reshape(b, hq, d)
    return out.astype(q.dtype)
