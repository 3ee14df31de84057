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
    kv_cache: [num_blocks, 2, num_kv_heads, block_size, head_dim]
(K at index 0 / V at index 1 of axis 1 — one contiguous DMA fetches a
block's K AND V, halving the scattered-DMA count that bounds batch-1).

Measured bottleneck analysis (tunneled v5e, honest host-fetch timing):
batch-64 runs at the chip's copy roofline (~120 GB/s); batch-1 is bound
by per-DMA issue cost (~7 us per scattered block fetch, confirmed by a
DMA-only kernel variant), not by compute or MXU rate. Next step on
file: fuse K and V into one [NB, 2, H, S, D] cache array (halves DMA
count) and raise the default block size — projected ~4x at batch 1.
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


# Pipeline geometry. Per-block KV fetches are independent *contiguous*
# DMAs; _W blocks form one compute group. Per-group compute is TWO big
# MXU dots over the flattened [W*H*S, D] group with a precomputed
# block-diagonal head mask — cross-head score columns are masked to
# -inf (and contribute exact zeros through the PV matmul), trading
# hkv-fold MXU FLOP inflation (still far below the DMA cost) for a
# ~10x reduction in per-iteration op count, the measured bottleneck.
_W = int(os.environ.get("VLLM_TPU_ATTN_W", "4"))       # blocks/group
_N_GRP = int(os.environ.get("VLLM_TPU_ATTN_NGRP", "4"))  # groups in flight


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,    # [B, MB] int32 (SMEM)
    context_lens_ref,    # [B] int32 (SMEM)
    # inputs
    q_ref,               # [1, Hkv*Gp, D] VMEM
    kv_hbm,              # [NB, 2, Hkv, S, D] ANY (HBM)
    alibi_ref,           # [Hkv*Gp, 1] f32 VMEM or None
    # outputs
    o_ref,               # [1, Hkv*Gp, D] VMEM (fp32)
    # scratch — K and V buffered separately so compute reads are
    # contiguous (a strided kv_buf[:, 0] read forces a VMEM relayout
    # copy); the HBM side stays the fused [NB, 2, ...] layout and each
    # buffer fills from a strided view of it.
    k_buf,               # [N_GRP, W, Hkv, S, D] VMEM
    v_buf,               # [N_GRP, W, Hkv, S, D] VMEM
    k_sem,               # [N_GRP, W] DMA semaphores
    v_sem,               # [N_GRP, W] DMA semaphores
    *,
    block_size: int,
    num_kv_heads: int,
    gp: int,
    scale: float,
    sliding_window: Optional[int],
    lm_ref=None,         # [1, rows, 128] f32: col 0 = sumexp l, col 1
                         # = running max m; set for the sp-partials
                         # variant (ops/ring_attention.py combine).
    rw=None,             # fused rope+cache-write refs (dict): slots
                         # (SMEM [B]), knew/vnew ([1, Hkv, D] VMEM,
                         # pre-rope), cs ([1, 2, D] f32 VMEM: full-width
                         # cos/sin), kv_out (ANY, aliased to kv_hbm),
                         # wbuf ([2, Hkv, S, D] cache-dtype VMEM block
                         # RMW staging), wsem (DMA (2,): read, write).
):
    b = pl.program_id(0)
    ctx = context_lens_ref[b]
    s_blk = block_size
    h = num_kv_heads
    d = q_ref.shape[-1]
    if rw is None:
        ctx_str = ctx                    # tokens streamed from HBM
    else:
        # Fused rope + cache write + attend (decode): the current
        # token's K/V never round-trips through an XLA dus — it is
        # rotated, quantized and DMA'd into the paged cache FROM THE
        # KERNEL while the streamed part of attention runs, and its
        # attention contribution is added from VMEM in the epilogue
        # (so there is no read-after-write hazard: streamed positions
        # are masked to pos < ctx-1). Replaces the per-layer XLA rope
        # fusions + fp8-convert + fused-dus write (the reference pays
        # a separate reshape_and_cache kernel launch per layer,
        # csrc/cache_kernels.cu:269).
        assert lm_ref is None
        ctx_str = ctx - 1
        slot = rw["slots"][b]
        blk_w = jax.lax.div(slot, s_blk)
        off_w = jax.lax.rem(slot, s_blk)
        cosf = rw["cs"][0, 0:1, :].astype(jnp.float32)   # [1, D]
        sinf = rw["cs"][0, 1:2, :].astype(jnp.float32)
        half_d = d // 2

        def _rope(x):                    # [r, D] f32, neox rotate-half
            xr = jnp.concatenate([-x[:, half_d:], x[:, :half_d]], axis=1)
            return x * cosf + xr * sinf

        kn = _rope(rw["knew"][0].astype(jnp.float32))
        vn = rw["vnew"][0].astype(jnp.float32)
        # Whole-block read-modify-write: sub-tile (single sublane) DMA
        # slices are illegal under Mosaic's packed tilings (bf16 packs
        # 2 sublanes/word, fp8 more), so fetch the target block pair,
        # replace the slot's row with a vector select, and write the
        # block back. Rows other than the slot are written back
        # byte-identical, so the in-flight write-back cannot corrupt a
        # concurrent streamed read of the same block; the slot row
        # itself is excluded from the streamed mask (pos < ctx-1).
        r_dma = pltpu.make_async_copy(kv_hbm.at[blk_w], rw["wbuf"],
                                      rw["wsem"].at[0])
        r_dma.start()
    num_blocks = jax.lax.div(ctx_str + s_blk - 1, s_blk)
    num_groups = jax.lax.div(num_blocks + _W - 1, _W)

    def start_block(g_slot, w, j):
        blk = block_tables_ref[b, j]
        pltpu.make_async_copy(kv_hbm.at[blk, 0], k_buf.at[g_slot, w],
                              k_sem.at[g_slot, w]).start()
        pltpu.make_async_copy(kv_hbm.at[blk, 1], v_buf.at[g_slot, w],
                              v_sem.at[g_slot, w]).start()

    def group_is_contiguous(g):
        # True when the group's _W block-table entries are physically
        # consecutive and fully in range — the common case under the
        # sequential block allocator. Scalar SMEM reads; cheap.
        # In-bounds by construction: the wrapper asserts the padded
        # block-table width is a multiple of _W (an in-kernel index
        # clamp here measurably slows the scalar DMA-issue path).
        first = block_tables_ref[b, g * _W]
        ok = (g + 1) * _W <= num_blocks
        for w in range(1, _W):
            ok = jnp.logical_and(
                ok, block_tables_ref[b, g * _W + w] == first + w)
        return ok

    def start_group(g):
        g_slot = jax.lax.rem(g, _N_GRP)
        contig = group_is_contiguous(g)

        @pl.when(contig)
        def _():
            # DMA issue (~2-7 us each) bounds batch-1 decode, so fetch
            # the whole window with TWO strided copies (all K planes,
            # all V planes) instead of per-block copies.
            first = block_tables_ref[b, g * _W]
            pltpu.make_async_copy(kv_hbm.at[pl.ds(first, _W), 0],
                                  k_buf.at[g_slot],
                                  k_sem.at[g_slot, 0]).start()
            pltpu.make_async_copy(kv_hbm.at[pl.ds(first, _W), 1],
                                  v_buf.at[g_slot],
                                  v_sem.at[g_slot, 0]).start()

        @pl.when(jnp.logical_not(contig))
        def _():
            # Scattered/tail path. Tail fetches are clamped to the last
            # valid block: the buffer stays finite (0 * NaN would poison
            # the PV matmul); the position mask discards the duplicates.
            for w in range(_W):
                j = jnp.minimum(g * _W + w, num_blocks - 1)
                start_block(g_slot, w, j)

    def wait_group(g):
        g_slot = jax.lax.rem(g, _N_GRP)
        contig = group_is_contiguous(g)

        @pl.when(contig)
        def _():
            pltpu.make_async_copy(k_buf.at[g_slot], k_buf.at[g_slot],
                                  k_sem.at[g_slot, 0]).wait()
            pltpu.make_async_copy(v_buf.at[g_slot], v_buf.at[g_slot],
                                  v_sem.at[g_slot, 0]).wait()

        @pl.when(jnp.logical_not(contig))
        def _():
            for w in range(_W):
                pltpu.make_async_copy(k_buf.at[g_slot, w],
                                      k_buf.at[g_slot, w],
                                      k_sem.at[g_slot, w]).wait()
                pltpu.make_async_copy(v_buf.at[g_slot, w],
                                      v_buf.at[g_slot, w],
                                      v_sem.at[g_slot, w]).wait()

    for g0 in range(_N_GRP):
        @pl.when(g0 < num_groups)
        def _(g0=g0):
            start_group(g0)

    rows = h * gp
    cols = _W * h * s_blk      # flattened group column count
    # bf16 MXU operands with fp32 accumulation: full MXU rate (the
    # masked dot carries an hkv-fold FLOP inflation, so rate matters).
    if rw is None:
        q2 = q_ref[0]                                    # [rows, D] bf16
    else:
        q2 = _rope(q_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
        # Splice the new row into the fetched block and write it back
        # (one block-pair DMA each way; see the RMW note above).
        r_dma.wait()
        sel = jax.lax.broadcasted_iota(jnp.int32, (1, s_blk, 1),
                                       1) == off_w
        kc = kn.astype(rw["wbuf"].dtype)                 # [Hkv, D]
        vc = vn.astype(rw["wbuf"].dtype)
        rw["wbuf"][0] = jnp.where(sel, kc[:, None, :], rw["wbuf"][0])
        rw["wbuf"][1] = jnp.where(sel, vc[:, None, :], rw["wbuf"][1])
        w_dma = pltpu.make_async_copy(rw["wbuf"],
                                      rw["kv_out"].at[blk_w],
                                      rw["wsem"].at[1])
        w_dma.start()

    # Static per-column metadata: owning kv-head and within-group token
    # offset. Column c = (w * H + head) * S + s.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    col_head = jax.lax.rem(jax.lax.div(col, s_blk), h)   # [1, cols]
    col_off = (jax.lax.div(col, h * s_blk) * s_blk
               + jax.lax.rem(col, s_blk))                # local token idx
    row_head = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0), gp)
    head_ok = row_head == col_head                       # [rows, cols]

    def body(g, carry):
        m, l, acc = carry                  # [rows,1], [rows,1], [rows,D]
        g_slot = jax.lax.rem(g, _N_GRP)
        wait_group(g)

        kg = k_buf[g_slot].astype(jnp.bfloat16).reshape(cols, d)
        # One MXU dot across all (block, head, token) columns; the
        # block-diagonal head mask kills cross-head terms.
        s = jax.lax.dot_general(
            q2, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [rows, cols]

        pos = g * (_W * s_blk) + col_off                 # [1, cols]
        mask = jnp.logical_and(head_ok, pos < ctx_str)
        if sliding_window is not None:
            mask = jnp.logical_and(mask, pos >= ctx - sliding_window)
        if alibi_ref is not None:
            slopes = alibi_ref[:, :]                     # [rows, 1]
            s = s + slopes * (pos - (ctx - 1)).astype(jnp.float32)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)                           # [rows, cols]
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)

        vg = v_buf[g_slot].astype(jnp.bfloat16).reshape(cols, d)
        # Masked p is exactly zero off-head, so one dense PV dot is
        # correct per row. p in bf16 (values in [0,1]) keeps the MXU at
        # full rate, standard flash-attention practice.
        pv = jnp.dot(p.astype(jnp.bfloat16), vg,
                     preferred_element_type=jnp.float32)
        acc = acc * alpha + pv

        @pl.when(g + _N_GRP < num_groups)
        def _():
            start_group(g + _N_GRP)

        return m_new, l_new, acc

    m0 = jnp.full((rows, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((rows, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((rows, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_groups, body, (m0, l0, acc0))
    if rw is not None:
        # Current-token contribution from registers, via the cache-dtype
        # round trip so this step sees exactly the (possibly fp8) values
        # future steps will stream — step-invariant numerics.
        kq = kc.astype(jnp.float32).reshape(h, 1, d)
        vq = vc.astype(jnp.float32).reshape(h, 1, d)
        k_row = jnp.broadcast_to(kq, (h, gp, d)).reshape(rows, d)
        v_row = jnp.broadcast_to(vq, (h, gp, d)).reshape(rows, d)
        s_cur = jnp.sum(q2.astype(jnp.float32) * k_row, axis=1,
                        keepdims=True) * scale           # [rows, 1]
        m2 = jnp.maximum(m, s_cur)
        alpha = jnp.exp(m - m2)
        p_cur = jnp.exp(s_cur - m2)
        l = l * alpha + p_cur
        acc = acc * alpha + p_cur * v_row
        m = m2
        w_dma.wait()
    if lm_ref is None:
        o_ref[0] = acc / jnp.maximum(l, 1e-20)
    else:
        # Partials for a cross-shard log-sum-exp combine: acc is at
        # the LOCAL max m (matches exp(s - m) above), so the combiner
        # rescales by exp(m - M_global) before summing.
        o_ref[0] = acc
        lm_ref[0] = jnp.pad(jnp.concatenate([l, m], axis=1),
                            ((0, 0), (0, 126)))


def _decode_kernel_pipelined(
    block_tables_ref,    # [B, MB] int32 (SMEM)
    context_lens_ref,    # [B] int32 (SMEM)
    q_ref,               # [1, Hkv*Gp, D] VMEM
    kv_ref,              # [1, 2, Hkv, S, D] VMEM — pipelined KV block
    alibi_ref,           # [Hkv*Gp, 1] f32 VMEM or None
    o_ref,               # [1, Hkv*Gp, D] VMEM (fp32)
    m_ref, l_ref, acc_ref,   # online-softmax state, persists over j
    *,
    block_size: int,
    num_kv_heads: int,
    gp: int,
    scale: float,
    sliding_window: Optional[int],
):
    """Pipeline-fed variant: the grid is (B, MB) and each step's KV
    block arrives through the Pallas input pipeline, whose HBM index is
    looked up from the scalar-prefetched block table — the same
    double-buffered fast path the quant GEMM streams its weights on,
    instead of kernel-issued manual DMAs."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    s_blk = block_size
    h = num_kv_heads
    ctx = context_lens_ref[b]
    num_blocks = jax.lax.div(ctx + s_blk - 1, s_blk)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < num_blocks)
    def _compute():
        rows = h * gp
        d = q_ref.shape[-1]
        cols = h * s_blk
        q2 = q_ref[0]                                    # [rows, D]
        kg = kv_ref[0, 0].astype(jnp.bfloat16).reshape(cols, d)
        s = jax.lax.dot_general(
            q2, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [rows, cols]

        col = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
        col_head = jax.lax.div(col, s_blk)
        col_off = jax.lax.rem(col, s_blk)
        row_head = jax.lax.div(
            jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0), gp)
        pos = j * s_blk + col_off
        mask = jnp.logical_and(row_head == col_head, pos < ctx)
        if sliding_window is not None:
            mask = jnp.logical_and(mask, pos >= ctx - sliding_window)
        if alibi_ref is not None:
            s = s + alibi_ref[:, :] * (pos - (ctx - 1)).astype(jnp.float32)
        s = jnp.where(mask, s, NEG_INF)

        m = m_ref[:]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        vg = kv_ref[0, 1].astype(jnp.bfloat16).reshape(cols, d)
        pv = jnp.dot(p.astype(jnp.bfloat16), vg,
                     preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _done():
        o_ref[0] = acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)


@functools.partial(
    jax.jit,
    static_argnames=("gp", "scale", "sliding_window", "interpret"))
def _paged_decode_pipelined(q, kv_cache, block_tables, context_lens,
                            alibi, *, gp, scale, sliding_window,
                            interpret=False):
    b, rows, d = q.shape
    nb, _two, hkv, s, _ = kv_cache.shape
    mb = block_tables.shape[1]

    kernel = functools.partial(
        _decode_kernel_pipelined,
        block_size=s, num_kv_heads=hkv, gp=gp, scale=scale,
        sliding_window=sliding_window)

    def kv_index(i, j, bt_ref, cl_ref):
        # Data-dependent pipeline index: physical block for (seq, step).
        return (bt_ref[i, j], 0, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, rows, d), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, 2, hkv, s, d), kv_index),
    ]
    if alibi is not None:
        in_specs.append(pl.BlockSpec((rows, 1), lambda i, j, *_: (0, 0)))
        args = [q, kv_cache, alibi]
    else:
        def kernel_noalibi(bt, cl, q_ref, kv_ref, o_ref, m, l, acc):
            return _decode_kernel_pipelined(
                bt, cl, q_ref, kv_ref, None, o_ref, m, l, acc,
                block_size=s, num_kv_heads=hkv, gp=gp, scale=scale,
                sliding_window=sliding_window)
        kernel = kernel_noalibi
        args = [q, kv_cache]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, mb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, d), lambda i, j, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rows, d), jnp.float32),
        interpret=interpret,
    )(block_tables, context_lens, *args)


@functools.partial(
    jax.jit,
    static_argnames=("gp", "scale", "sliding_window", "interpret",
                     "partials"))
def _paged_decode(q, kv_cache, block_tables, context_lens,
                  alibi, *, gp, scale, sliding_window, interpret=False,
                  partials=False):
    b, rows, d = q.shape
    nb, _two, hkv, s, _ = kv_cache.shape

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
    ]
    if partials:
        assert alibi is None, "partials path is plain causal only"

        def kernel_partials(bt, cl, q_ref, kv_hbm, o_ref, lm_ref,
                            k_buf, v_buf, k_sem, v_sem):
            return _decode_kernel(bt, cl, q_ref, kv_hbm, None,
                                  o_ref, k_buf, v_buf, k_sem, v_sem,
                                  block_size=s, num_kv_heads=hkv, gp=gp,
                                  scale=scale,
                                  sliding_window=sliding_window,
                                  lm_ref=lm_ref)
        kernel = kernel_partials
        args = [q, kv_cache]
    elif alibi is not None:
        in_specs.append(pl.BlockSpec((rows, 1), lambda i, *_: (0, 0)))
        args = [q, kv_cache, alibi]
    else:
        # Pallas maps None inputs through; pass a dummy removed below.
        def kernel_noalibi(bt, cl, q_ref, kv_hbm, o_ref,
                           k_buf, v_buf, k_sem, v_sem):
            return _decode_kernel(bt, cl, q_ref, kv_hbm, None,
                                  o_ref, k_buf, v_buf, k_sem, v_sem,
                                  block_size=s, num_kv_heads=hkv, gp=gp,
                                  scale=scale,
                                  sliding_window=sliding_window)
        kernel = kernel_noalibi
        args = [q, kv_cache]

    out_spec = pl.BlockSpec((1, rows, d), lambda i, *_: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, rows, d), jnp.float32)
    if partials:
        out_spec = (out_spec,
                    pl.BlockSpec((1, rows, 128), lambda i, *_: (i, 0, 0)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, rows, 128), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((_N_GRP, _W, hkv, s, d), kv_cache.dtype),
            pltpu.VMEM((_N_GRP, _W, hkv, s, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((_N_GRP, _W)),
            pltpu.SemaphoreType.DMA((_N_GRP, _W)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(block_tables, context_lens, *args)


@functools.partial(
    jax.jit,
    static_argnames=("gp", "scale", "sliding_window", "interpret"),
    donate_argnums=(4,))
def _paged_decode_rw(q, knew, vnew, cs, kv_cache, block_tables,
                     context_lens, slots, *, gp, scale, sliding_window,
                     interpret=False):
    """Fused rope + cache-write + paged attention (decode). Returns
    (out [B, rows, D] f32, kv_cache) with the cache updated IN PLACE
    via pallas input_output_aliases — no XLA dus, no rope fusions."""
    b, rows, d = q.shape
    nb, _two, hkv, s, _ = kv_cache.shape

    def kernel(bt, cl, sl, q_ref, kv_hbm, knew_ref, vnew_ref, cs_ref,
               o_ref, kv_out, k_buf, v_buf, k_sem, v_sem, wbuf, wsem):
        return _decode_kernel(
            bt, cl, q_ref, kv_hbm, None, o_ref, k_buf, v_buf, k_sem,
            v_sem, block_size=s, num_kv_heads=hkv, gp=gp, scale=scale,
            sliding_window=sliding_window,
            rw=dict(slots=sl, knew=knew_ref, vnew=vnew_ref, cs=cs_ref,
                    kv_out=kv_out, wbuf=wbuf, wsem=wsem))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, hkv, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, hkv, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 2, d), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, rows, d), lambda i, *_: (i, 0, 0)),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((_N_GRP, _W, hkv, s, d), kv_cache.dtype),
            pltpu.VMEM((_N_GRP, _W, hkv, s, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((_N_GRP, _W)),
            pltpu.SemaphoreType.DMA((_N_GRP, _W)),
            pltpu.VMEM((2, hkv, s, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # Operand order: 3 scalar-prefetch args then tensor inputs; the
    # cache is operand 4 (bt, cl, slots, q, kv) aliased to output 1.
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((b, rows, d), jnp.float32),
                   jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)),
        input_output_aliases={4: 1},
        interpret=interpret,
    )(block_tables, context_lens, slots, q, kv_cache, knew, vnew, cs)


def fused_rope_write_ok(head_size: int, rotary_dim: int,
                        is_neox_style: bool, block_size: int,
                        kv_dtype, alibi_slopes) -> bool:
    """The fused rope+write+attend decode path requires full-head neox
    rope, no ALiBi, and the compiled-kernel cache geometry."""
    if os.environ.get("VLLM_TPU_NO_FUSED_ATTN_RW"):
        return False
    return (alibi_slopes is None and is_neox_style
            and rotary_dim == head_size
            and use_pallas_attention(head_size, block_size, kv_dtype))


def paged_decode_attention_fused(
    q: jax.Array,               # [B, Hq, D] PRE-rope
    k_new: jax.Array,           # [B, Hkv, D] PRE-rope
    v_new: jax.Array,           # [B, Hkv, D]
    cos_sin: jax.Array,         # [B, 2, D] f32 full-width cos/sin rows
    kv_cache: jax.Array,        # [NB, 2, Hkv, S, D] fused
    block_tables: jax.Array,    # [B, MB] int32
    context_lens: jax.Array,    # [B] int32 (INCLUDING current token)
    slot_mapping: jax.Array,    # [B] int32 (current token's slot)
    scale: float,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
):
    """rope(q,k) + cache write + paged attention in ONE pallas call;
    returns (out [B, Hq, D], updated kv_cache). The write DMA overlaps
    the streamed attention; the current token attends from VMEM (via a
    cache-dtype round trip, so numerics match the unfused path
    exactly). Caller gates with :func:`fused_rope_write_ok`."""
    b, hq, d = q.shape
    hkv = kv_cache.shape[2]
    g = hq // hkv
    mb = block_tables.shape[1]
    if mb % _W != 0:
        block_tables = jnp.pad(block_tables,
                               ((0, 0), (0, _W - mb % _W)))
    gp = g
    while (hkv * gp) % 8 != 0:
        gp += 1
    qg = q.reshape(b, hkv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    qg = qg.reshape(b, hkv * gp, d)
    out, kv_cache = _paged_decode_rw(
        qg.astype(jnp.bfloat16), k_new.astype(jnp.bfloat16),
        v_new.astype(jnp.bfloat16), cos_sin.astype(jnp.float32),
        kv_cache, block_tables.astype(jnp.int32),
        context_lens.astype(jnp.int32), slot_mapping.astype(jnp.int32),
        gp=gp, scale=float(scale), sliding_window=sliding_window,
        interpret=interpret)
    out = out.reshape(b, hkv, gp, d)[:, :, :g, :].reshape(b, hq, d)
    return out.astype(q.dtype), kv_cache


def paged_decode_attention_partials(
    q: jax.Array,               # [B, Hq, D]
    kv_cache: jax.Array,        # [NB, 2, Hkv, S, D] fused (pool SHARD)
    block_tables: jax.Array,    # [B, MB] int32 (local ids)
    context_lens: jax.Array,    # [B] int32 (local tokens; 0 = none)
    scale: float,
    interpret: bool = False,
):
    """Kernel-rate attention partials over a local pool shard for the
    context-parallel decode combine (ops/ring_attention.py): returns
    (num [B,Hq,D] f32 unnormalized at the local max, l [B,Hq] sumexp,
    m [B,Hq] max logit). Plain causal only (no ALiBi/sliding)."""
    b, hq, d = q.shape
    hkv = kv_cache.shape[2]
    g = hq // hkv
    mb = block_tables.shape[1]
    if mb % _W != 0:
        block_tables = jnp.pad(block_tables,
                               ((0, 0), (0, _W - mb % _W)))
    gp = g
    while (hkv * gp) % 8 != 0:
        gp += 1
    qg = q.reshape(b, hkv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    qg = qg.reshape(b, hkv * gp, d)
    num, lm = _paged_decode(qg.astype(jnp.bfloat16), kv_cache,
                            block_tables.astype(jnp.int32),
                            context_lens.astype(jnp.int32), None,
                            gp=gp, scale=float(scale),
                            sliding_window=None, interpret=interpret,
                            partials=True)
    num = num.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, hq, d)
    lm = lm.reshape(b, hkv, gp, 128)[:, :, :g].reshape(b, hq, 128)
    return num, lm[..., 0], lm[..., 1]


def paged_decode_attention(
    q: jax.Array,               # [B, Hq, D]
    kv_cache: jax.Array,        # [NB, 2, Hkv, S, D] fused
    block_tables: jax.Array,    # [B, MB] int32
    context_lens: jax.Array,    # [B] int32
    scale: float,
    alibi_slopes: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    b, hq, d = q.shape
    hkv = kv_cache.shape[2]
    g = hq // hkv
    # The manual-DMA kernel's contiguity probe reads a whole _W-wide
    # window of block-table columns; pad the table to a _W multiple
    # here (free — the padded entries are only ever read, and the
    # num_blocks bound already vetoes their groups) instead of clamping
    # inside the kernel's scalar DMA-issue path (an in-kernel clamp
    # measured ~5% of batch-1 decode). Production tables are bucketed
    # to multiples of 16, so this pad is a no-op in serving.
    mb = block_tables.shape[1]
    if mb % _W != 0:
        block_tables = jnp.pad(block_tables,
                               ((0, 0), (0, _W - mb % _W)))
    # Pad the per-kv-head query group only as far as needed for the
    # total row count (hkv * gp) to be a sublane multiple: the softmax
    # VPU work scales with rows, and over-padding (e.g. 8x for MHA's
    # g=1) made compute, not DMA, the batch-1 bottleneck.
    gp = g
    while (hkv * gp) % 8 != 0:
        gp += 1
    qg = q.reshape(b, hkv, g, d)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    qg = qg.reshape(b, hkv * gp, d)
    alibi = None
    if alibi_slopes is not None:
        al = jnp.pad(alibi_slopes.reshape(hkv, g), ((0, 0), (0, gp - g)))
        alibi = al.reshape(hkv * gp, 1).astype(jnp.float32)
    impl = (_paged_decode_pipelined
            if os.environ.get("VLLM_TPU_ATTN_PIPELINED") else _paged_decode)
    out = impl(qg.astype(jnp.bfloat16), kv_cache,
               block_tables.astype(jnp.int32),
               context_lens.astype(jnp.int32), alibi,
               gp=gp, scale=float(scale),
               sliding_window=sliding_window,
               interpret=interpret)
    out = out.reshape(b, hkv, gp, d)[:, :, :g, :].reshape(b, hq, d)
    return out.astype(q.dtype)
