"""Fused INT4 dequant + matmul Pallas kernels for the TPU MXU.

The core deliverable (SURVEY.md §2.7 AWQ row): replaces the reference's
AWQ/GPTQ CUDA GEMMs (csrc/quantization/awq/gemm_kernels.cu:31-445,
csrc/quantization/gptq/q_gemm.cu:93-453) with a TPU-native design.

Decode kernel layout (M <= 64 tokens):
 * x [M, K] bf16 lives whole in VMEM (at most ~1.8 MB at K=14336).
 * grid (N tiles, K tiles), K innermost so the fp32 accumulator tile
   stays resident; packed weight tiles stream HBM->VMEM through the
   implicit Pallas double-buffered pipeline — the kernel is HBM-bound by
   design and the weights are read exactly once.
 * per 256-row superblock: extract lo/hi nibbles (2 VPU ops + convert),
   two 128-deep MXU dots, then the group-correction
   ``(partial - sum(x_g) * z_g) * s_g`` on the [M, TN] partial — scales
   and zero points never touch per-element lanes.

Large-M (prefill) kernel (M > 64 tokens): the SAME group-correction
design — raw nibble-plane MXU dots + per-group corrective math — tiled
over a 3-D grid (M tiles, N tiles, K tiles). Unlike the reference's
large-batch path (awq.py:155-162, dequantize the whole matrix to fp16
then cuBLAS), no dequantized matrix is ever materialized: peak live
VMEM per step is a few MB of tiles and the HLO holds no [K, N] temp at
all. This is what lets a 7B model prefill inside 16 GB HBM while the
MXU stays the bottleneck (nibble extraction is re-done once per M tile;
VPU cost is ~10-20% of the MXU time at tile_m >= 256).
"""
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_quick_tpu.ops.quant_formats import (EFF_GROUP, SUPERBLOCK,
                                              QuantizedWeight, dequantize,
                                              quant_matmul_ref)

# Above this token count, dequant-then-GEMM beats the fused kernel (the
# fused kernel is tuned for the HBM-bound decode regime).
FUSED_KERNEL_MAX_TOKENS = 64
# Packed-weight VMEM tile budget (bytes); doubled by pipeline buffering.
_TILE_BUDGET = int(os.environ.get("VLLM_TPU_QMM_BUDGET",
                                  3 * 1024 * 1024))
# Prefill x-tile VMEM budget (bytes, also double-buffered): bounds
# tile_m * tile_k * 2 in the 3-D kernel so the whole working set stays
# well inside the ~16 MB VMEM.
_X_TILE_BUDGET = int(os.environ.get("VLLM_TPU_QMM_XBUDGET",
                                    2 * 1024 * 1024))
# Prefill dequantized-tile scratch budget (bytes, single-buffered).
_W_SCRATCH_BUDGET = int(os.environ.get("VLLM_TPU_QMM_WBUDGET",
                                       2 * 1024 * 1024))
# Nibble-extraction variant: "i8" does the mask work at native int8 lane
# width (4x the density of i32 ops) using the offset-binary identity
# ``(p & 0xF0) ^ 0x80 == 16*hi - 128`` (linear in hi, so the 16x/-128
# fold into the per-group scale correction); "i32" is the legacy
# widen-shift-mask path kept for A/B.
_DEQUANT_VARIANT = os.environ.get("VLLM_TPU_DEQUANT", "i8")


def _sb_nibble_planes(p):
    """int8 [half, TN] packed byte tile -> (lo_plane, hi_plane, hi_is_x16).

    lo_plane holds the low-nibble weights exactly (0..15). With the i8
    variant, hi_plane holds ``16*hi - 128`` (hi_is_x16=True) and the
    caller must use the adjusted correction
    ``(phi - xs*(z-8)*16) * (s/16)``; with i32 it holds hi directly.
    """
    if _DEQUANT_VARIANT == "i8":
        lo = (p & 0x0F).astype(jnp.bfloat16)
        hi = ((p & jnp.int8(-16)) ^ jnp.int8(-128)).astype(jnp.bfloat16)
        return lo, hi, True
    p32 = p.astype(jnp.int32)
    lo = (p32 & 0xF).astype(jnp.bfloat16)
    hi = ((p32 >> 4) & 0xF).astype(jnp.bfloat16)
    return lo, hi, False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _choose_tiles(kp: int, np_: int) -> tuple:
    """Pick (tile_k, tile_n) minimizing grid steps under the VMEM budget.

    VLLM_TPU_QMM_TN=<n> forces the lane-tile width (benchmark knob).

    Constraints: tile_k divides kp; tile_k/SUPERBLOCK is a multiple of 4
    (so the [tile_k/128, tile_n] scale blocks satisfy the (8,128) sublane
    rule) unless it equals the whole K; packed tile <= _TILE_BUDGET.
    """
    n_sb = kp // SUPERBLOCK
    best = None  # (steps, -d*tn, tile_k, tile_n)
    forced_tn = os.environ.get("VLLM_TPU_QMM_TN")
    tn_options = ((int(forced_tn),) if forced_tn
                  else (1024, 512, 256, 128))
    for tn in tn_options:
        if np_ % tn != 0:
            continue
        for d in range(1, n_sb + 1):
            if n_sb % d != 0:
                continue
            if d % 4 != 0 and d != n_sb:
                continue
            if d * (SUPERBLOCK // 2) * tn > _TILE_BUDGET:
                continue
            steps = (np_ // tn) * (n_sb // d)
            cand = (steps, -(d * tn), d * SUPERBLOCK, tn)
            if best is None or cand < best:
                best = cand
    if best is None:  # tiny N fallback: whole array in one block
        return kp, np_
    return best[2], best[3]


def _sb_contribution(xlo, xhi, p, slo, shi, zlo, zhi):
    """f32 [M, TN] contribution of one 256-row superblock.

    x slices are bf16 [M, 128]; p is the packed int8 [128, TN] tile;
    s/z rows are f32 [1, TN]. Group-correction identity:
    ``(dot(x, q) - sum(x) * z) * s`` — with the i8 nibble variant the hi
    plane is ``16*hi - 128``, folded as ``(phi - xs*(z-8)*16) * (s/16)``.
    """
    lo, hi, hi_x16 = _sb_nibble_planes(p)
    plo = jnp.dot(xlo, lo, preferred_element_type=jnp.float32)
    phi = jnp.dot(xhi, hi, preferred_element_type=jnp.float32)
    xslo = jnp.sum(xlo.astype(jnp.float32), axis=1, keepdims=True)
    xshi = jnp.sum(xhi.astype(jnp.float32), axis=1, keepdims=True)
    if hi_x16:
        return ((plo - xslo * zlo) * slo
                + (phi - xshi * (zhi - 8.0) * 16.0) * (shi * 0.0625))
    return (plo - xslo * zlo) * slo + (phi - xshi * zhi) * shi


def _decode_kernel_i8pair(x_ref, p_ref, s_ref, z_ref, o_ref, acc_ref, *,
                          tile_k: int, k_axis: int = 1):
    k_idx = pl.program_id(k_axis)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_sb = tile_k // SUPERBLOCK
    half = SUPERBLOCK // 2  # == EFF_GROUP == 128

    # Static unroll: every slice index is a compile-time constant, so
    # Mosaic emits aligned vector loads throughout.
    acc = acc_ref[:]
    for sb in range(n_sb):
        p = p_ref[sb * half:(sb + 1) * half, :]
        xlo = x_ref[:, sb * SUPERBLOCK:sb * SUPERBLOCK + half]
        xhi = x_ref[:, sb * SUPERBLOCK + half:(sb + 1) * SUPERBLOCK]
        slo = s_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
        shi = s_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
        zlo = z_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
        zhi = z_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
        acc = acc + _sb_contribution(xlo, xhi, p, slo, shi, zlo, zhi)
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(k_axis) - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _decode_kernel_u4(x_ref, p_ref, s_ref, z_ref, o_ref, acc_ref, *,
                      tile_k: int, k_axis: int = 1):
    k_idx = pl.program_id(k_axis)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_g = tile_k // EFF_GROUP
    acc = acc_ref[:]
    for g in range(n_g):
        q = p_ref[g * EFF_GROUP:(g + 1) * EFF_GROUP, :].astype(jnp.bfloat16)
        xg = x_ref[:, g * EFF_GROUP:(g + 1) * EFF_GROUP]
        partial = jnp.dot(xg, q, preferred_element_type=jnp.float32)
        s = s_ref[g:g + 1, :].astype(jnp.float32)
        z = z_ref[g:g + 1, :].astype(jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + (partial - xs * z) * s
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(k_axis) - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("fmt_is_u4", "out_dtype", "interpret"))
def _fused_quant_matmul_2d(x: jax.Array, packed: jax.Array, scales: jax.Array,
                           zeros: jax.Array, *, fmt_is_u4: bool = False,
                           out_dtype=jnp.bfloat16,
                           interpret: bool = False) -> jax.Array:
    """x: [Mp, Kp] bf16 (Mp multiple of 8, Kp of SUPERBLOCK) -> [Mp, Np]."""
    mp, kp = x.shape
    np_ = packed.shape[-1]
    tile_k, tile_n = _choose_tiles(kp, np_)
    grid = (np_ // tile_n, kp // tile_k)

    if fmt_is_u4:
        kernel = functools.partial(_decode_kernel_u4, tile_k=tile_k)
        p_spec = pl.BlockSpec((tile_k, tile_n), lambda j, k: (k, j))
    else:
        kernel = functools.partial(_decode_kernel_i8pair, tile_k=tile_k)
        p_spec = pl.BlockSpec((tile_k // 2, tile_n), lambda j, k: (k, j))

    sz_spec = pl.BlockSpec((tile_k // EFF_GROUP, tile_n),
                           lambda j, k: (k, j))
    flops = 2 * mp * kp * np_
    bytes_accessed = (kp * np_ // 2 + mp * kp * 2 +
                      2 * (kp // EFF_GROUP) * np_ * 2 + mp * np_ * 2)
    kwargs = {}
    if not interpret and os.environ.get("VLLM_TPU_QMM_DIMSEM"):
        # N tiles are independent ("parallel"); K carries the
        # accumulator ("arbitrary"). Lets Mosaic relax cross-iteration
        # ordering when profiling says it helps.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, tile_k), lambda j, k: (0, k)),  # x k-tile
            p_spec,
            sz_spec,
            sz_spec,
        ],
        out_specs=pl.BlockSpec((mp, tile_n), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(x, packed, scales, zeros)


def _choose_tiles_prefill(kp: int, np_: int, tile_m: int) -> tuple:
    """Pick (tile_k, tile_n) for the 3-D prefill grid.

    Budgets: x tile ``tile_m * tile_k * 2`` bytes <= _X_TILE_BUDGET and
    dequant scratch ``tile_k * tile_n * 2`` <= _W_SCRATCH_BUDGET (x and
    packed tiles are additionally doubled by pipeline buffering; the
    whole working set stays under ~10 MB of the 16 MB VMEM). tile_k
    must divide kp and keep tile_k/EFF_GROUP a multiple of 8
    (scale-block sublane rule) unless it is the whole K. Prefer the
    deepest tile_k (deeper MXU dots, fewer accumulator round trips),
    then the widest tile_n.
    """
    n_sb = kp // SUPERBLOCK
    best = None  # (k_steps, n_steps, tile_k, tile_n)
    forced_tn = os.environ.get("VLLM_TPU_QMM_PTN")  # experiment knob
    tn_options = ((int(forced_tn),) if forced_tn
                  else (1024, 512, 256, 128))
    for tn in tn_options:
        if np_ % tn != 0:
            continue
        for d in range(n_sb, 0, -1):
            if n_sb % d != 0:
                continue
            if d % 4 != 0 and d != n_sb:
                continue
            tk = d * SUPERBLOCK
            if tile_m * tk * 2 > _X_TILE_BUDGET:
                continue
            if tk * tn * 2 > _W_SCRATCH_BUDGET:
                continue
            if (tk // 2) * tn > _TILE_BUDGET:
                continue
            cand = (kp // tk, np_ // tn, tk, tn)
            if best is None or cand < best:
                best = cand
    if best is None:  # tiny matrices: single block
        return kp, min(np_, 1024) if np_ % 128 == 0 else np_
    return best[2], best[3]


def _dequant_sb_to_scratch(p_ref, s_ref, z_ref, w_ref, sb: int):
    """Dequantize superblock ``sb`` of the packed tile into the bf16
    scratch. w = (q - z) * s; q - z is exact in bf16 (both in 0..15).
    With the i8 variant the hi plane is 16*q - 128, so
    w = (plane + 16*(8 - z)) * (s / 16)."""
    half = SUPERBLOCK // 2
    p = p_ref[sb * half:(sb + 1) * half, :]
    lo, hi, hi_x16 = _sb_nibble_planes(p)
    slo = s_ref[2 * sb:2 * sb + 1, :].astype(jnp.bfloat16)
    shi = s_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.bfloat16)
    zlo = z_ref[2 * sb:2 * sb + 1, :].astype(jnp.bfloat16)
    zhi = z_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.bfloat16)
    w_ref[sb * SUPERBLOCK:sb * SUPERBLOCK + half, :] = (lo - zlo) * slo
    if hi_x16:
        w_ref[sb * SUPERBLOCK + half:(sb + 1) * SUPERBLOCK, :] = (
            (hi + (8.0 - zhi) * 16.0) * (shi * 0.0625))
    else:
        w_ref[sb * SUPERBLOCK + half:(sb + 1) * SUPERBLOCK, :] = (
            (hi - zhi) * shi)


def _prefill_kernel_i8pair(x_ref, p_ref, s_ref, z_ref, o_ref, acc_ref,
                           w_ref, *, tile_k: int):
    """Prefill (MXU-bound) kernel: dequantize the packed tile ONCE into
    a bf16 VMEM scratch, interleaving per-superblock dequant with
    256-deep MXU dots so Mosaic can overlap the VPU dequant of
    superblock i+1 with the MXU dot of superblock i (the r4 one-deep-dot
    variant serialized ~6 ms of VPU behind 34 ms of MXU at ctx512).

    The decode kernel's group-correction trick is wrong for this regime:
    its corrective VPU math scales O(M*N*K/128) and its dots are only
    128 deep, so at M >= 256 the VPU work and dot fill/drain dominate
    (measured 18-60% MXU on chip). Dequant-to-scratch costs O(K*N) VPU
    per M tile."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_sb = tile_k // SUPERBLOCK
    # Optional chunked interleave: dequantize CH superblocks, then one
    # CH*256-deep dot, repeated — exposes VPU-dequant / MXU-dot overlap
    # to Mosaic's scheduler at a bounded unroll. OFF by default: the
    # per-superblock variant (CH=1 over 16 superblocks) blew a
    # 20-minute Mosaic compile, and even the value-carried accumulate
    # restructure alone compiled pathologically; the default below is
    # byte-for-byte the r4 formulation (whole-tile dequant, one deep
    # dot, in-place accumulate).
    ch = int(os.environ.get("VLLM_TPU_PREFILL_CHUNK_SB", "0"))
    if 0 < ch < n_sb:
        while n_sb % ch:
            ch -= 1
        acc = acc_ref[:]
        for c0 in range(0, n_sb, ch):
            for sb in range(c0, c0 + ch):
                _dequant_sb_to_scratch(p_ref, s_ref, z_ref, w_ref, sb)
            acc = acc + jnp.dot(
                x_ref[:, c0 * SUPERBLOCK:(c0 + ch) * SUPERBLOCK],
                w_ref[c0 * SUPERBLOCK:(c0 + ch) * SUPERBLOCK, :],
                preferred_element_type=jnp.float32)
        acc_ref[:] = acc
    else:
        for sb in range(n_sb):
            _dequant_sb_to_scratch(p_ref, s_ref, z_ref, w_ref, sb)
        acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                              preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _prefill_kernel_w4a8(xi_ref, sx_ref, p_ref, s_ref, z_ref, o_ref,
                         acc_ref, *, tile_k: int):
    """W4A8 prefill kernel: activations pre-quantized to int8 (per-token
    symmetric scale), weights used as raw int8 nibble planes — every dot
    is s8 x s8 -> s32 on the MXU's double-rate int8 path (v5e: 394 TOPS
    vs 197 bf16). The group-correction identity absorbs both the zero
    point and the i8 offset-binary hi-plane transform exactly as in the
    decode kernel; the per-token activation scale is a rank-1 factor
    applied once at the end. No dequantized weight tile is ever
    materialized (the bf16 prefill kernel's w_scratch disappears).

    Numerics: int8-quantized activations (the W4A8 trade measured by the
    perplexity gate); the integer dots themselves are exact, so the only
    error source is the activation rounding."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_sb = tile_k // SUPERBLOCK
    half = SUPERBLOCK // 2
    acc = acc_ref[:]
    for sb in range(n_sb):
        p = p_ref[sb * half:(sb + 1) * half, :]
        lo = p & 0x0F                                   # q_lo in 0..15
        hi = (p & jnp.int8(-16)) ^ jnp.int8(-128)       # 16*q_hi - 128
        xlo = xi_ref[:, sb * SUPERBLOCK:sb * SUPERBLOCK + half]
        xhi = xi_ref[:, sb * SUPERBLOCK + half:(sb + 1) * SUPERBLOCK]
        plo = jnp.dot(xlo, lo, preferred_element_type=jnp.int32)
        phi = jnp.dot(xhi, hi, preferred_element_type=jnp.int32)
        xslo = jnp.sum(xlo.astype(jnp.int32), axis=1, keepdims=True)
        xshi = jnp.sum(xhi.astype(jnp.int32), axis=1, keepdims=True)
        slo = s_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
        shi = s_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
        zlo = z_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
        zhi = z_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
        acc = (acc
               + (plo.astype(jnp.float32)
                  - xslo.astype(jnp.float32) * zlo) * slo
               + (phi.astype(jnp.float32)
                  - xshi.astype(jnp.float32) * (zhi - 8.0) * 16.0)
               * (shi * 0.0625))
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * sx_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def quantize_rows_i8(x: jax.Array):
    """Per-row symmetric int8 quantization: x ~= xi * sx.

    Plain jnp (XLA fuses it into one pass over x); the extra read of x
    is trivial next to the prefill GEMM it feeds."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-8) / 127.0
    xi = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                  127).astype(jnp.int8)
    return xi, sx


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret", "tile_m"))
def _fused_quant_matmul_3d_w4a8(xi: jax.Array, sx: jax.Array,
                                packed: jax.Array, scales: jax.Array,
                                zeros: jax.Array, *, tile_m: int,
                                out_dtype=jnp.bfloat16,
                                interpret: bool = False) -> jax.Array:
    """W4A8 prefill variant of :func:`_fused_quant_matmul_3d`.
    xi: [Mp, Kp] int8, sx: [Mp, 1] f32 per-row activation scales."""
    mp, kp = xi.shape
    np_ = packed.shape[-1]
    tile_k, tile_n = _choose_tiles_prefill(kp, np_, tile_m)
    grid = (mp // tile_m, np_ // tile_n, kp // tile_k)
    kernel = functools.partial(_prefill_kernel_w4a8, tile_k=tile_k)
    p_spec = pl.BlockSpec((tile_k // 2, tile_n), lambda i, j, k: (k, j))
    sz_spec = pl.BlockSpec((tile_k // EFF_GROUP, tile_n),
                           lambda i, j, k: (k, j))
    m_tiles, n_tiles = grid[0], grid[1]
    flops = 2 * mp * kp * np_
    bytes_accessed = (m_tiles * (kp * np_ // 2
                                 + 2 * (kp // EFF_GROUP) * np_ * 2)
                      + n_tiles * mp * (kp + 4) + mp * np_ * 2)
    kwargs = {}
    if not interpret and not os.environ.get("VLLM_TPU_QMM_3D_NODIMSEM"):
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k)),   # xi
            pl.BlockSpec((tile_m, 1), lambda i, j, k: (i, 0)),        # sx
            p_spec,
            sz_spec,
            sz_spec,
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(xi, sx, packed, scales, zeros)


def _prefill_kernel_i8pair_minner(x_ref, p_ref, s_ref, z_ref, o_ref,
                                  acc_ref, w_ref, *, tile_k: int,
                                  tile_m: int):
    """M-innermost prefill kernel: grid (N tiles, K tiles, M tiles).

    With M innermost, the packed tile and its dequantized scratch are
    REUSED across every M tile — total dequant VPU work is O(K*N) for
    the whole GEMM instead of O(K*N * m_tiles) (the r4 kernel's grid
    had M outermost: ctx-2048 prefill paid the full-matrix dequant 4x,
    the measured cause of its 18% per-token degradation vs ctx-512).
    The accumulator scratch spans ALL M rows of the current N tile
    ([mp, tile_n] f32) because consecutive k steps for one m tile are
    separated by a whole m sweep."""
    k_idx = pl.program_id(1)
    m_idx = pl.program_id(2)

    n_sb = tile_k // SUPERBLOCK

    @pl.when(m_idx == 0)
    def _dequant():
        for sb in range(n_sb):
            _dequant_sb_to_scratch(p_ref, s_ref, z_ref, w_ref, sb)

    rows = pl.ds(m_idx * tile_m, tile_m)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[rows, :] = jnp.zeros((tile_m, acc_ref.shape[1]),
                                     jnp.float32)

    acc_ref[rows, :] += jnp.dot(x_ref[:], w_ref[:],
                                preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _done():
        o_ref[:] = acc_ref[rows, :].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret", "tile_m"))
def _fused_quant_matmul_3d_minner(x: jax.Array, packed: jax.Array,
                                  scales: jax.Array, zeros: jax.Array, *,
                                  tile_m: int, out_dtype=jnp.bfloat16,
                                  interpret: bool = False) -> jax.Array:
    """M-innermost variant of :func:`_fused_quant_matmul_3d` (i8pair
    only). Used when m_tiles > 1 so the dequant scratch is built once
    per (n, k) weight tile instead of once per M tile. The x tile is
    re-streamed n_tiles times (O(M*K) bytes per N tile — trivial next
    to the packed weight read)."""
    mp, kp = x.shape
    np_ = packed.shape[-1]
    tile_k, tile_n = _choose_tiles_prefill(kp, np_, tile_m)
    # Accumulator scratch covers all M rows of one N tile; cap its
    # VMEM footprint by narrowing tile_n if needed.
    acc_budget = int(os.environ.get("VLLM_TPU_QMM_ACCBUDGET",
                                    4 * 1024 * 1024))
    while tile_n > 128 and mp * tile_n * 4 > acc_budget:
        tile_n //= 2
    grid = (np_ // tile_n, kp // tile_k, mp // tile_m)
    kernel = functools.partial(_prefill_kernel_i8pair_minner,
                               tile_k=tile_k, tile_m=tile_m)
    m_tiles, n_tiles = grid[2], grid[0]
    flops = 2 * mp * kp * np_
    bytes_accessed = (kp * np_ // 2 + 2 * (kp // EFF_GROUP) * np_ * 2
                      + n_tiles * mp * kp * 2 + mp * np_ * 2)
    kwargs = {}
    if not interpret and not os.environ.get("VLLM_TPU_QMM_3D_NODIMSEM"):
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda j, k, i: (i, k)),
            pl.BlockSpec((tile_k // 2, tile_n), lambda j, k, i: (k, j)),
            pl.BlockSpec((tile_k // EFF_GROUP, tile_n),
                         lambda j, k, i: (k, j)),
            pl.BlockSpec((tile_k // EFF_GROUP, tile_n),
                         lambda j, k, i: (k, j)),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda j, k, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, tile_n), jnp.float32),
                        pltpu.VMEM((tile_k, tile_n), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(x, packed, scales, zeros)


def _prefill_kernel_u4(x_ref, p_ref, s_ref, z_ref, o_ref, acc_ref,
                       w_ref, *, tile_k: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_g = tile_k // EFF_GROUP
    for g in range(n_g):
        q = p_ref[g * EFF_GROUP:(g + 1) * EFF_GROUP, :].astype(jnp.bfloat16)
        s = s_ref[g:g + 1, :].astype(jnp.bfloat16)
        z = z_ref[g:g + 1, :].astype(jnp.bfloat16)
        w_ref[g * EFF_GROUP:(g + 1) * EFF_GROUP, :] = (q - z) * s
    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("fmt_is_u4", "out_dtype", "interpret",
                                    "tile_m"))
def _fused_quant_matmul_3d(x: jax.Array, packed: jax.Array, scales: jax.Array,
                           zeros: jax.Array, *, tile_m: int,
                           fmt_is_u4: bool = False,
                           out_dtype=jnp.bfloat16,
                           interpret: bool = False) -> jax.Array:
    """Prefill variant: x [Mp, Kp] with Mp a multiple of tile_m; grid
    (M tiles, N tiles, K tiles), K innermost so the fp32 accumulator
    tile stays resident. Never materializes a dequantized [K, N]."""
    mp, kp = x.shape
    np_ = packed.shape[-1]
    tile_k, tile_n = _choose_tiles_prefill(kp, np_, tile_m)
    grid = (mp // tile_m, np_ // tile_n, kp // tile_k)

    if fmt_is_u4:
        kernel = functools.partial(_prefill_kernel_u4, tile_k=tile_k)
        p_spec = pl.BlockSpec((tile_k, tile_n), lambda i, j, k: (k, j))
    else:
        kernel = functools.partial(_prefill_kernel_i8pair, tile_k=tile_k)
        p_spec = pl.BlockSpec((tile_k // 2, tile_n), lambda i, j, k: (k, j))

    sz_spec = pl.BlockSpec((tile_k // EFF_GROUP, tile_n),
                           lambda i, j, k: (k, j))
    m_tiles, n_tiles = grid[0], grid[1]
    flops = 2 * mp * kp * np_
    bytes_accessed = (m_tiles * (kp * np_ // 2
                                 + 2 * (kp // EFF_GROUP) * np_ * 2)
                      + n_tiles * mp * kp * 2 + mp * np_ * 2)
    kwargs = {}
    if not interpret and not os.environ.get("VLLM_TPU_QMM_3D_NODIMSEM"):
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k)),
            p_spec,
            sz_spec,
            sz_spec,
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32),
                        pltpu.VMEM((tile_k, tile_n), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(x, packed, scales, zeros)


def _tiled_dequant_matmul(x: jax.Array, qw: QuantizedWeight,
                          tile_n: int = 2048) -> jax.Array:
    """Memory-bounded fallback for formats the Pallas kernels don't
    cover (fmt='ref' exotic group sizes, 'sqllm' LUTs): dequantize and
    multiply one N-slice at a time under lax.map so peak temp is
    O(K * tile_n), never the reference-style full [K, N] f32 broadcast
    that OOM'd 7B engine init on 16 GB HBM (round-3 battery)."""
    import dataclasses as _dc
    k, n = qw.in_features, qw.out_features
    if qw.perm is not None:
        x = jnp.take(x, qw.perm, axis=-1)
    if n <= tile_n:
        w = dequantize(qw, dtype=x.dtype)
        return jnp.dot(x, w,
                       preferred_element_type=jnp.float32).astype(x.dtype)
    n_pad = _round_up(n, tile_n)

    def slice_cols(a, start):
        # Keep only real columns, zero-pad to the tile grid (scale-0
        # pad columns dequantize to exactly zero), then slice one tile.
        a = a[..., :n]
        pad = [(0, 0)] * (a.ndim - 1) + [(0, n_pad - n)]
        return jax.lax.dynamic_slice_in_dim(jnp.pad(a, pad), start, tile_n,
                                            axis=a.ndim - 1)

    def one_tile(i):
        start = i * tile_n
        sub = _dc.replace(
            qw,
            packed=slice_cols(qw.packed, start),
            scales=slice_cols(qw.scales, start),
            zeros=slice_cols(qw.zeros, start),
            lut=(slice_cols(qw.lut.T, start).T
                 if qw.lut is not None else None),
            perm=None,
            out_features=tile_n, padded_out=tile_n)
        w = dequantize(sub, dtype=x.dtype)
        return jnp.dot(x, w,
                       preferred_element_type=jnp.float32).astype(x.dtype)

    tiles = jax.lax.map(one_tile, jnp.arange(n_pad // tile_n))
    y = jnp.moveaxis(tiles, 0, -2).reshape(*x.shape[:-1], n_pad)
    return y[..., :n]


def _fused_mlp_kernel(*refs, k1p: int, tile_f: int, real_steps: int,
                      eps: float = 1e-6, with_norm: bool = False):
    """One grid step = one ``tile_f`` slice of the hidden dim F:
    compute h = silu(x@Wg) * (x@Wu) for the slice, then accumulate
    y += h @ W2[slice] — gate_up, silu and down in ONE kernel so the
    two weight streams run back to back with no pipeline drain or
    intermediate HBM round trip. Padded W2 K-rows carry scale 0, so
    junk h from out-of-range tail slices contributes exactly zero.

    with_norm=True additionally runs the pre-MLP residual update in a
    step-0 prologue: r = h_in + res; x = rms_norm(r) * w; r is emitted
    as a second output — the fused_add_rms_norm that precedes every MLP
    (layernorm_kernels.cu:40 analogue) costs zero extra XLA ops."""
    if with_norm:
        (h_ref, res_ref, wn_ref, pg_ref, sg_ref, zg_ref, pu_ref, su_ref,
         zu_ref, p2_ref, s2_ref, z2_ref, o_ref, r_ref, y_acc,
         xn_ref) = refs
    else:
        (xn_ref, pg_ref, sg_ref, zg_ref, pu_ref, su_ref, zu_ref, p2_ref,
         s2_ref, z2_ref, o_ref, y_acc) = refs
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _init():
        y_acc[:] = jnp.zeros_like(y_acc)
        if with_norm:
            r = (h_ref[:].astype(jnp.float32)
                 + res_ref[:].astype(jnp.float32))
            r_ref[:] = r.astype(r_ref.dtype)
            var = jnp.mean(r * r, axis=1, keepdims=True)
            xn = (r * jax.lax.rsqrt(var + eps)
                  * wn_ref[:].astype(jnp.float32))
            xn_ref[:] = xn.astype(jnp.bfloat16)

    half = SUPERBLOCK // 2
    n_sb1 = k1p // SUPERBLOCK

    def col_dot(p_ref, s_ref, z_ref):
        acc = jnp.zeros((xn_ref.shape[0], tile_f), jnp.float32)
        for sb in range(n_sb1):
            p = p_ref[sb * half:(sb + 1) * half, :]
            xlo = xn_ref[:, sb * SUPERBLOCK:sb * SUPERBLOCK + half]
            xhi = xn_ref[:, sb * SUPERBLOCK + half:(sb + 1) * SUPERBLOCK]
            slo = s_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
            shi = s_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
            zlo = z_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
            zhi = z_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
            acc = acc + _sb_contribution(xlo, xhi, p, slo, shi, zlo, zhi)
        return acc

    gate = col_dot(pg_ref, sg_ref, zg_ref)
    up = col_dot(pu_ref, su_ref, zu_ref)
    h = (jax.nn.sigmoid(gate) * gate * up).astype(jnp.bfloat16)

    # Second stage: one W2 superblock (tile_f == SUPERBLOCK K-rows).
    # W2 scales/zeros arrive pre-reshaped [steps, 2, D] so this step's
    # pair is one full trailing block (2-row sublane slices can't be
    # dynamically indexed).
    s2 = s2_ref[0].astype(jnp.float32)           # [2, D]
    z2 = z2_ref[0].astype(jnp.float32)
    y_acc[:] = y_acc[:] + _sb_contribution(
        h[:, :half], h[:, half:], p2_ref[...],
        s2[0:1, :], s2[1:2, :], z2[0:1, :], z2[1:2, :])

    @pl.when(f == pl.num_programs(0) - 1)
    def _done():
        o_ref[:] = y_acc[:].astype(o_ref.dtype)


def _fused_o_mlp_kernel(refs, *, ko: int, k1p: int, tile_f: int,
                        o_steps: int, real_steps: int, eps: float):
    """o-projection + residual-add + RMSNorm + gate/up/silu/down in ONE
    pallas call (decode): grid steps [0, o_steps) compute one tile_f
    column slice of o = attn_out @ Wo into an f32 scratch; step o_steps
    runs the residual+norm prologue over the completed o; every step
    >= o_steps is one fused-MLP slice (same math as _fused_mlp_kernel).
    The five weight streams run back to back through one pipeline, so a
    whole decoder layer below the attention kernel is one launch — the
    reference pays separate o-proj GEMM + fused_add_rms_norm +
    gate_up GEMM + silu_and_mul + down GEMM launches per layer
    (vllm/model_executor/models/llama.py:73-95)."""
    (h_ref, res_ref, wn_ref, po_ref, so_ref, zo_ref,
     pg_ref, sg_ref, zg_ref, pu_ref, su_ref, zu_ref,
     p2_ref, s2_ref, z2_ref, o_ref, r_ref,
     y_acc, o_acc, xn_ref) = refs
    i = pl.program_id(0)
    half = SUPERBLOCK // 2

    def col_dot(x_ref, kdim, p_ref, s_ref, z_ref):
        acc = jnp.zeros((x_ref.shape[0], tile_f), jnp.float32)
        for sb in range(kdim // SUPERBLOCK):
            p = p_ref[sb * half:(sb + 1) * half, :]
            xlo = x_ref[:, sb * SUPERBLOCK:sb * SUPERBLOCK + half]
            xhi = x_ref[:, sb * SUPERBLOCK + half:(sb + 1) * SUPERBLOCK]
            slo = s_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
            shi = s_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
            zlo = z_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
            zhi = z_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
            acc = acc + _sb_contribution(xlo, xhi, p, slo, shi, zlo, zhi)
        return acc

    @pl.when(i < o_steps)
    def _o_phase():
        col = col_dot(h_ref, ko, po_ref, so_ref, zo_ref)
        o_acc[:, pl.dslice(i * tile_f, tile_f)] = col

    @pl.when(i == o_steps)
    def _prologue():
        r = o_acc[:] + res_ref[:].astype(jnp.float32)
        r_ref[:] = r.astype(r_ref.dtype)
        var = jnp.mean(r * r, axis=1, keepdims=True)
        xn_ref[:] = (r * jax.lax.rsqrt(var + eps)
                     * wn_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
        y_acc[:] = jnp.zeros_like(y_acc)

    @pl.when(i >= o_steps)
    def _mlp_phase():
        gate = col_dot(xn_ref, k1p, pg_ref, sg_ref, zg_ref)
        up = col_dot(xn_ref, k1p, pu_ref, su_ref, zu_ref)
        hx = (jax.nn.sigmoid(gate) * gate * up).astype(jnp.bfloat16)
        s2 = s2_ref[0].astype(jnp.float32)           # [2, D]
        z2 = z2_ref[0].astype(jnp.float32)
        y_acc[:] = y_acc[:] + _sb_contribution(
            hx[:, :half], hx[:, half:], p2_ref[...],
            s2[0:1, :], s2[1:2, :], z2[0:1, :], z2[1:2, :])

    @pl.when(i == pl.num_programs(0) - 1)
    def _done():
        o_ref[:] = y_acc[:].astype(o_ref.dtype)


def o_mlp_fusable(qwo: QuantizedWeight, qw13: QuantizedWeight,
                  qw2: QuantizedWeight) -> bool:
    e = qw13.in_features
    return (mlp_fusable(qw13, qw2) and qwo.fmt == "i8pair"
            and qwo.perm is None and qwo.out_features == e
            and qwo.padded_out == e and qwo.padded_in == qwo.in_features
            and qwo.in_features % SUPERBLOCK == 0
            and e % SUPERBLOCK == 0)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype",
                                             "interpret"))
def _fused_o_mlp_2d(h, res, wn, qwo: QuantizedWeight,
                    qw13: QuantizedWeight, qw2: QuantizedWeight, *,
                    eps: float, out_dtype=jnp.bfloat16,
                    interpret: bool = False):
    """h: [mp, Ko] attention output (pre-o-proj); returns
    (y [mp, dp], r = o(h) + res [mp, k1p])."""
    mp, ko = h.shape
    k1p = qw13.in_features
    f = qw2.in_features
    fp2 = qw2.padded_in
    dp = qw2.padded_out
    tile_f = SUPERBLOCK
    o_steps = k1p // tile_f
    mlp_steps = fp2 // tile_f
    steps = o_steps + mlp_steps
    gate_last = f // tile_f - 1
    up_base = f // tile_f

    def o_idx(i):
        return jnp.minimum(i, o_steps - 1)

    def g_idx(i):
        return jnp.clip(i - o_steps, 0, gate_last)

    def w2_idx(i):
        return jnp.maximum(i - o_steps, 0)

    whole_res = pl.BlockSpec((mp, k1p), lambda i: (0, 0))
    in_specs = [
        pl.BlockSpec((mp, ko), lambda i: (0, 0)),                   # h
        whole_res,                                                  # res
        pl.BlockSpec((1, k1p), lambda i: (0, 0)),                   # wn
        pl.BlockSpec((ko // 2, tile_f), lambda i: (0, o_idx(i))),   # Wo
        pl.BlockSpec((ko // EFF_GROUP, tile_f),
                     lambda i: (0, o_idx(i))),
        pl.BlockSpec((ko // EFF_GROUP, tile_f),
                     lambda i: (0, o_idx(i))),
        pl.BlockSpec((k1p // 2, tile_f), lambda i: (0, g_idx(i))),  # Wg
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, g_idx(i))),
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, g_idx(i))),
        pl.BlockSpec((k1p // 2, tile_f),
                     lambda i: (0, up_base + g_idx(i))),            # Wu
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, up_base + g_idx(i))),
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, up_base + g_idx(i))),
        pl.BlockSpec((tile_f // 2, dp), lambda i: (w2_idx(i), 0)),  # W2
        pl.BlockSpec((1, 2, dp), lambda i: (w2_idx(i), 0, 0)),
        pl.BlockSpec((1, 2, dp), lambda i: (w2_idx(i), 0, 0)),
    ]
    kernel = functools.partial(_fused_o_mlp_kernel, ko=ko, k1p=k1p,
                               tile_f=tile_f, o_steps=o_steps,
                               real_steps=f // tile_f, eps=eps)
    flops = 2 * mp * (ko * k1p + k1p * 2 * f + f * dp)
    bytes_accessed = (ko * k1p // 2 + k1p * f + fp2 * dp // 2
                      + 2 * (ko // EFF_GROUP) * k1p * 2
                      + 2 * (k1p // EFF_GROUP) * 2 * f * 2
                      + 2 * (fp2 // EFF_GROUP) * dp * 2)
    return pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=(steps,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((mp, dp), lambda i: (0, 0)),
                   pl.BlockSpec((mp, k1p), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((mp, dp), out_dtype),
                   jax.ShapeDtypeStruct((mp, k1p), out_dtype)),
        scratch_shapes=[pltpu.VMEM((mp, dp), jnp.float32),
                        pltpu.VMEM((mp, k1p), jnp.float32),
                        pltpu.VMEM((mp, k1p), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=mp * f),
        interpret=interpret,
    )(h, res, wn, qwo.packed, qwo.scales, qwo.zeros,
      qw13.packed, qw13.scales, qw13.zeros, qw13.packed, qw13.scales,
      qw13.zeros, qw2.packed,
      qw2.scales_sb if qw2.scales_sb is not None
      else qw2.scales.reshape(mlp_steps, 2, dp),
      qw2.zeros_sb if qw2.zeros_sb is not None
      else qw2.zeros.reshape(mlp_steps, 2, dp))


def fused_o_mlp_norm(attn_out: jax.Array, res: jax.Array,
                     w_norm: jax.Array, qwo: QuantizedWeight,
                     qw13: QuantizedWeight, qw2: QuantizedWeight, *,
                     eps: float = 1e-6, out_dtype=None,
                     interpret: Optional[bool] = None):
    """(y, r) = (mlp(rms_norm(o(attn_out) + res, w)), o(attn_out) + res)
    in one Pallas call — the o-projection, post-attention
    fused_add_rms_norm and the whole MLP (decode batches). Caller
    checks :func:`o_mlp_fusable`."""
    out_dtype = out_dtype or attn_out.dtype
    *lead, ko = attn_out.shape
    m = 1
    for d in lead:
        m *= d
    if interpret is None:
        interpret = not default_backend_is_tpu()
    mp = max(8, _round_up(m, 8))
    h2 = attn_out.reshape(m, ko)
    r2 = res.reshape(m, -1)
    k1p = r2.shape[1]
    if mp != m:
        h2 = jnp.pad(h2, ((0, mp - m), (0, 0)))
        r2 = jnp.pad(r2, ((0, mp - m), (0, 0)))
    y, r = _fused_o_mlp_2d(h2.astype(jnp.bfloat16),
                           r2.astype(jnp.bfloat16),
                           w_norm.astype(jnp.bfloat16).reshape(1, k1p),
                           qwo, qw13, qw2, eps=float(eps),
                           out_dtype=out_dtype, interpret=interpret)
    e = qw2.out_features
    return (y[:m, :e].reshape(*lead, e),
            r[:m].reshape(*lead, k1p))


def _decode_norm_kernel_i8pair(h_ref, res_ref, wn_ref, p_ref, s_ref, z_ref,
                               o_ref, r_ref, acc_ref, xn_ref, *,
                               tile_k: int, eps: float):
    """Decode kernel with a residual-add + RMSNorm prologue: at grid
    step (0, 0) compute r = h + res and xn = rms_norm(r) * w into VMEM
    scratch; every step then runs the standard superblock
    group-correction dots against xn. The pre-attention
    fused_add_rms_norm that precedes every qkv projection
    (layernorm_kernels.cu:40 analogue) costs zero extra XLA ops — the
    same pattern as the fused-MLP norm prologue (+1.5 tok/s)."""
    j = pl.program_id(0)
    k_idx = pl.program_id(1)

    @pl.when((j == 0) & (k_idx == 0))
    def _prologue():
        r = h_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
        r_ref[:] = r.astype(r_ref.dtype)
        var = jnp.mean(r * r, axis=1, keepdims=True)
        xn_ref[:] = (r * jax.lax.rsqrt(var + eps)
                     * wn_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_sb = tile_k // SUPERBLOCK
    half = SUPERBLOCK // 2
    k_off = k_idx * tile_k  # xn is whole-K; offset into this k tile

    acc = acc_ref[:]
    for sb in range(n_sb):
        p = p_ref[sb * half:(sb + 1) * half, :]
        xlo = xn_ref[:, pl.dslice(k_off + sb * SUPERBLOCK, half)]
        xhi = xn_ref[:, pl.dslice(k_off + sb * SUPERBLOCK + half, half)]
        slo = s_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
        shi = s_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
        zlo = z_ref[2 * sb:2 * sb + 1, :].astype(jnp.float32)
        zhi = z_ref[2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
        acc = acc + _sb_contribution(xlo, xhi, p, slo, shi, zlo, zhi)
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def qkv_norm_fusable(qw: QuantizedWeight) -> bool:
    return (qw.fmt == "i8pair" and qw.perm is None
            and qw.padded_in == qw.in_features)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype",
                                             "interpret"))
def _fused_qkv_norm_2d(h, res, wn, packed, scales, zeros, *, eps: float,
                       out_dtype=jnp.bfloat16, interpret: bool = False):
    mp, kp = h.shape
    np_ = packed.shape[-1]
    tile_k, tile_n = _choose_tiles(kp, np_)
    grid = (np_ // tile_n, kp // tile_k)
    kernel = functools.partial(_decode_norm_kernel_i8pair, tile_k=tile_k,
                               eps=eps)
    whole = pl.BlockSpec((mp, kp), lambda j, k: (0, 0))
    sz_spec = pl.BlockSpec((tile_k // EFF_GROUP, tile_n),
                           lambda j, k: (k, j))
    flops = 2 * mp * kp * np_
    bytes_accessed = (kp * np_ // 2 + mp * kp * 2 * 2 +
                      2 * (kp // EFF_GROUP) * np_ * 2 + mp * np_ * 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            whole,                                                  # h
            whole,                                                  # res
            pl.BlockSpec((1, kp), lambda j, k: (0, 0)),             # wn
            pl.BlockSpec((tile_k // 2, tile_n), lambda j, k: (k, j)),
            sz_spec,
            sz_spec,
        ],
        out_specs=(pl.BlockSpec((mp, tile_n), lambda j, k: (0, j)),
                   pl.BlockSpec((mp, kp), lambda j, k: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((mp, np_), out_dtype),
                   jax.ShapeDtypeStruct((mp, kp), out_dtype)),
        scratch_shapes=[pltpu.VMEM((mp, tile_n), jnp.float32),
                        pltpu.VMEM((mp, kp), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(h, res, wn, packed, scales, zeros)


def fused_qkv_norm(h: jax.Array, res: jax.Array, w_norm: jax.Array,
                   qw: QuantizedWeight, *, eps: float = 1e-6,
                   out_dtype=None, interpret: Optional[bool] = None):
    """(qkv, r) = (rms_norm(h + res, w) @ W_qkv, h + res) in one Pallas
    call — the pre-attention fused_add_rms_norm plus the qkv projection
    (decode batches). Caller checks :func:`qkv_norm_fusable`."""
    out_dtype = out_dtype or h.dtype
    *lead, k = h.shape
    m = 1
    for d in lead:
        m *= d
    if interpret is None:
        interpret = not default_backend_is_tpu()
    mp = max(8, _round_up(m, 8))
    h2 = h.reshape(m, k)
    r2 = res.reshape(m, k)
    if mp != m:
        h2 = jnp.pad(h2, ((0, mp - m), (0, 0)))
        r2 = jnp.pad(r2, ((0, mp - m), (0, 0)))
    y, r = _fused_qkv_norm_2d(h2.astype(jnp.bfloat16),
                              r2.astype(jnp.bfloat16),
                              w_norm.astype(jnp.bfloat16).reshape(1, k),
                              qw.packed, qw.scales, qw.zeros,
                              eps=float(eps), out_dtype=out_dtype,
                              interpret=interpret)
    return (y[:m, :qw.out_features].reshape(*lead, qw.out_features),
            r[:m].reshape(*lead, k))


def mlp_fusable(qw13: QuantizedWeight, qw2: QuantizedWeight) -> bool:
    f = qw2.in_features
    return (qw13.fmt == "i8pair" and qw2.fmt == "i8pair"
            and qw13.perm is None and qw2.perm is None
            and qw13.out_features == 2 * f and f % SUPERBLOCK == 0
            and qw13.padded_out == 2 * f
            and qw13.padded_in == qw13.in_features)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _fused_mlp_2d(x, qw13: QuantizedWeight, qw2: QuantizedWeight, *,
                  out_dtype=jnp.bfloat16, interpret: bool = False):
    mp, k1p = x.shape
    f = qw2.in_features
    fp2 = qw2.padded_in
    dp = qw2.padded_out
    tile_f = SUPERBLOCK
    steps = fp2 // tile_f
    gate_last = f // tile_f - 1          # clamp for tail W2 slices
    up_base = f // tile_f

    def g_idx(i):
        return jnp.minimum(i, gate_last)

    in_specs = [
        pl.BlockSpec((mp, k1p), lambda i: (0, 0)),                  # x
        pl.BlockSpec((k1p // 2, tile_f), lambda i: (0, g_idx(i))),  # Wg
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, g_idx(i))),
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, g_idx(i))),
        pl.BlockSpec((k1p // 2, tile_f),
                     lambda i: (0, up_base + g_idx(i))),            # Wu
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, up_base + g_idx(i))),
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, up_base + g_idx(i))),
        pl.BlockSpec((tile_f // 2, dp), lambda i: (i, 0)),          # W2
        pl.BlockSpec((1, 2, dp), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 2, dp), lambda i: (i, 0, 0)),
    ]
    kernel = functools.partial(_fused_mlp_kernel, k1p=k1p,
                               tile_f=tile_f,
                               real_steps=f // tile_f)
    flops = 2 * mp * (k1p * 2 * f + f * dp)
    bytes_accessed = (k1p * f + fp2 * dp // 2
                      + 2 * (k1p // EFF_GROUP) * 2 * f * 2
                      + 2 * (fp2 // EFF_GROUP) * dp * 2)
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((mp, dp), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, dp), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, dp), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=mp * f),
        interpret=interpret,
    )(x, qw13.packed, qw13.scales, qw13.zeros, qw13.packed, qw13.scales,
      qw13.zeros, qw2.packed,
      qw2.scales_sb if qw2.scales_sb is not None
      else qw2.scales.reshape(steps, 2, dp),
      qw2.zeros_sb if qw2.zeros_sb is not None
      else qw2.zeros.reshape(steps, 2, dp))


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype",
                                             "interpret"))
def _fused_mlp_norm_2d(h, res, wn, qw13: QuantizedWeight,
                       qw2: QuantizedWeight, *, eps: float,
                       out_dtype=jnp.bfloat16, interpret: bool = False):
    """Like _fused_mlp_2d but with the residual-add + RMSNorm prologue
    fused in; returns (y [mp, dp], r = h + res [mp, k1p])."""
    mp, k1p = h.shape
    f = qw2.in_features
    fp2 = qw2.padded_in
    dp = qw2.padded_out
    tile_f = SUPERBLOCK
    steps = fp2 // tile_f
    gate_last = f // tile_f - 1
    up_base = f // tile_f

    def g_idx(i):
        return jnp.minimum(i, gate_last)

    whole = pl.BlockSpec((mp, k1p), lambda i: (0, 0))
    in_specs = [
        whole,                                                      # h
        whole,                                                      # res
        pl.BlockSpec((1, k1p), lambda i: (0, 0)),                   # wn
        pl.BlockSpec((k1p // 2, tile_f), lambda i: (0, g_idx(i))),  # Wg
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, g_idx(i))),
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, g_idx(i))),
        pl.BlockSpec((k1p // 2, tile_f),
                     lambda i: (0, up_base + g_idx(i))),            # Wu
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, up_base + g_idx(i))),
        pl.BlockSpec((k1p // EFF_GROUP, tile_f),
                     lambda i: (0, up_base + g_idx(i))),
        pl.BlockSpec((tile_f // 2, dp), lambda i: (i, 0)),          # W2
        pl.BlockSpec((1, 2, dp), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 2, dp), lambda i: (i, 0, 0)),
    ]
    kernel = functools.partial(_fused_mlp_kernel, k1p=k1p,
                               tile_f=tile_f, real_steps=f // tile_f,
                               eps=eps, with_norm=True)
    flops = 2 * mp * (k1p * 2 * f + f * dp)
    bytes_accessed = (k1p * f + fp2 * dp // 2
                      + 2 * (k1p // EFF_GROUP) * 2 * f * 2
                      + 2 * (fp2 // EFF_GROUP) * dp * 2)
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((mp, dp), lambda i: (0, 0)),
                   pl.BlockSpec((mp, k1p), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((mp, dp), out_dtype),
                   jax.ShapeDtypeStruct((mp, k1p), out_dtype)),
        scratch_shapes=[pltpu.VMEM((mp, dp), jnp.float32),
                        pltpu.VMEM((mp, k1p), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=mp * f),
        interpret=interpret,
    )(h, res, wn, qw13.packed, qw13.scales, qw13.zeros, qw13.packed,
      qw13.scales, qw13.zeros, qw2.packed,
      qw2.scales_sb if qw2.scales_sb is not None
      else qw2.scales.reshape(steps, 2, dp),
      qw2.zeros_sb if qw2.zeros_sb is not None
      else qw2.zeros.reshape(steps, 2, dp))


def fused_mlp_norm(h: jax.Array, res: jax.Array, w_norm: jax.Array,
                   qw13: QuantizedWeight, qw2: QuantizedWeight, *,
                   eps: float = 1e-6, out_dtype=None,
                   interpret: Optional[bool] = None):
    """(y, r) = (silu_and_mul(rms_norm(h+res, w) @ W13) @ W2, h+res) in
    one Pallas call — the post-attention fused_add_rms_norm plus the
    whole MLP (decode batches). Caller checks :func:`mlp_fusable`."""
    out_dtype = out_dtype or h.dtype
    *lead, k = h.shape
    m = 1
    for d in lead:
        m *= d
    if interpret is None:
        interpret = not default_backend_is_tpu()
    mp = max(8, _round_up(m, 8))
    h2 = h.reshape(m, k)
    r2 = res.reshape(m, k)
    if mp != m:
        h2 = jnp.pad(h2, ((0, mp - m), (0, 0)))
        r2 = jnp.pad(r2, ((0, mp - m), (0, 0)))
    y, r = _fused_mlp_norm_2d(h2.astype(jnp.bfloat16),
                              r2.astype(jnp.bfloat16),
                              w_norm.astype(jnp.bfloat16).reshape(1, k),
                              qw13, qw2, eps=float(eps),
                              out_dtype=out_dtype, interpret=interpret)
    return (y[:m, :qw2.out_features].reshape(*lead, qw2.out_features),
            r[:m].reshape(*lead, k))


def fused_mlp(x: jax.Array, qw13: QuantizedWeight, qw2: QuantizedWeight,
              *, out_dtype=None,
              interpret: Optional[bool] = None) -> jax.Array:
    """y = silu_and_mul(x @ W13) @ W2 in one Pallas call (decode
    batches). Caller must check :func:`mlp_fusable` first."""
    out_dtype = out_dtype or x.dtype
    *lead, k = x.shape
    m = 1
    for d in lead:
        m *= d
    if interpret is None:
        interpret = not default_backend_is_tpu()
    mp = max(8, _round_up(m, 8))
    x2 = x.reshape(m, k)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    y = _fused_mlp_2d(x2.astype(jnp.bfloat16), qw13, qw2,
                      out_dtype=out_dtype, interpret=interpret)
    return y[:m, :qw2.out_features].reshape(*lead, qw2.out_features)


def quant_matmul(
    x: jax.Array,
    qw: QuantizedWeight,
    *,
    out_dtype=None,
    use_kernel: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = x @ dequant(W) for x of shape [..., K]; returns [..., N].

    Dispatch: the fused Pallas decode kernel (token count <=
    FUSED_KERNEL_MAX_TOKENS, x whole in VMEM) or the M-tiled 3-D prefill
    kernel (any larger M) — the same group-correction math in both
    regimes, so no dequantized [K, N] is ever materialized (unlike the
    reference's >=256-token full-dequant heuristic, awq.py:155-162).
    Formats without a Pallas kernel (ref/sqllm) take the N-tiled
    memory-bounded dequant-GEMM fallback.
    """
    out_dtype = out_dtype or x.dtype
    *lead, k = x.shape
    assert k == qw.in_features, (x.shape, qw.shape)
    m = 1
    for d in lead:
        m *= d

    if use_kernel is None:
        use_kernel = (qw.fmt in ("i8pair", "u4")
                      and default_backend_is_tpu())
    if interpret is None:
        interpret = not default_backend_is_tpu()

    if not use_kernel:
        y = _tiled_dequant_matmul(x.reshape(m, k), qw)
        return y.reshape(*lead, qw.out_features).astype(out_dtype)

    x2 = x.reshape(m, k)
    if qw.perm is not None:
        x2 = jnp.take(x2, qw.perm, axis=1)
    if m <= FUSED_KERNEL_MAX_TOKENS:
        mp = max(8, _round_up(m, 8))
        if mp != m or qw.padded_in != k:
            x2 = jnp.pad(x2, ((0, mp - m), (0, qw.padded_in - k)))
        y = _fused_quant_matmul_2d(x2.astype(jnp.bfloat16), qw.packed,
                                   qw.scales, qw.zeros,
                                   fmt_is_u4=(qw.fmt == "u4"),
                                   out_dtype=out_dtype, interpret=interpret)
    else:
        tile_m = int(os.environ.get("VLLM_TPU_QMM_TM", 512))
        tile_m = min(tile_m, _round_up(m, 128))
        mp = _round_up(m, tile_m)
        if mp != m or qw.padded_in != k:
            x2 = jnp.pad(x2, ((0, mp - m), (0, qw.padded_in - k)))
        if os.environ.get("VLLM_TPU_W4A8") and qw.fmt == "i8pair":
            # int8-activation prefill: s8 x s8 MXU dots (2x peak rate);
            # numerics gated by tests/test_perplexity.py before this can
            # become a default.
            xi, sx = quantize_rows_i8(x2)
            y = _fused_quant_matmul_3d_w4a8(xi, sx, qw.packed, qw.scales,
                                            qw.zeros, tile_m=tile_m,
                                            out_dtype=out_dtype,
                                            interpret=interpret)
        elif (qw.fmt == "i8pair" and mp // tile_m > 1
              and not os.environ.get("VLLM_TPU_PREFILL_MOUTER")):
            # Multiple M tiles: M-innermost grid dequantizes each weight
            # tile once total instead of once per M tile (the r4 cause
            # of ctx-2048's 18% per-token degradation).
            y = _fused_quant_matmul_3d_minner(
                x2.astype(jnp.bfloat16), qw.packed, qw.scales, qw.zeros,
                tile_m=tile_m, out_dtype=out_dtype, interpret=interpret)
        else:
            y = _fused_quant_matmul_3d(x2.astype(jnp.bfloat16), qw.packed,
                                       qw.scales, qw.zeros, tile_m=tile_m,
                                       fmt_is_u4=(qw.fmt == "u4"),
                                       out_dtype=out_dtype,
                                       interpret=interpret)
    return y[:m, :qw.out_features].reshape(*lead, qw.out_features)


@functools.lru_cache(maxsize=1)
def default_backend_is_tpu() -> bool:
    if os.environ.get("VLLM_TPU_FORCE_PALLAS"):
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False
