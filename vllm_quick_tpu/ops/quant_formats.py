"""Packed INT4 weight formats and the offline TPU repacker.

This is the TPU-native answer to QUICK's weight re-ordering idea: the
reference's CUDA kernel (csrc/quantization/awq/gemm_kernels.cu:31,168,
183-204) pays a shared-memory write-back + ldmatrix round trip because
dequantized fragments land in the wrong register layout for ``mma``. We
instead repack *offline* so that nibble extraction inside the Pallas
kernel yields operand tiles that feed the MXU directly with zero in-VMEM
shuffles:

``i8pair`` format (default): int8 array of shape ``[K // 2, N]``.
K is padded to a multiple of 256 and split into 256-row *superblocks*.
Within superblock ``sb``, byte row ``sb * 128 + t`` stores

* low  nibble = q[sb*256 + t,       n]   (t in [0, 128))
* high nibble = q[sb*256 + 128 + t, n]

so ``lo = p & 0xF`` and ``hi = (p >> 4) & 0xF`` are two *contiguous*
128-row sub-tiles — each exactly one 128-element quantization group.
The kernel computes ``dot(x[:, lo_rows], lo) + dot(x[:, hi_rows], hi)``
— no interleave, no transpose, no lane shuffle, and every dynamic slice
offset is a multiple of 128 (lane-aligned). This is QUICK's trick
restated for a (sublane, lane) memory instead of mma fragments.

``u4`` format: native ``jnp.uint4`` array ``[K, N]`` in natural order
(Mosaic stores int4 packed in HBM). Preferred where the hardware
generation has fast u4->bf16 conversion; selected by benchmarking.

Scale/zero handling: scales/zeros are normalized offline to one row per
128 k-rows (``EFF_GROUP``). Checkpoint group sizes that are multiples of
128 (or per-channel) replicate rows; others fall back to the reference
path (fmt='ref'). The kernel never multiplies per element: it computes
per-group raw-integer partial dots and applies
``(partial - sum(x_g) * z_g) * s_g`` — O(K*N) extraction + convert only,
O(K*N/128) corrective math.

Checkpoint ingestion reproduces the semantics of the reference kernels:
 * AWQ   (csrc/quantization/awq/dequantize.cuh:17-84): nibble order
   [0,2,4,6,1,3,5,7] within each int32 along N; w = (q - z) * s.
 * GPTQ  (csrc/quantization/gptq/q_gemm.cu:166-196): sequential nibble
   order; w = (q - (z + 1)) * s; act-order ``g_idx`` handled offline
   (the TPU analogue of gptq_shuffle, q_gemm.cu:729-862).
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AWQ_PACK_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)  # nibble position -> element idx
EFF_GROUP = 128      # normalized quantization group (k-rows per scale row)
SUPERBLOCK = 256     # k-rows packed together (two EFF_GROUPs per byte row)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeight:
    """TPU-resident packed INT4 weight for one linear layer.

    Logical layout is always [K, N] (in_features, out_features): the
    matmul is ``y = x @ W`` with x of shape [M, K]. ``padded_in/out``
    include alignment padding; pad regions carry scale 0 so they
    contribute exactly zero regardless of activation values.
    """
    packed: jax.Array          # i8pair: int8 [Kp//2, Np] | u4: uint4 [Kp, Np]
    scales: jax.Array          # [Kp // EFF_GROUP, Np] bfloat16
    zeros: jax.Array           # [Kp // EFF_GROUP, Np] bfloat16
    group_size: int = dataclasses.field(metadata=dict(static=True))
    fmt: str = dataclasses.field(metadata=dict(static=True))
    in_features: int = dataclasses.field(metadata=dict(static=True))
    out_features: int = dataclasses.field(metadata=dict(static=True))
    padded_in: int = dataclasses.field(metadata=dict(static=True))
    padded_out: int = dataclasses.field(metadata=dict(static=True))
    # Optional runtime K-permutation (GPTQ act-order): x must be gathered
    # with this index before the matmul. None for natural order.
    perm: Optional[jax.Array] = None
    # SqueezeLLM non-uniform codebook: [N, 16] per-output-channel float
    # levels (fmt='sqllm'); scales/zeros are unused placeholders then.
    lut: Optional[jax.Array] = None
    # Superblock-major views of scales/zeros ([Kp//SUPERBLOCK, 2, Np]),
    # precomputed at PACK time for i8pair: the fused-MLP kernel needs
    # its W2 scale pairs as one trailing block per grid step, and an
    # in-jit reshape of the tiled [Kp//128, Np] array physically
    # relayouts it EVERY STEP (r5 device trace: 0.125 ms/step of
    # reshapes + 0.08 ms of copies across 32 layers).
    scales_sb: Optional[jax.Array] = None
    zeros_sb: Optional[jax.Array] = None

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.in_features, self.out_features)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Packing (host-side, numpy)
# ---------------------------------------------------------------------------

def pack_i8pair(q: np.ndarray) -> np.ndarray:
    """uint4-valued q [K, N] (K % 256 == 0) -> int8 [K//2, N] superblock
    dual-half layout. Uses the native repacker (csrc/repack.cpp) when
    available."""
    k, n = q.shape
    assert k % SUPERBLOCK == 0, k
    from vllm_quick_tpu import native
    out = native.pack_i8pair(q)
    if out is not None:
        return out
    qb = q.reshape(k // SUPERBLOCK, 2, SUPERBLOCK // 2, n).astype(np.uint8)
    packed = qb[:, 0] | (qb[:, 1] << 4)
    return packed.reshape(k // 2, n).view(np.int8)


def unpack_i8pair(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_i8pair -> uint4-valued q [K, N]."""
    k2, n = packed.shape
    k = k2 * 2
    p = packed.view(np.uint8).reshape(k // SUPERBLOCK, SUPERBLOCK // 2, n)
    q = np.stack([p & 0xF, (p >> 4) & 0xF], axis=1)
    return q.reshape(k, n)


# ---------------------------------------------------------------------------
# Checkpoint ingestion: AWQ / GPTQ raw tensors -> integer q / scales / zeros
# ---------------------------------------------------------------------------

def awq_unpack_int32(x: np.ndarray) -> np.ndarray:
    """Unpack AWQ int32-packed nibbles along the last dim.

    x: int32 [..., N/8] -> uint8-valued [..., N]; nibble position p holds
    logical element AWQ_PACK_ORDER[p] (dequantize.cuh:17-84). Uses the
    native repacker (csrc/repack.cpp) when available.
    """
    from vllm_quick_tpu import native
    out = native.awq_unpack(np.ascontiguousarray(x))
    if out is not None:
        return out
    x = x.view(np.uint32) if x.dtype == np.int32 else x.astype(np.uint32)
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    nibbles = ((x[..., None] >> shifts) & 0xF).astype(np.uint8)
    out = np.empty_like(nibbles)
    for pos, elem in enumerate(AWQ_PACK_ORDER):
        out[..., elem] = nibbles[..., pos]
    return out.reshape(*x.shape[:-1], x.shape[-1] * 8)


def gptq_unpack_int32(x: np.ndarray, axis: int) -> np.ndarray:
    """Unpack GPTQ int32-packed nibbles along ``axis`` (sequential order,
    LSB first). Uses the native repacker for the axis-0 hot case."""
    if axis == 0 and x.ndim == 2:
        from vllm_quick_tpu import native
        out = native.gptq_unpack_axis0(np.ascontiguousarray(x))
        if out is not None:
            return out
    x = x.view(np.uint32) if x.dtype == np.int32 else x.astype(np.uint32)
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    xm = np.moveaxis(x, axis, -1)
    nib = ((xm[..., None] >> shifts) & 0xF).astype(np.uint8)
    nib = nib.reshape(*xm.shape[:-1], xm.shape[-1] * 8)
    return np.moveaxis(nib, -1, axis)


def from_awq(
    qweight: np.ndarray,   # int32 [K, N/8]
    qzeros: np.ndarray,    # int32 [K/G, N/8]
    scales: np.ndarray,    # fp16/fp32 [K/G, N]
    group_size: int,
    fmt: str = "i8pair",
) -> "QuantizedWeight":
    """Ingest one AWQ checkpoint layer (reference load path:
    vllm/model_executor/layers/quantization/awq.py:80-141)."""
    q = awq_unpack_int32(qweight)          # [K, N] uint8-valued 0..15
    z = awq_unpack_int32(qzeros)           # [K/G, N]
    return build_quantized_weight(q, z.astype(np.float32),
                                  scales.astype(np.float32), group_size, fmt)


def from_gptq(
    qweight: np.ndarray,   # int32 [K/8, N]
    qzeros: np.ndarray,    # int32 [K/G, N/8]
    scales: np.ndarray,    # fp16 [K/G, N]
    group_size: int,
    g_idx: Optional[np.ndarray] = None,
    fmt: str = "i8pair",
) -> "QuantizedWeight":
    q = gptq_unpack_int32(qweight, axis=0)       # [K, N]
    z = gptq_unpack_int32(qzeros, axis=1).astype(np.float32) + 1.0
    k = q.shape[0]
    if group_size in (-1, None):
        group_size = k
    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx)
        sequential = np.arange(k) // group_size
        if not np.array_equal(g_idx, sequential):
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[perm]
    qw = build_quantized_weight(q, z, scales.astype(np.float32), group_size,
                                fmt)
    if perm is not None:
        qw.perm = jnp.asarray(perm)
    return qw


def from_squeezellm(
    qweight: np.ndarray,        # int32 [K/8, N] sequential nibbles
    lookup_table: np.ndarray,   # [N, 16] float codebook per out channel
) -> "QuantizedWeight":
    """Ingest one SqueezeLLM layer (reference:
    vllm/model_executor/layers/quantization/squeezellm.py:13-60 +
    csrc/quantization/squeezellm/quant_cuda_kernel.cu LUT dequant).
    Runtime path is dequantize-then-GEMM (the reference's GEMV kernel is
    a low-batch optimization; capability parity first)."""
    q = gptq_unpack_int32(qweight, axis=0)          # [K, N] 0..15
    k, n = q.shape
    return QuantizedWeight(
        packed=jnp.asarray(q.astype(np.uint8), dtype=jnp.uint4),
        scales=jnp.zeros((1, n), dtype=jnp.float32),
        zeros=jnp.zeros((1, n), dtype=jnp.float32),
        group_size=k, fmt="sqllm",
        in_features=k, out_features=n, padded_in=k, padded_out=n,
        lut=jnp.asarray(lookup_table.astype(np.float32)))


def quantize_squeezellm_reference(w: np.ndarray,
                                  n_levels: int = 16) -> "QuantizedWeight":
    """Per-column quantile codebook quantization of a dense matrix —
    test/ingest-free analogue of SqueezeLLM's k-means codebooks."""
    k, n = w.shape
    qs = np.linspace(0, 1, n_levels)
    lut = np.quantile(w, qs, axis=0).T.astype(np.float32)   # [N, 16]
    dist = np.abs(w[:, :, None] - lut[None, :, :])      # [K, N, 16]
    q = np.argmin(dist, axis=2).astype(np.uint8)            # [K, N]
    qw = QuantizedWeight(
        packed=jnp.asarray(q, dtype=jnp.uint4),
        scales=jnp.zeros((1, n), dtype=jnp.float32),
        zeros=jnp.zeros((1, n), dtype=jnp.float32),
        group_size=k, fmt="sqllm",
        in_features=k, out_features=n, padded_in=k, padded_out=n,
        lut=jnp.asarray(lut))
    return qw


def quantize_reference(
    w: np.ndarray,  # [K, N] float
    group_size: int = 128,
    fmt: str = "i8pair",
) -> "QuantizedWeight":
    """AWQ-style asymmetric 4-bit quantization of a dense matrix — used by
    tests and for quantize-on-the-fly of unquantized checkpoints."""
    k, n = w.shape
    assert k % group_size == 0, (k, group_size)
    wg = w.reshape(k // group_size, group_size, n).astype(np.float64)
    wmax = wg.max(axis=1)
    wmin = wg.min(axis=1)
    s = np.maximum((wmax - wmin) / 15.0, 1e-8)
    z = np.clip(np.round(-wmin / s), 0, 15)
    q = np.clip(np.round(wg / s[:, None, :] + z[:, None, :]), 0, 15)
    return build_quantized_weight(
        q.reshape(k, n).astype(np.uint8), z.astype(np.float32),
        s.astype(np.float32), group_size, fmt)


def build_quantized_weight(q: np.ndarray, zeros: np.ndarray,
                           scales: np.ndarray, group_size: int,
                           fmt: str) -> "QuantizedWeight":
    """Normalize + pad + pack integer weights into a TPU format.

    q: [K, N] integer-valued (0..15); zeros/scales: [K/group_size, N].
    """
    k, n = q.shape
    if group_size in (-1, None):
        group_size = k
    assert k % group_size == 0, (k, group_size)

    # Normalize scales/zeros to one row per EFF_GROUP k-rows.
    if group_size % EFF_GROUP == 0:
        rep = group_size // EFF_GROUP
        scales_n = np.repeat(scales, rep, axis=0)
        zeros_n = np.repeat(zeros, rep, axis=0)
    elif fmt != "ref":
        # Exotic group size: keep original granularity, reference math only.
        fmt = "ref"
        scales_n, zeros_n = scales, zeros

    if fmt == "ref":
        return QuantizedWeight(
            packed=jnp.asarray(q.astype(np.uint8), dtype=jnp.uint4),
            scales=jnp.asarray(scales, dtype=jnp.float32),
            zeros=jnp.asarray(zeros, dtype=jnp.float32),
            group_size=group_size, fmt=fmt,
            in_features=k, out_features=n, padded_in=k, padded_out=n)

    # Pad K to a superblock multiple and N to a lane multiple. Pad k-rows
    # get scale 0 -> contribute exactly 0 for any activation; pad n-cols
    # are sliced off by the caller. When there are >= 4 superblocks, pad
    # to a multiple of 4 so the kernel can pick k-tiles whose scale
    # blocks satisfy the (8, 128) sublane tiling rule.
    kp = _round_up(k, SUPERBLOCK)
    if kp // SUPERBLOCK >= 4:
        kp = _round_up(kp, 4 * SUPERBLOCK)
    np_ = _round_up(n, 128)
    if kp != k or np_ != n:
        q = np.pad(q, ((0, kp - k), (0, np_ - n)))
        scales_n = np.pad(scales_n,
                          ((0, kp // EFF_GROUP - scales_n.shape[0]),
                           (0, np_ - n)))
        zeros_n = np.pad(zeros_n,
                         ((0, kp // EFF_GROUP - zeros_n.shape[0]),
                          (0, np_ - n)))

    sb_kwargs = {}
    if fmt == "i8pair":
        packed = jnp.asarray(pack_i8pair(q))
        # Host-side reshape: free here, a per-step relayout if left to
        # the jitted kernel call (see QuantizedWeight.scales_sb).
        sb_kwargs = dict(
            scales_sb=jnp.asarray(
                scales_n.reshape(kp // SUPERBLOCK, 2, np_),
                dtype=jnp.bfloat16),
            zeros_sb=jnp.asarray(
                zeros_n.reshape(kp // SUPERBLOCK, 2, np_),
                dtype=jnp.bfloat16))
    elif fmt == "u4":
        packed = jnp.asarray(q.astype(np.uint8), dtype=jnp.uint4)
    else:
        raise ValueError(f"Unknown packed format: {fmt}")
    return QuantizedWeight(
        packed=packed,
        scales=jnp.asarray(scales_n, dtype=jnp.bfloat16),
        zeros=jnp.asarray(zeros_n, dtype=jnp.bfloat16),
        group_size=group_size,
        fmt=fmt,
        in_features=k,
        out_features=n,
        padded_in=kp,
        padded_out=np_,
        **sb_kwargs,
    )


def dummy_quantized_weight(k: int, n: int, group_size: int = 128,
                           fmt: str = "i8pair") -> "QuantizedWeight":
    """Checkpoint-shaped QuantizedWeight materialized *on device*
    (no host->device weight transfer) — for benchmarks and memory
    profiling of large models. Same padded dims as
    build_quantized_weight."""
    kp = _round_up(k, SUPERBLOCK)
    if kp // SUPERBLOCK >= 4:
        kp = _round_up(kp, 4 * SUPERBLOCK)
    np_ = _round_up(n, 128)
    if fmt == "i8pair":
        packed = jnp.zeros((kp // 2, np_), dtype=jnp.int8)
    elif fmt == "u4":
        packed = jnp.zeros((kp, np_), dtype=jnp.uint4)
    else:
        raise ValueError(fmt)
    sb_kwargs = {}
    if fmt == "i8pair":
        sb_kwargs = dict(
            scales_sb=jnp.ones((kp // SUPERBLOCK, 2, np_),
                               dtype=jnp.bfloat16),
            zeros_sb=jnp.full((kp // SUPERBLOCK, 2, np_), 8.0,
                              dtype=jnp.bfloat16))
    return QuantizedWeight(
        packed=packed,
        scales=jnp.ones((kp // EFF_GROUP, np_), dtype=jnp.bfloat16),
        zeros=jnp.full((kp // EFF_GROUP, np_), 8.0, dtype=jnp.bfloat16),
        group_size=group_size, fmt=fmt,
        in_features=k, out_features=n, padded_in=kp, padded_out=np_,
        **sb_kwargs)


# ---------------------------------------------------------------------------
# jnp reference math (runs anywhere; ground truth for kernel tests and the
# big-batch dequant-then-GEMM path, mirroring awq.py:155-162)
# ---------------------------------------------------------------------------

def stack_quantized_weights(qws) -> QuantizedWeight:
    """Stack per-expert QuantizedWeights into one [E, ...] stack for the
    grouped MoE kernel. All experts must share layout and format."""
    import dataclasses
    base = qws[0]
    for q in qws[1:]:
        assert (q.fmt, q.shape, q.padded_in, q.padded_out) == \
            (base.fmt, base.shape, base.padded_in, base.padded_out), (
                "heterogeneous expert quant layouts cannot be stacked")
        assert q.perm is None and q.lut is None, (
            "act-order / LUT formats are not stackable")
    return dataclasses.replace(
        base,
        packed=jnp.stack([q.packed for q in qws]),
        scales=jnp.stack([q.scales for q in qws]),
        zeros=jnp.stack([q.zeros for q in qws]),
        # The grouped MoE kernel reads the flat scale layout; drop the
        # superblock views rather than carry base's stale ones.
        scales_sb=None,
        zeros_sb=None,
    )


def unpack_to_int(qw: QuantizedWeight) -> jax.Array:
    """[K, N] int32-valued quantized weights in natural order (unpadded)."""
    if qw.fmt in ("u4", "ref", "sqllm"):
        q = qw.packed.astype(jnp.int32)
    else:
        kp = qw.padded_in
        p = qw.packed.astype(jnp.int32).reshape(
            kp // SUPERBLOCK, SUPERBLOCK // 2, qw.padded_out)
        q = jnp.concatenate([p & 0xF, (p >> 4) & 0xF], axis=1)
        q = q.reshape(kp, qw.padded_out)
    return q[:qw.in_features, :qw.out_features]


def dequantize(qw: QuantizedWeight, dtype=jnp.bfloat16) -> jax.Array:
    """Full dequantization to a dense [K, N] matrix (unpadded)."""
    k, n = qw.in_features, qw.out_features
    if qw.fmt == "sqllm":
        # w[k, n] = lut[n, q[k, n]] — per-column codebook gather.
        q = unpack_to_int(qw)                               # [K, N]
        w = jnp.take_along_axis(
            jnp.broadcast_to(qw.lut[None, :, :], (k, n, 16)),
            q[:, :, None], axis=2)[..., 0]
        return w.astype(dtype)
    if qw.fmt == "ref":
        g = qw.group_size
    else:
        g = EFF_GROUP
    q = unpack_to_int(qw).astype(jnp.float32).reshape(k // g, g, n)
    scales = qw.scales[:k // g, :n].astype(jnp.float32)
    zeros = qw.zeros[:k // g, :n].astype(jnp.float32)
    w = (q - zeros[:, None, :]) * scales[:, None, :]
    return w.reshape(k, n).astype(dtype)


def quant_matmul_ref(x: jax.Array, qw: QuantizedWeight) -> jax.Array:
    """Reference y = x @ dequant(W); fp32 accumulate."""
    if qw.perm is not None:
        x = jnp.take(x, qw.perm, axis=-1)
    w = dequantize(qw, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
