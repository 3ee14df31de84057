"""Streaming dense bf16 matmul for tiny M (decode-time lm_head).

XLA's stock [1, K] @ [K, N] matvec on this part runs at ~100 GB/s —
far under the ~580 GB/s a Pallas streaming kernel sustains — because the
batch-1 GEMM doesn't pipeline HBM reads. This kernel reuses the quant
matmul's structure (ops/quant_matmul.py): x lives whole in VMEM, the
weight streams through the implicit double-buffered pipeline over a
(N tiles, K tiles) grid with a resident fp32 accumulator, so the weight
is read exactly once at copy rate.

Reference parity: the lm-head matmul inside the sampler
(vllm/model_executor/layers/sampler.py:38-48) — there it is a cuBLAS
GEMM; on TPU the decode shape needs this kernel instead.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Weight VMEM tile budget in bytes (doubled by pipeline buffering).
_TILE_BUDGET = 3 * 1024 * 1024 // 2
# The streaming kernel only wins in the memory-bound small-M regime.
DENSE_KERNEL_MAX_TOKENS = 64


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _choose_tiles(kp: int, np_: int, itemsize: int) -> tuple:
    """(tile_k, tile_n) minimizing grid steps under the VMEM budget;
    tiles must divide the padded dims and respect the (8, 128) rule."""
    best = None
    for tn in (1024, 512, 256, 128):
        if np_ % tn != 0:
            continue
        for tk in (4096, 2048, 1024, 512, 256, 128):
            if kp % tk != 0:
                continue
            if tk * tn * itemsize > _TILE_BUDGET:
                continue
            steps = (np_ // tn) * (kp // tk)
            cand = (steps, -(tk * tn), tk, tn)
            if best is None or cand < best:
                best = cand
    if best is None:
        return kp, np_
    return best[2], best[3]


def _dense_kernel(x_ref, w_ref, o_ref, acc_ref):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _dense_small_m_2d(x: jax.Array, w: jax.Array, *,
                      out_dtype=jnp.float32,
                      interpret: bool = False) -> jax.Array:
    """x: [Mp, Kp] (Mp mult of 8, Kp of 128), w: [Kp, Np] -> [Mp, Np]."""
    mp, kp = x.shape
    np_ = w.shape[1]
    tile_k, tile_n = _choose_tiles(kp, np_, w.dtype.itemsize)
    grid = (np_ // tile_n, kp // tile_k)
    flops = 2 * mp * kp * np_
    bytes_accessed = (kp * np_ + mp * kp + mp * np_) * 2
    return pl.pallas_call(
        _dense_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, tile_k), lambda j, k: (0, k)),
            pl.BlockSpec((tile_k, tile_n), lambda j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((mp, tile_n), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(x, w)


def dense_matmul_small_m(
    x: jax.Array,                # [..., K]
    w: jax.Array,                # [K, N]
    *,
    out_dtype=jnp.float32,
    use_kernel: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = x @ w with fp32 accumulation; streams w once for tiny M.

    Falls back to jnp.dot off-TPU or above DENSE_KERNEL_MAX_TOKENS.
    """
    from vllm_quick_tpu.ops.quant_matmul import default_backend_is_tpu

    *lead, k = x.shape
    n = w.shape[1]
    m = 1
    for d in lead:
        m *= d
    if use_kernel is None:
        use_kernel = (m <= DENSE_KERNEL_MAX_TOKENS
                      and default_backend_is_tpu())
    if interpret is None:
        interpret = not default_backend_is_tpu()
    if not use_kernel:
        return jnp.dot(x, w, preferred_element_type=out_dtype)

    mp = max(8, _round_up(m, 8))
    kp = _round_up(k, 256)
    np_ = _round_up(n, 128)
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    if (mp, kp) != (m, k):
        x2 = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    y = _dense_small_m_2d(x2, w, out_dtype=out_dtype, interpret=interpret)
    return y[:m, :n].reshape(*lead, n)


# -- int8 weight variant (lm_head) ---------------------------------------

def quantize_cols_i8(w) -> tuple:
    """Per-output-column symmetric int8 PTQ: w ~= wi8 * s[None, :].

    Load-time transform for the lm_head (the one remaining large bf16
    weight stream in the decode step: 0.26 GB -> 0.13 GB, ~0.19 ms/step
    at spec HBM). Runs in numpy so the bf16 original is never resident
    on device alongside the int8 copy."""
    import numpy as np

    w = np.asarray(w, np.float32)
    s = np.abs(w).max(axis=0, keepdims=True) / 127.0
    s = np.maximum(s, 1e-12)
    wi8 = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(wi8), jnp.asarray(s, jnp.float32)


def _dense_kernel_i8(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # i8 -> bf16 lane cast (the same native-width path as the quant
    # kernel's offset-binary dequant); scale applied once at the end.
    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _done():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _dense_small_m_2d_i8(x: jax.Array, wi8: jax.Array, s: jax.Array, *,
                         out_dtype=jnp.float32,
                         interpret: bool = False) -> jax.Array:
    """x: [Mp, Kp] bf16, wi8: [Kp, Np] int8, s: [1, Np] f32."""
    mp, kp = x.shape
    np_ = wi8.shape[1]
    tile_k, tile_n = _choose_tiles(kp, np_, 1)
    grid = (np_ // tile_n, kp // tile_k)
    flops = 2 * mp * kp * np_
    bytes_accessed = kp * np_ + (mp * kp + mp * np_) * 2 + 4 * np_
    return pl.pallas_call(
        _dense_kernel_i8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, tile_k), lambda j, k: (0, k)),
            pl.BlockSpec((tile_k, tile_n), lambda j, k: (k, j)),
            pl.BlockSpec((1, tile_n), lambda j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((mp, tile_n), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, tile_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(x, wi8, s)


def dense_matmul_small_m_i8(
    x: jax.Array,                # [..., K]
    wi8: jax.Array,              # [K, N] int8
    s: jax.Array,                # [1, N] f32 per-column scales
    *,
    out_dtype=jnp.float32,
    use_kernel: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """y = (x @ wi8) * s with fp32 accumulation (int8 lm_head)."""
    from vllm_quick_tpu.ops.quant_matmul import default_backend_is_tpu

    *lead, k = x.shape
    n = wi8.shape[1]
    m = 1
    for d in lead:
        m *= d
    if use_kernel is None:
        use_kernel = (m <= DENSE_KERNEL_MAX_TOKENS
                      and default_backend_is_tpu())
    if interpret is None:
        interpret = not default_backend_is_tpu()
    if not use_kernel:
        y = jnp.dot(x.astype(jnp.bfloat16), wi8.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return (y * s).astype(out_dtype)

    mp = max(8, _round_up(m, 8))
    kp = _round_up(k, 256)
    np_ = _round_up(n, 128)
    x2 = x.reshape(m, k).astype(jnp.bfloat16)
    if (mp, kp) != (m, k):
        x2 = jnp.pad(x2, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        wi8 = jnp.pad(wi8, ((0, kp - k), (0, np_ - n)))
        s = jnp.pad(s, ((0, 0), (0, np_ - n)))
    y = _dense_small_m_2d_i8(x2, wi8, s, out_dtype=out_dtype,
                             interpret=interpret)
    return y[:m, :n].reshape(*lead, n)
