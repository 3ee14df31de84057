"""Fused INT4 dequant+matmul kernel vs pure-jnp reference.

Mirrors the reference's kernel-vs-reference grid strategy
(tests/kernels/test_attention.py style): parameter grids over shapes and
formats, fp32 reference math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_quick_tpu.ops import quant_formats as qf
from vllm_quick_tpu.ops.quant_matmul import quant_matmul

SHAPES = [
    # (M, K, N)
    (1, 256, 128),
    (1, 512, 384),
    (4, 1024, 512),
    (16, 768, 256),
    (7, 512, 640),   # ragged M
    (33, 2048, 512),
]


def _make_qw(rng, k, n, group_size=128, fmt="i8pair"):
    w = (rng.standard_normal((k, n)) * 0.05).astype(np.float32)
    return w, qf.quantize_reference(w, group_size=group_size, fmt=fmt)


def test_pack_unpack_roundtrip(rng):
    q = rng.integers(0, 16, size=(512, 256)).astype(np.uint8)
    packed = qf.pack_i8pair(q)
    assert packed.shape == (256, 256)
    out = qf.unpack_i8pair(packed)
    np.testing.assert_array_equal(q, out)


def test_awq_unpack_order():
    # One int32 with nibbles 0..7 in position order; logical order must
    # follow AWQ_PACK_ORDER (dequantize.cuh semantics).
    vals = np.arange(8, dtype=np.uint32)
    word = np.zeros((), dtype=np.uint32)
    for pos, v in enumerate(vals):
        word |= v << (4 * pos)
    out = qf.awq_unpack_int32(word.reshape(1, 1).astype(np.int32))
    expected = np.empty(8, dtype=np.uint8)
    for pos, elem in enumerate(qf.AWQ_PACK_ORDER):
        expected[elem] = pos
    np.testing.assert_array_equal(out[0], expected)


def test_gptq_unpack_order():
    word = np.zeros((), dtype=np.uint32)
    for pos in range(8):
        word |= np.uint32(pos) << (4 * pos)
    out = qf.gptq_unpack_int32(word.reshape(1, 1).astype(np.int32), axis=0)
    np.testing.assert_array_equal(out[:, 0], np.arange(8, dtype=np.uint8))


def test_dequantize_close_to_original(rng):
    w, qw = _make_qw(rng, 512, 256)
    w_hat = np.asarray(qf.dequantize(qw, dtype=jnp.float32))
    # int4 with per-128-group scales: max error is about scale/2.
    scales = np.asarray(qw.scales, dtype=np.float32)[:4, :256]
    bound = np.repeat(scales, 128, axis=0) * 0.51 + 1e-6
    assert (np.abs(w_hat - w) <= bound).mean() > 0.999


@pytest.mark.parametrize("m,k,n", SHAPES)
@pytest.mark.parametrize("fmt", ["i8pair", "u4"])
def test_fused_kernel_matches_reference(rng, m, k, n, fmt):
    w, qw = _make_qw(rng, k, n, fmt=fmt)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
    ref = qf.quant_matmul_ref(x, qw)
    out = quant_matmul(x, qw, use_kernel=True, interpret=True)
    assert out.shape == (m, n)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2)


def test_large_batch_path(rng):
    w, qw = _make_qw(rng, 512, 256)
    x = jnp.asarray(rng.standard_normal((128, 512)), dtype=jnp.bfloat16)
    out = quant_matmul(x, qw)  # CPU default: tiled dequant+GEMM path
    ref = qf.quant_matmul_ref(x, qw)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


PREFILL_SHAPES = [
    # (M, K, N) — M > FUSED_KERNEL_MAX_TOKENS exercises the 3-D
    # M-tiled kernel (multiple M/N/K tiles, ragged M padding).
    (128, 1024, 512),
    (300, 1024, 256),     # ragged M -> padded to a tile multiple
    (512, 2048, 1024),    # several k-tiles under the x budget
]


@pytest.mark.parametrize("m,k,n", PREFILL_SHAPES)
@pytest.mark.parametrize("fmt", ["i8pair", "u4"])
def test_prefill_kernel_matches_reference(rng, m, k, n, fmt):
    w, qw = _make_qw(rng, k, n, fmt=fmt)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
    ref = qf.quant_matmul_ref(x, qw)
    out = quant_matmul(x, qw, use_kernel=True, interpret=True)
    assert out.shape == (m, n)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("m,k,n", [(300, 1024, 512), (1024, 1024, 256)])
def test_prefill_minner_matches_reference(rng, m, k, n, monkeypatch):
    """The M-innermost grid (dequant once per weight tile, accumulator
    scratch spanning all M rows) — forced into multiple M tiles with a
    small tile_m so the reuse-across-m path is exercised, including the
    ragged-M padded tail."""
    monkeypatch.setenv("VLLM_TPU_QMM_TM", "128")
    w, qw = _make_qw(rng, k, n, fmt="i8pair")
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
    ref = qf.quant_matmul_ref(x, qw)
    out = quant_matmul(x, qw, use_kernel=True, interpret=True)
    assert out.shape == (m, n)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2)
    # A/B sanity: the m-outer fallback computes the same thing.
    monkeypatch.setenv("VLLM_TPU_PREFILL_MOUTER", "1")
    out2 = quant_matmul(x, qw, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out2, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("m,k,n", PREFILL_SHAPES)
def test_w4a8_prefill_matches_reference(rng, m, k, n, monkeypatch):
    """The int8-activation prefill kernel: integer dots are exact, so
    the only error is per-token activation rounding — bounded by the
    int8 step relative to the row max (|x|<=sx*127, err<=sx/2)."""
    monkeypatch.setenv("VLLM_TPU_W4A8", "1")
    w, qw = _make_qw(rng, k, n, fmt="i8pair")
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
    ref = qf.quant_matmul_ref(x, qw)
    out = quant_matmul(x, qw, use_kernel=True, interpret=True)
    assert out.shape == (m, n)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).mean() + 1e-3
    # W4A8 changes numerics by design; bound the mean relative error.
    assert err.mean() / scale < 0.05, err.mean() / scale


def test_w4a8_quantize_rows():
    x = jnp.asarray([[0.5, -1.0, 0.25], [2.0, 0.0, -4.0]], jnp.float32)
    from vllm_quick_tpu.ops.quant_matmul import quantize_rows_i8
    xi, sx = quantize_rows_i8(x)
    np.testing.assert_allclose(np.asarray(xi * sx), np.asarray(x),
                               rtol=2e-2, atol=2e-2)
    assert xi.dtype == jnp.int8 and np.abs(np.asarray(xi)).max() <= 127


def test_tiled_dequant_fallback_matches_reference(rng):
    """The memory-bounded N-tiled fallback (ref/sqllm formats and CPU
    large-M) must agree with the full-matrix reference math."""
    w, qw = _make_qw(rng, 512, 256, group_size=64)   # exotic -> fmt=ref
    assert qw.fmt == "ref"
    x = jnp.asarray(rng.standard_normal((96, 512)), dtype=jnp.bfloat16)
    from vllm_quick_tpu.ops.quant_matmul import _tiled_dequant_matmul
    out = _tiled_dequant_matmul(x, qw, tile_n=128)
    ref = qf.quant_matmul_ref(x, qw)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_batched_leading_dims(rng):
    w, qw = _make_qw(rng, 256, 128)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)), dtype=jnp.bfloat16)
    out = quant_matmul(x, qw, use_kernel=True, interpret=True)
    assert out.shape == (2, 3, 128)
    ref = qf.quant_matmul_ref(x.reshape(6, 256), qw).reshape(2, 3, 128)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_awq_ingest_matches_manual_dequant(rng):
    """Build a fake AWQ checkpoint layer, ingest it, and compare against
    directly-computed (q - z) * s."""
    k, n, g = 256, 128, 128
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    z = rng.integers(0, 16, size=(k // g, n)).astype(np.uint8)
    scales = (rng.standard_normal((k // g, n)) * 0.01 + 0.05).astype(
        np.float32)

    def awq_pack(arr):
        # arr [..., N] -> int32 [..., N/8] with AWQ nibble interleave.
        out = np.zeros((*arr.shape[:-1], arr.shape[-1] // 8), dtype=np.uint32)
        arr = arr.reshape(*out.shape, 8)
        for pos, elem in enumerate(qf.AWQ_PACK_ORDER):
            out |= arr[..., elem].astype(np.uint32) << (4 * pos)
        return out.view(np.int32)

    qw = qf.from_awq(awq_pack(q), awq_pack(z), scales, group_size=g)
    w_manual = (q.astype(np.float32) - np.repeat(z, g, 0)) * np.repeat(
        scales, g, 0)
    w_got = np.asarray(qf.dequantize(qw, dtype=jnp.float32))
    np.testing.assert_allclose(w_got, w_manual, rtol=2e-2, atol=1e-3)


def test_gptq_ingest_with_act_order(rng):
    k, n, g = 256, 128, 128
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    z = rng.integers(0, 15, size=(k // g, n)).astype(np.uint8)
    scales = (rng.standard_normal((k // g, n)) * 0.01 + 0.05).astype(
        np.float32)
    # Scrambled act-order: k-rows assigned to groups out of order.
    g_idx = rng.permutation(np.arange(k) // g)

    def gptq_pack(arr, axis):
        arr = np.moveaxis(arr, axis, -1)
        out = np.zeros((*arr.shape[:-1], arr.shape[-1] // 8), dtype=np.uint32)
        arr = arr.reshape(*out.shape, 8)
        for pos in range(8):
            out |= arr[..., pos].astype(np.uint32) << (4 * pos)
        return np.moveaxis(out.view(np.int32), -1, axis)

    qw = qf.from_gptq(gptq_pack(q, 0), gptq_pack(z, 1), scales,
                      group_size=g, g_idx=g_idx)
    assert qw.perm is not None

    # Reference: w[k] = (q[k] - (z[g_idx[k]] + 1)) * s[g_idx[k]]
    w_full = (q.astype(np.float32) - (z[g_idx].astype(np.float32) + 1.0)) \
        * scales[g_idx]
    x = jnp.asarray(rng.standard_normal((3, k)), dtype=jnp.float32)
    ref = np.asarray(x, np.float32) @ w_full
    got = np.asarray(qf.quant_matmul_ref(x, qw), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("t", [1, 5, 8])
@pytest.mark.parametrize("d,f", [(512, 768), (256, 1024)])
def test_fused_mlp_matches_two_kernel_path(t, d, f):
    """One-call gate->silu->down kernel vs the reference chain
    (interpret mode on CPU; on-chip numerics verified in bring-up)."""
    import jax
    from vllm_quick_tpu.ops.quant_matmul import fused_mlp, mlp_fusable

    rng = np.random.default_rng(d + f + t)
    wg = rng.standard_normal((d, f)).astype(np.float32) * 0.1
    wu = rng.standard_normal((d, f)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((f, d)).astype(np.float32) * 0.1
    qw13 = qf.quantize_reference(np.concatenate([wg, wu], axis=1))
    qw2 = qf.quantize_reference(w2)
    assert mlp_fusable(qw13, qw2)

    x = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    got = np.asarray(fused_mlp(x, qw13, qw2, interpret=True), np.float32)

    gu = qf.quant_matmul_ref(x, qw13)
    g, u = jnp.split(gu, 2, axis=-1)
    h = (jax.nn.silu(g.astype(jnp.float32))
         * u.astype(jnp.float32)).astype(jnp.bfloat16)
    want = np.asarray(qf.quant_matmul_ref(h, qw2), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-2


@pytest.mark.parametrize("t", [1, 5])
@pytest.mark.parametrize("d,n", [(512, 768), (256, 384)])
def test_fused_qkv_norm_matches_composed_path(t, d, n):
    """The qkv norm-prologue kernel: (qkv, r) must equal residual-add +
    rms_norm + quant matmul (interpret mode on CPU)."""
    import jax
    from vllm_quick_tpu.ops.quant_matmul import (fused_qkv_norm,
                                                 qkv_norm_fusable)

    rng = np.random.default_rng(7 * d + n + t)
    eps = 1e-6
    w = rng.standard_normal((d, n)).astype(np.float32) * 0.1
    qw = qf.quantize_reference(w)
    assert qkv_norm_fusable(qw)

    h = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    wn = jnp.asarray(1.0 + 0.1 * rng.standard_normal((d,)), jnp.bfloat16)
    y, r = fused_qkv_norm(h, res, wn, qw, eps=eps, interpret=True)

    r_want = h.astype(jnp.float32) + res.astype(jnp.float32)
    var = jnp.mean(r_want * r_want, axis=-1, keepdims=True)
    xn = (r_want * jax.lax.rsqrt(var + eps)
          * wn.astype(jnp.float32)).astype(jnp.bfloat16)
    want = np.asarray(qf.quant_matmul_ref(xn, qw), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 2e-2
    np.testing.assert_allclose(np.asarray(r, np.float32),
                               np.asarray(r_want.astype(jnp.bfloat16),
                                          np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("t", [1, 5])
@pytest.mark.parametrize("d,f", [(512, 768)])
def test_fused_mlp_norm_matches_composed_path(t, d, f):
    """The norm-prologue variant: (y, r) must equal residual-add +
    rms_norm + the fused MLP chain (interpret mode on CPU)."""
    import jax
    from vllm_quick_tpu.ops.quant_matmul import (fused_mlp_norm,
                                                 mlp_fusable)

    rng = np.random.default_rng(3 * d + f + t)
    eps = 1e-6
    wg = rng.standard_normal((d, f)).astype(np.float32) * 0.1
    wu = rng.standard_normal((d, f)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((f, d)).astype(np.float32) * 0.1
    qw13 = qf.quantize_reference(np.concatenate([wg, wu], axis=1))
    qw2 = qf.quantize_reference(w2)
    assert mlp_fusable(qw13, qw2)

    h_in = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    wn = jnp.asarray(1.0 + 0.1 * rng.standard_normal((d,)), jnp.bfloat16)
    y, r = fused_mlp_norm(h_in, res, wn, qw13, qw2, eps=eps,
                          interpret=True)

    r_want = (h_in.astype(jnp.float32) + res.astype(jnp.float32))
    var = jnp.mean(r_want * r_want, axis=-1, keepdims=True)
    xn = (r_want * jax.lax.rsqrt(var + eps)
          * wn.astype(jnp.float32)).astype(jnp.bfloat16)
    gu = qf.quant_matmul_ref(xn, qw13)
    g, u = jnp.split(gu, 2, axis=-1)
    hh = (jax.nn.silu(g.astype(jnp.float32))
          * u.astype(jnp.float32)).astype(jnp.bfloat16)
    want = np.asarray(qf.quant_matmul_ref(hh, qw2), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 2e-2
    np.testing.assert_allclose(np.asarray(r, np.float32),
                               np.asarray(r_want.astype(jnp.bfloat16),
                                          np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("t,ko,d,f", [(1, 256, 256, 512),
                                      (8, 512, 256, 256),
                                      (3, 256, 512, 768)])
def test_fused_o_mlp_norm_matches_composed_path(t, ko, d, f):
    """The whole-layer-below-attention kernel: (y, r) must equal
    o-proj + residual-add + rms_norm + the fused MLP chain."""
    import jax
    from vllm_quick_tpu.ops.quant_matmul import (fused_o_mlp_norm,
                                                 o_mlp_fusable)

    rng = np.random.default_rng(ko + 3 * d + f + t)
    eps = 1e-6
    wo = rng.standard_normal((ko, d)).astype(np.float32) * 0.1
    wg = rng.standard_normal((d, f)).astype(np.float32) * 0.1
    wu = rng.standard_normal((d, f)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((f, d)).astype(np.float32) * 0.1
    qwo = qf.quantize_reference(wo)
    qw13 = qf.quantize_reference(np.concatenate([wg, wu], axis=1))
    qw2 = qf.quantize_reference(w2)
    assert o_mlp_fusable(qwo, qw13, qw2)

    attn = jnp.asarray(rng.standard_normal((t, ko)) * 0.5, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    wn = jnp.asarray(1.0 + 0.1 * rng.standard_normal((d,)), jnp.bfloat16)
    y, r = fused_o_mlp_norm(attn, res, wn, qwo, qw13, qw2, eps=eps,
                            interpret=True)
    assert y.shape == (t, d) and r.shape == (t, d)

    o = qf.quant_matmul_ref(attn, qwo)
    r_want = (o.astype(jnp.float32) + res.astype(jnp.float32))
    var = jnp.mean(r_want * r_want, axis=-1, keepdims=True)
    xn = (r_want * jax.lax.rsqrt(var + eps)
          * wn.astype(jnp.float32)).astype(jnp.bfloat16)
    gu = qf.quant_matmul_ref(xn, qw13)
    g, u = jnp.split(gu, 2, axis=-1)
    hh = (jax.nn.silu(g.astype(jnp.float32))
          * u.astype(jnp.float32)).astype(jnp.bfloat16)
    want = np.asarray(qf.quant_matmul_ref(hh, qw2), np.float32)
    scale = np.abs(want).max() + 1e-6
    assert np.abs(np.asarray(y, np.float32) - want).max() / scale < 3e-2
    r_scale = np.abs(np.asarray(r_want)).max() + 1e-6
    assert (np.abs(np.asarray(r, np.float32) - np.asarray(r_want))
            .max() / r_scale < 2e-2)
