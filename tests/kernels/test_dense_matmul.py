"""Streaming dense small-M matmul (ops/dense_matmul.py) vs jnp.dot.
Used for the decode-time lm_head (sampler.py:38-48 analogue)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_quick_tpu.ops.dense_matmul import dense_matmul_small_m


@pytest.mark.parametrize("m,k,n", [
    (1, 256, 512),       # decode matvec
    (8, 512, 384),       # n not a lane multiple -> padded
    (3, 300, 1000),      # everything ragged
    (64, 256, 256),      # kernel ceiling
])
def test_matches_jnp(rng, m, k, n):
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.bfloat16)
    got = np.asarray(dense_matmul_small_m(x, w, use_kernel=True,
                                          interpret=True), np.float32)
    want = np.asarray(jnp.dot(x, w, preferred_element_type=jnp.float32),
                      np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_leading_dims_and_fallback(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 128)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.1, jnp.bfloat16)
    got = np.asarray(dense_matmul_small_m(x, w, use_kernel=True,
                                          interpret=True), np.float32)
    want = np.asarray(jnp.einsum("blk,kn->bln", x, w), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # Above the token ceiling the wrapper must fall back to jnp.dot.
    xl = jnp.zeros((128, 128), jnp.bfloat16)
    out = dense_matmul_small_m(xl, w)
    assert out.shape == (128, 256)


@pytest.mark.parametrize("m,k,n", [
    (1, 256, 512),
    (3, 300, 1000),      # ragged -> padded weight + scales
])
def test_i8_head_matches_dequant(rng, m, k, n):
    """int8 lm_head: (x @ wi8) * s vs x @ (wi8 * s) — quantization is
    the only error source, and the test compares against the EXACT
    dequantized product, so tolerances stay tight."""
    from vllm_quick_tpu.ops.dense_matmul import (dense_matmul_small_m_i8,
                                                 quantize_cols_i8)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    wi8, s = quantize_cols_i8(w)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    got = np.asarray(dense_matmul_small_m_i8(x, wi8, s, use_kernel=True,
                                             interpret=True), np.float32)
    wd = np.asarray(wi8, np.float32) * np.asarray(s, np.float32)
    want = np.asarray(x, np.float32) @ wd
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_quantize_cols_i8_roundtrip(rng):
    from vllm_quick_tpu.ops.dense_matmul import quantize_cols_i8
    w = rng.standard_normal((64, 96)).astype(np.float32)
    wi8, s = quantize_cols_i8(w)
    assert wi8.dtype == jnp.int8 and s.shape == (1, 96)
    np.testing.assert_allclose(
        np.asarray(wi8, np.float32) * np.asarray(s), w,
        atol=np.abs(w).max() / 127 + 1e-6)
