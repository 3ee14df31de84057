"""SqueezeLLM non-uniform 4-bit LUT quantization (reference:
csrc/quantization/squeezellm/quant_cuda_kernel.cu + squeezellm.py)."""
import numpy as np
import jax.numpy as jnp

from vllm_quick_tpu.ops.quant_formats import (dequantize, from_squeezellm,
                                              quantize_squeezellm_reference)
from vllm_quick_tpu.ops.quant_matmul import quant_matmul


def test_sqllm_roundtrip(rng):
    k, n = 64, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    qw = quantize_squeezellm_reference(w)
    deq = np.asarray(dequantize(qw, dtype=jnp.float32))
    # Every dequantized value must be one of that column's 16 levels,
    # and within the column's quantization step of the original.
    lut = np.asarray(qw.lut)
    for col in range(n):
        assert np.isin(deq[:, col], lut[col]).all()
    err = np.abs(deq - w).max()
    step = np.diff(np.sort(lut, axis=1), axis=1).max()
    assert err <= step


def test_sqllm_matmul_close(rng):
    k, n, m = 128, 64, 4
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    x = rng.standard_normal((m, k)).astype(np.float32)
    qw = quantize_squeezellm_reference(w)
    y = np.asarray(quant_matmul(jnp.asarray(x), qw,
                                out_dtype=jnp.float32))
    want = x @ np.asarray(dequantize(qw, dtype=jnp.float32))
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


def test_sqllm_checkpoint_ingest(rng):
    """Pack a fabricated SqueezeLLM qweight (int32 sequential nibbles)
    and verify from_squeezellm reproduces the LUT dequant."""
    k, n = 32, 16
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint8)
    lut = np.sort(rng.standard_normal((n, 16)).astype(np.float32), axis=1)
    packed = np.zeros((k // 8, n), np.uint32)
    for i in range(8):
        packed |= q[i::8].astype(np.uint32) << (4 * i)
    qw = from_squeezellm(packed.view(np.int32), lut)
    deq = np.asarray(dequantize(qw, dtype=jnp.float32))
    want = np.take_along_axis(
        np.broadcast_to(lut[None], (k, n, 16)), q[:, :, None].astype(int),
        axis=2)[..., 0]
    np.testing.assert_array_equal(deq, want)
