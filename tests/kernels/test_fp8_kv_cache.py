"""FP8-E5M2 KV cache (reference parity:
csrc/quantization/fp8_e5m2_kvcache + vllm/config.py:311-329): cache
write converts to fp8, attention converts back on load; accuracy stays
within fp8 quantization error.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.ops.attention import paged_decode_attention_ref
from vllm_quick_tpu.ops.cache_ops import reshape_and_cache


def test_reshape_and_cache_fp8_roundtrip(rng):
    t, h, d, nb, s = 6, 2, 32, 4, 16
    key = rng.standard_normal((t, h, d)).astype(np.float32)
    value = rng.standard_normal((t, h, d)).astype(np.float32)
    kv = jnp.zeros((nb, 2, h, s, d), jnp.float8_e5m2)
    slots = jnp.asarray(np.arange(t) + s, jnp.int32)  # block 1
    kv = reshape_and_cache(jnp.asarray(key), jnp.asarray(value), kv, slots)
    got = np.asarray(kv[1, 0, :, :t].astype(jnp.float32)).transpose(1, 0, 2)
    want = np.asarray(jnp.asarray(key).astype(jnp.float8_e5m2).astype(
        jnp.float32))
    np.testing.assert_array_equal(got, want)
    # fp8 e5m2 relative error is bounded by 2^-3.
    np.testing.assert_allclose(got, key, rtol=0.125, atol=0.06)


def test_decode_attention_fp8_close_to_fp32(rng):
    b, hq, hkv, d, nb, s = 2, 4, 2, 32, 8, 16
    ctx = 24
    q = rng.standard_normal((b, hq, d)).astype(np.float32) * 0.3
    kf = rng.standard_normal((nb, hkv, s, d)).astype(np.float32) * 0.3
    vf = rng.standard_normal((nb, hkv, s, d)).astype(np.float32) * 0.3
    bt = np.asarray([[1, 2], [3, 4]], np.int32)
    ctx_lens = np.asarray([ctx, ctx], np.int32)

    out32 = paged_decode_attention_ref(
        jnp.asarray(q), jnp.asarray(kf), jnp.asarray(vf),
        jnp.asarray(bt), jnp.asarray(ctx_lens), scale=d**-0.5)
    out8 = paged_decode_attention_ref(
        jnp.asarray(q), jnp.asarray(kf).astype(jnp.float8_e5m2),
        jnp.asarray(vf).astype(jnp.float8_e5m2),
        jnp.asarray(bt), jnp.asarray(ctx_lens), scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out32),
                               rtol=0.2, atol=0.05)


def test_engine_fp8_kv_generates():
    """End-to-end: fp8 KV engine produces the same greedy tokens as
    fp32 on a tiny model for short continuations (fp8 noise rarely
    flips tiny-model argmax within a few steps; we only require a valid
    non-empty generation and matching first token)."""
    from vllm_quick_tpu import LLM, SamplingParams
    d = make_tiny_llama_dir()
    params = SamplingParams(temperature=0.0, max_tokens=4)

    llm8 = LLM(model=d, dtype="float32", kv_cache_dtype="fp8_e5m2",
               max_model_len=256, disable_log_stats=True)
    out8 = llm8.generate(["hello world"], params)
    assert len(out8[0].outputs[0].token_ids) == 4

    llm32 = LLM(model=d, dtype="float32", max_model_len=256,
                disable_log_stats=True)
    out32 = llm32.generate(["hello world"], params)
    assert (out8[0].outputs[0].token_ids[0]
            == out32[0].outputs[0].token_ids[0])
