"""Regression tests for bugs found during development (reference
parity: tests/test_regression.py pins past bugs the same way).

The big one: XLA lowers a multi-index scatter on a donated buffer to a
full copy of the buffer — on a serving-sized KV pool that was ~52 ms
per step and dominated batched decode. The cache mutation ops must
therefore lower to rectangular dynamic_update_slice chains only.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.ops.cache_ops import (copy_blocks, reshape_and_cache,
                                          reshape_and_cache_prefill,
                                          swap_blocks)


def _primitives(jaxpr):
    seen = set()

    def walk(jx):
        for eqn in jx.eqns:
            seen.add(eqn.primitive.name)
            for v in eqn.params.values():
                for sub in (v if isinstance(v, (list, tuple)) else (v,)):
                    if hasattr(sub, "eqns"):
                        walk(sub)
                    elif hasattr(sub, "jaxpr"):
                        walk(sub.jaxpr)
    walk(jaxpr)
    return seen


def test_cache_write_lowers_without_scatter():
    cache = jnp.zeros((8, 2, 4, 16, 64), jnp.float32)
    key = jnp.zeros((4, 4, 64), jnp.float32)
    slots = jnp.zeros((4,), jnp.int32)
    jaxpr = jax.make_jaxpr(reshape_and_cache)(key, key, cache, slots)
    prims = _primitives(jaxpr.jaxpr)
    assert "scatter" not in prims, prims
    assert not any(p.startswith("scatter") for p in prims), prims
    assert "dynamic_update_slice" in prims, prims


def test_prefill_cache_write_lowers_without_scatter():
    cache = jnp.zeros((8, 2, 4, 16, 64), jnp.float32)
    key = jnp.zeros((2, 32, 4, 64), jnp.float32)
    slots = jnp.zeros((2, 32), jnp.int32)
    jaxpr = jax.make_jaxpr(reshape_and_cache_prefill)(key, key, cache,
                                                      slots)
    prims = _primitives(jaxpr.jaxpr)
    assert not any(p.startswith("scatter") for p in prims), prims


def test_copy_blocks_lowers_without_scatter():
    cache = jnp.zeros((8, 2, 4, 16, 64), jnp.float32)
    pairs = jnp.zeros((4, 2), jnp.int32)
    jaxpr = jax.make_jaxpr(lambda c, p: copy_blocks([c], p))(cache, pairs)
    prims = _primitives(jaxpr.jaxpr)
    assert not any(p.startswith("scatter") for p in prims), prims


def test_swap_blocks_writes_in_place():
    src = jnp.arange(8 * 2 * 4 * 16 * 64, dtype=jnp.float32).reshape(
        8, 2, 4, 16, 64)
    dst = jnp.zeros((4, 2, 4, 16, 64), jnp.float32)
    out = swap_blocks(src, dst, {3: 1, 5: 2})
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(src[3]))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(src[5]))
    assert (np.asarray(out[0]) == 0).all()


def test_cache_write_pad_slots_only_touch_null_block():
    """Pad tokens carry slot 0 by convention; they must never corrupt a
    real block."""
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.standard_normal((4, 2, 2, 16, 32)),
                        jnp.float32)
    key = jnp.ones((3, 2, 32), jnp.float32)
    # One real token (block 2, offset 5) and two pad tokens (slot 0).
    slots = jnp.asarray([2 * 16 + 5, 0, 0], jnp.int32)
    out = reshape_and_cache(key, 2 * key, cache, slots)
    # Real write landed.
    np.testing.assert_array_equal(np.asarray(out[2, 0, :, 5]),
                                  np.ones((2, 32), np.float32))
    # Blocks 1 and 3 are untouched.
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(cache[1]))
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(cache[3]))


def test_cache_write_in_place_under_donation():
    """Donated-buffer cache writes must not allocate a second pool: the
    output buffer is literally the input buffer."""
    import pytest
    if jax.default_backend() not in ("cpu",):
        pytest.skip("unsafe_buffer_pointer unsupported on remote "
                    "backends; the no-scatter jaxpr tests cover TPU")
    cache = jnp.zeros((8, 2, 4, 16, 128), jnp.float32)
    key = jnp.ones((2, 4, 128), jnp.float32)
    slots = jnp.asarray([17, 33], jnp.int32)

    f = jax.jit(reshape_and_cache, donate_argnums=(2,))
    ptr_before = cache.unsafe_buffer_pointer()
    out = f(key, key, cache, slots)
    assert out.unsafe_buffer_pointer() == ptr_before
