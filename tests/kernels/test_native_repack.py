"""Native (C++) repacker vs the numpy reference implementations."""
import numpy as np
import pytest

from vllm_quick_tpu import native


def _numpy_awq_unpack(x):
    order = (0, 2, 4, 6, 1, 3, 5, 7)
    x = x.view(np.uint32)
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    nib = ((x[..., None] >> shifts) & 0xF).astype(np.uint8)
    out = np.empty_like(nib)
    for pos, elem in enumerate(order):
        out[..., elem] = nib[..., pos]
    return out.reshape(*x.shape[:-1], x.shape[-1] * 8)


def _numpy_gptq_unpack0(x):
    x = x.view(np.uint32)
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    xm = np.moveaxis(x, 0, -1)
    nib = ((xm[..., None] >> shifts) & 0xF).astype(np.uint8)
    nib = nib.reshape(*xm.shape[:-1], xm.shape[-1] * 8)
    return np.moveaxis(nib, -1, 0)


def _numpy_pack_i8pair(q):
    k, n = q.shape
    qb = q.reshape(k // 256, 2, 128, n).astype(np.uint8)
    return (qb[:, 0] | (qb[:, 1] << 4)).reshape(k // 2, n).view(np.int8)


@pytest.fixture(scope="module")
def lib_available():
    if native._lib() is None:
        pytest.skip("no native toolchain")
    return True


def test_awq_unpack(lib_available, rng):
    x = rng.integers(0, 2**32, size=(64, 16), dtype=np.uint64
                     ).astype(np.uint32).view(np.int32)
    np.testing.assert_array_equal(native.awq_unpack(x),
                                  _numpy_awq_unpack(x))


def test_gptq_unpack_axis0(lib_available, rng):
    x = rng.integers(0, 2**32, size=(16, 96), dtype=np.uint64
                     ).astype(np.uint32).view(np.int32)
    np.testing.assert_array_equal(native.gptq_unpack_axis0(x),
                                  _numpy_gptq_unpack0(x))


def test_pack_i8pair(lib_available, rng):
    q = rng.integers(0, 16, size=(512, 64)).astype(np.uint8)
    np.testing.assert_array_equal(native.pack_i8pair(q),
                                  _numpy_pack_i8pair(q))
