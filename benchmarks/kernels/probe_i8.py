"""Probe Mosaic support for the int8 ops the W4A8 kernel needs:
  1. bitwise AND at native i8 width
  2. s8 x s8 MXU dot with int32 accumulation
  3. astype(int8 -> bfloat16)
Each probed in its own tiny pallas kernel; correctness vs numpy.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe(name, kernel, args, out_shape, expect):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape)
        out = np.asarray(jax.jit(fn)(*args))
        ok = np.array_equal(out.astype(np.float64), expect.astype(np.float64))
        print(f"{name}: COMPILES, correct={ok}")
        if not ok:
            print("  got", out.ravel()[:8], "want", expect.ravel()[:8])
    except Exception as e:  # noqa
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL — {type(e).__name__}: {msg}")


rng = np.random.default_rng(0)
p = rng.integers(-128, 128, size=(128, 256), dtype=np.int8)

# 1. i8 AND x2 (lo nibble + hi-nibble-as-16h-128)
def k_and(p_ref, lo_ref, hi_ref):
    lo_ref[:] = p_ref[:] & 0x0F
    hi_ref[:] = p_ref[:] & np.int8(-16)  # 0xF0 as signed int8

probe("i8_and", k_and, (p,),
      (jax.ShapeDtypeStruct(p.shape, jnp.int8),
       jax.ShapeDtypeStruct(p.shape, jnp.int8)),
      np.stack([p & 0x0F, p & np.int8(-16)]))


# 2. s8 x s8 dot -> int32
x8 = rng.integers(-127, 128, size=(8, 128), dtype=np.int8)
w8 = rng.integers(-127, 128, size=(128, 256), dtype=np.int8)

def k_dot(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.int32)

probe("s8xs8_dot_i32", k_dot, (x8, w8),
      jax.ShapeDtypeStruct((8, 256), jnp.int32),
      x8.astype(np.int32) @ w8.astype(np.int32))


# 3. i8 -> bf16 astype
def k_cast(p_ref, o_ref):
    o_ref[:] = p_ref[:].astype(jnp.bfloat16)

probe("i8_to_bf16", k_cast, (p,),
      jax.ShapeDtypeStruct(p.shape, jnp.bfloat16),
      p.astype(np.float32).astype(jnp.bfloat16).astype(np.float64))


# 4. combined: nibble AND at i8 + cast + bf16 dot (the W4A16 fast path)
xb = rng.standard_normal((8, 128)).astype(jnp.bfloat16)

def k_combined(x_ref, p_ref, o_ref):
    lo = (p_ref[:] & 0x0F).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(x_ref[:].astype(jnp.bfloat16), lo,
                       preferred_element_type=jnp.float32)

lo_f = (p[:128] & 0x0F).astype(np.float32)
x_f = np.asarray(xb).astype(np.float32)
probe("i8and_cast_bf16dot", k_combined, (np.asarray(xb), p[:128]),
      jax.ShapeDtypeStruct((8, 256), jnp.float32),
      (x_f @ lo_f))


# 5. s8 dot at M=8 with K=512 contraction (realistic group-dot shape)
x8b = rng.integers(-127, 128, size=(8, 512), dtype=np.int8)
w8b = rng.integers(-128, 128, size=(512, 512), dtype=np.int8)

def k_dot2(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

probe("s8_dot_512x512", k_dot2, (x8b, w8b),
      jax.ShapeDtypeStruct((8, 512), jnp.int32),
      x8b.astype(np.int32) @ w8b.astype(np.int32))

print("backend:", jax.default_backend())
