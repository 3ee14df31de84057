"""Probe: dense XLA matmul time vs M on the real chip, to locate the
skinny-M structural limit (MXU weight-load rate) and HBM roofline."""
import time

import jax
import jax.numpy as jnp
import numpy as np

K, N = 4096, 12288
ITERS = 100


def bench(f, x):
    def loop(x):
        def body(c, _):
            y = f(x + c * 0.0)
            return y.reshape(-1)[0].astype(x.dtype), None
        out, _ = jax.lax.scan(body, x.dtype.type(0.0), None, length=ITERS)
        return out
    g = jax.jit(loop)
    g(x).block_until_ready()
    t0 = time.perf_counter()
    g(x).block_until_ready()
    return (time.perf_counter() - t0) / ITERS


rng = np.random.default_rng(0)
wb = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.bfloat16)
w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), dtype=jnp.int8)

for m in (1, 8, 16, 32, 64, 128, 256):
    x = jnp.asarray(rng.standard_normal((m, K)), dtype=jnp.bfloat16)
    dt = bench(lambda x: jnp.dot(x, wb, preferred_element_type=jnp.float32),
               x)
    gbps = (K * N * 2) / dt / 1e9
    print(f"bf16 dense M={m:4d}: {dt*1e6:8.1f}us  {gbps:6.1f} GB/s "
          f"({K*N/dt/1e9:.0f} Gweights/s)")

for m in (1, 8, 32):
    x8 = jnp.asarray(rng.integers(-127, 127, (m, K)), dtype=jnp.int8)
    dt = bench(lambda x: jax.lax.dot_general(
        x, w8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32), x8)
    print(f"int8 dense M={m:4d}: {dt*1e6:8.1f}us  "
          f"({K*N/dt/1e9:.0f} Gweights/s, {K*N/dt/1e9:.0f} GB/s)")

# upper bound: pure HBM read bandwidth via a trivial reduction
big = jnp.asarray(rng.standard_normal((8192, 8192)), dtype=jnp.bfloat16)
dt = bench(lambda x: jnp.sum(x, axis=0, keepdims=True).astype(jnp.bfloat16),
           big)
print(f"HBM read (sum 128MB bf16): {dt*1e6:8.1f}us "
      f"{big.size*2/dt/1e9:6.1f} GB/s")
