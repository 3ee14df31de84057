"""Device-side microbenchmark harness that survives both RPC dispatch
overhead and XLA's algebraic rewrites.

Timing loop runs on-device (one dispatch for N iterations). The carry is
threaded into the next iteration's input through ``maximum(x, tiny)``
— a non-distributive op, so the compiler cannot hoist linear kernels
(dot, sum) out of the loop, and cannot prune unread columns because the
whole output feeds the carry via a full reduction.
"""
import time

import jax
import jax.numpy as jnp


def device_time(f, *args, iters=50, warmup=True):
    """Mean seconds per call of f(*args) measured inside one jit."""

    def loop(args):
        def body(c, _):
            # guard: maximum(x, min(c, -1e30)) == x, but XLA can't prove it.
            guard = jnp.minimum(c, jnp.float32(-1e30))
            gargs = [
                (jnp.maximum(a, guard.astype(a.dtype))
                 if jnp.issubdtype(a.dtype, jnp.floating) else a)
                for a in args
            ]
            out = f(*gargs)
            leaves = jax.tree_util.tree_leaves(out)
            red = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return red, None

        out, _ = jax.lax.scan(body, jnp.float32(-3e38), None, length=iters)
        return out

    g = jax.jit(loop)
    g(args).block_until_ready()
    best = float("inf")
    for _ in range(3 if warmup else 1):
        t0 = time.perf_counter()
        g(args).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
