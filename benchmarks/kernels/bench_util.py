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

    import numpy as np

    g = jax.jit(loop)
    # NOTE: on tunneled backends block_until_ready can return before the
    # device finishes; a host fetch (np.asarray) is the only true drain.
    np.asarray(g(args))
    # Per-call fetch round trip, measured on an already-computed value.
    r = g(args)
    np.asarray(r)
    t0 = time.perf_counter()
    np.asarray(r)
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3 if warmup else 1):
        t0 = time.perf_counter()
        np.asarray(g(args))
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    return max(best, 1e-9)
