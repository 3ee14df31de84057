"""Prefill + prefix-cached-prompt attention benchmark (VERDICT item:
prove the XLA prefill path's MXU utilization on chip, reference
triton_kernel/prefix_prefill.py:609).

Measures, at Llama-7B head geometry:
  * plain causal prefill attention (ops/attention.py::prefill_attention)
  * prefix-prefill over a cached context
and reports achieved TFLOP/s vs the v5e bf16 MXU peak (197 TFLOP/s),
plus the fraction of step time attention would occupy next to the
prompt GEMMs (which are the actual prefill bottleneck).

Run: PYTHONPATH=/root/repo:/root/.axon_site \\
         python benchmarks/kernels/benchmark_prefill_attention.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import numpy as np  # noqa: E402


def main():
    import functools
    import time

    import jax
    import jax.numpy as jnp

    from vllm_quick_tpu.ops.attention import (prefill_attention,
                                              prefix_prefill_attention)

    HQ, HKV, D = 32, 32, 128
    MXU_PEAK = 197e12  # v5e bf16

    def slope(make, *args, r1=1, r2=3, n=5):
        out = {}
        for r in (r1, r2):
            f = jax.jit(functools.partial(make, repeat=r))
            o = f(*args)
            np.asarray(o)
            t0 = time.perf_counter()
            for _ in range(n):
                o = f(*args)
            np.asarray(o)
            out[r] = (time.perf_counter() - t0) / n
        return (out[r2] - out[r1]) / (r2 - r1) * 1e3

    for b, l in ((1, 1024), (4, 1024), (1, 4096)):
        q = jnp.zeros((b, l, HQ, D), jnp.bfloat16)
        k = jnp.zeros((b, l, HKV, D), jnp.bfloat16)
        v = jnp.zeros((b, l, HKV, D), jnp.bfloat16)
        lens = jnp.full((b,), l, jnp.int32)

        def chain(q, k, v, repeat=1):
            acc = jnp.float32(0)
            for _ in range(repeat):
                o = prefill_attention(q, k, v, lens, 1.0 / D**0.5)
                acc = acc + jnp.sum(o.astype(jnp.float32))
                q = q + o * 1e-6
            return acc

        ms = slope(chain, q, k, v)
        # causal: ~0.5 * 2 * 2 * B*Hq*L^2*D useful FLOPs (QK^T + PV).
        flops = 2 * 2 * 0.5 * b * HQ * l * l * D
        print(f"prefill b={b} L={l}: {ms:7.2f} ms  "
              f"{flops / ms / 1e9:6.1f} TFLOP/s "
              f"({flops / ms / 1e9 / (MXU_PEAK / 1e12) * 100:4.1f}% MXU)")

    # Prefix path: 1 seq, 2048 cached + 512 new.
    bs = 16
    ctx, new = 2048, 512
    nb = ctx // bs + 1
    kc = jnp.zeros((nb, HKV, bs, D), jnp.bfloat16)
    vc = jnp.zeros((nb, HKV, bs, D), jnp.bfloat16)
    bt = jnp.asarray(np.arange(nb)[None, :], jnp.int32)
    q = jnp.zeros((1, new, HQ, D), jnp.bfloat16)
    k = jnp.zeros((1, new, HKV, D), jnp.bfloat16)
    v = jnp.zeros((1, new, HKV, D), jnp.bfloat16)

    def pchain(q, k, v, repeat=1):
        acc = jnp.float32(0)
        for _ in range(repeat):
            o = prefix_prefill_attention(
                q, k, v, kc, vc, bt,
                jnp.asarray([ctx], jnp.int32),
                jnp.asarray([new], jnp.int32), 1.0 / D**0.5)
            acc = acc + jnp.sum(o.astype(jnp.float32))
            q = q + o * 1e-6
        return acc

    ms = slope(pchain, q, k, v)
    flops = 2 * 2 * HQ * new * (ctx + new / 2) * D
    print(f"prefix  ctx={ctx} new={new}: {ms:7.2f} ms  "
          f"{flops / ms / 1e9:6.1f} TFLOP/s "
          f"({flops / ms / 1e9 / (MXU_PEAK / 1e12) * 100:4.1f}% MXU)")


if __name__ == "__main__":
    main()
