"""Microbenchmark: fused INT4 dequant+matmul roofline on real TPU.

Analogue of the reference's kernel microbench
(benchmarks/kernels/benchmark_paged_attention.py). Reports achieved
bytes/s vs the v5e HBM roofline (~819 GB/s).
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.ops import quant_formats as qf
from vllm_quick_tpu.ops.quant_matmul import quant_matmul

# Llama-2-7B layer shapes (K, N): qkv, o, gate+up fused, down
LLAMA7B_SHAPES = [(4096, 4096 + 2 * 4096), (4096, 4096), (4096, 2 * 11008),
                  (11008, 4096)]


def bench_one(m, k, n, fmt, iters=100):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((k, n)) * 0.05).astype(np.float32)
    qw = qf.quantize_reference(w, group_size=128, fmt=fmt)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)

    f = jax.jit(lambda x: quant_matmul(x, qw, use_kernel=True,
                                       interpret=False))
    y = f(x)
    y.block_until_ready()
    # correctness spot check
    ref = qf.quant_matmul_ref(x, qw)
    err = np.abs(np.asarray(y, np.float32) - np.asarray(ref, np.float32))
    rel = err.max() / (np.abs(np.asarray(ref, np.float32)).max() + 1e-6)

    # Device-side timing loop: iterate inside one jit call so tunnel/RPC
    # dispatch overhead is excluded. The carry feeds back into x with a
    # not-provably-zero term so XLA cannot CSE/hoist the kernel call.
    def loop(x):
        def body(carry, _):
            xx = x + carry * 0.0
            y = quant_matmul(xx, qw, use_kernel=True, interpret=False)
            return y[0, 0].astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return out

    g = jax.jit(loop)
    g(x).block_until_ready()
    t0 = time.perf_counter()
    g(x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    kp, np_ = qw.padded_in, qw.padded_out
    wbytes = kp * np_ // 2 + 2 * (kp // 128) * np_ * 2
    gbps = wbytes / dt / 1e9
    print(f"fmt={fmt:7s} M={m:3d} K={k:6d} N={n:6d} "
          f"t={dt*1e6:8.1f}us  weights+meta={wbytes/1e6:7.2f}MB  "
          f"{gbps:7.1f} GB/s  maxrelerr={rel:.4f}")
    return dt, wbytes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fmt", default="both", choices=["i8pair", "u4", "both"])
    p.add_argument("--m", type=int, default=1)
    args = p.parse_args()
    fmts = ["i8pair", "u4"] if args.fmt == "both" else [args.fmt]
    print("devices:", jax.devices())
    for fmt in fmts:
        total_t = total_b = 0.0
        for (k, n) in LLAMA7B_SHAPES:
            dt, b = bench_one(args.m, k, n, fmt)
            total_t += dt
            total_b += b
        # 32 layers of these shapes ~= full 7B decode step weight traffic
        print(f"  -> per-layer-set {total_t*1e6:.1f}us, agg "
              f"{total_b/total_t/1e9:.1f} GB/s; implied 7B decode "
              f"{1.0/(32*total_t):.1f} tok/s (weights only)\n")


if __name__ == "__main__":
    main()
