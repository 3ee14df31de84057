"""Paged-attention decode kernel microbenchmark (reference parity:
benchmarks/kernels/benchmark_paged_attention.py) + HBM roofline report.

Usage (real TPU):
    PYTHONPATH=/root/repo:/root/.axon_site \
        python benchmarks/kernels/benchmark_paged_attention.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import jax
import jax.numpy as jnp
import numpy as np


def bench_shape(batch, hq, hkv, head_dim, block_size, ctx_len, dtype,
                iters=32):
    from vllm_quick_tpu.ops.paged_attention import (paged_decode_attention,
                                                    use_pallas_attention)
    from vllm_quick_tpu.ops.attention import paged_decode_attention_ref

    rng = np.random.default_rng(0)
    blocks_per_seq = -(-ctx_len // block_size)
    num_blocks = 1 + batch * blocks_per_seq
    q = jnp.asarray(rng.standard_normal((batch, hq, head_dim)),
                    jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal(
        (num_blocks, 2, hkv, block_size, head_dim)) * 0.3, dtype)
    bt = np.zeros((batch, blocks_per_seq), np.int32)
    for i in range(batch):
        bt[i] = 1 + i * blocks_per_seq + np.arange(blocks_per_seq)
    bt = jnp.asarray(bt)
    ctx = jnp.full((batch,), ctx_len, jnp.int32)

    scale = head_dim**-0.5
    use_pallas = use_pallas_attention(head_dim, block_size, dtype)
    if use_pallas:
        fn = lambda q, kv: paged_decode_attention(q, kv, bt, ctx,
                                                  scale=scale)
        # one-shot correctness vs the jnp reference (host compare)
        got = np.asarray(fn(q, kv), np.float32)
        want = np.asarray(paged_decode_attention_ref(
            q, kv[:, 0], kv[:, 1], bt, ctx, scale=scale), np.float32)
        # bf16 tolerance, same as tests/kernels/test_paged_attention.py
        err = np.max(np.abs(got - want) / (3e-2 + 3e-2 * np.abs(want)))
        assert err < 1.0, f"pallas vs ref exceeded bf16 tolerance: {err}"
    else:
        fn = lambda q, kv: paged_decode_attention_ref(
            q, kv[:, 0], kv[:, 1], bt, ctx, scale=scale)
        err = 0.0
    from benchmarks.kernels.bench_util import device_time
    dt = device_time(fn, q, kv, iters=iters)

    kv_bytes = (2 * batch * blocks_per_seq * hkv * block_size * head_dim
                * jnp.dtype(dtype).itemsize)
    gbps = kv_bytes / dt / 1e9
    print(f"b={batch:<4} hq={hq:<3} hkv={hkv:<3} d={head_dim} "
          f"s={block_size} ctx={ctx_len:<6} {str(dtype):<14} "
          f"{dt * 1e6:8.1f} us   {gbps:7.1f} GB/s KV read   "
          f"maxrelerr={err:.2e}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=32)
    args = parser.parse_args()
    print(f"backend: {jax.default_backend()}")
    for dtype in (jnp.bfloat16, jnp.float8_e5m2):
        for batch in (1, 8, 64):
            for ctx in (512, 2048):
                bench_shape(batch, 32, 32, 128, 16, ctx, dtype,
                            iters=args.iters)


if __name__ == "__main__":
    main()
