"""A/B the paged-attention KV fetch bandwidth for the fused
[NB, 2, H, S, D] cache layout (group fetches are STRIDED: each K-plane
window skips the interleaved V planes) against a split [2, NB, H, S, D]
layout (the same windows are fully contiguous).

Measures a 32-deep in-graph chain of minimal fetch+reduce kernels (per
the tunnel measurement discipline: single-op pallas probes are
meaningless) with fetch-based timing. If split-contiguous wins big,
the cache layout flips.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/kernels/probe_kv_layout.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, S, D = 32, 16, 128      # llama-7B: 32 kv heads, block 16, head 128
W = 4                      # blocks per fetch group
NGRP = 4                   # groups in flight
CTX = 512
NB = CTX // S              # 32 blocks resident
DEPTH = 32                 # chained "layers"


def _kernel_fused(kv_hbm, o_ref, k_buf, v_buf, k_sem, v_sem):
    """Current layout [NB, 2, H, S, D]: per group 2 strided copies."""
    ngroups = NB // W

    def start(g):
        slot = jax.lax.rem(g, NGRP)
        first = g * W
        pltpu.make_async_copy(kv_hbm.at[pl.ds(first, W), 0],
                              k_buf.at[slot], k_sem.at[slot]).start()
        pltpu.make_async_copy(kv_hbm.at[pl.ds(first, W), 1],
                              v_buf.at[slot], v_sem.at[slot]).start()

    for g0 in range(NGRP):
        start(g0)

    def body(g, acc):
        slot = jax.lax.rem(g, NGRP)
        pltpu.make_async_copy(k_buf.at[slot], k_buf.at[slot],
                              k_sem.at[slot]).wait()
        pltpu.make_async_copy(v_buf.at[slot], v_buf.at[slot],
                              v_sem.at[slot]).wait()
        acc = (acc + k_buf[slot, 0, 0, 0].astype(jnp.float32)
               + v_buf[slot, 0, 0, 0].astype(jnp.float32))

        @pl.when(g + NGRP < ngroups)
        def _():
            start(g + NGRP)

        return acc

    acc = jax.lax.fori_loop(0, ngroups, body,
                            jnp.zeros((D,), jnp.float32))
    o_ref[0] = acc


def _kernel_split(kv_hbm, o_ref, k_buf, v_buf, k_sem, v_sem):
    """Split layout [2, NB, H, S, D]: the same 2 copies per group are
    fully contiguous slabs."""
    ngroups = NB // W

    def start(g):
        slot = jax.lax.rem(g, NGRP)
        first = g * W
        pltpu.make_async_copy(kv_hbm.at[0, pl.ds(first, W)],
                              k_buf.at[slot], k_sem.at[slot]).start()
        pltpu.make_async_copy(kv_hbm.at[1, pl.ds(first, W)],
                              v_buf.at[slot], v_sem.at[slot]).start()

    for g0 in range(NGRP):
        start(g0)

    def body(g, acc):
        slot = jax.lax.rem(g, NGRP)
        pltpu.make_async_copy(k_buf.at[slot], k_buf.at[slot],
                              k_sem.at[slot]).wait()
        pltpu.make_async_copy(v_buf.at[slot], v_buf.at[slot],
                              v_sem.at[slot]).wait()
        acc = (acc + k_buf[slot, 0, 0, 0].astype(jnp.float32)
               + v_buf[slot, 0, 0, 0].astype(jnp.float32))

        @pl.when(g + NGRP < ngroups)
        def _():
            start(g + NGRP)

        return acc

    acc = jax.lax.fori_loop(0, ngroups, body,
                            jnp.zeros((D,), jnp.float32))
    o_ref[0] = acc


def _kernel_split_whole(kv_hbm, o_ref, k_buf, v_buf, k_sem, v_sem):
    """Split layout, ONE contiguous DMA per plane for the whole
    context (issue-count floor; viable for small ctx buckets)."""
    pltpu.make_async_copy(kv_hbm.at[0], k_buf, k_sem).start()
    pltpu.make_async_copy(kv_hbm.at[1], v_buf, v_sem).start()
    pltpu.make_async_copy(k_buf, k_buf, k_sem).wait()
    pltpu.make_async_copy(v_buf, v_buf, v_sem).wait()
    o_ref[0] = (k_buf[0, 0, 0].astype(jnp.float32)
                + v_buf[0, 0, 0].astype(jnp.float32))


def _make_chain(kernel, pool_shape, whole=False):
    if whole:
        scratch = [pltpu.VMEM((NB, H, S, D), jnp.bfloat16),
                   pltpu.VMEM((NB, H, S, D), jnp.bfloat16),
                   pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA]
    else:
        scratch = [pltpu.VMEM((NGRP, W, H, S, D), jnp.bfloat16),
                   pltpu.VMEM((NGRP, W, H, S, D), jnp.bfloat16),
                   pltpu.SemaphoreType.DMA((NGRP,)),
                   pltpu.SemaphoreType.DMA((NGRP,))]
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, D), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, D), jnp.float32),
        scratch_shapes=scratch,
    )

    @jax.jit
    def chain(pool, seed):
        acc = seed
        for _ in range(DEPTH):
            # Data dependency: fold the previous result into one pool
            # element so the DMAs of step i+1 cannot start early.
            pool = jax.lax.dynamic_update_slice(
                pool, acc[0, :1].astype(pool.dtype).reshape(
                    (1,) * (pool.ndim - 1) + (1,)),
                (0,) * pool.ndim)
            acc = call(pool)
        return acc

    return chain


def _time(chain, pool, label):
    seed = jnp.zeros((1, D), jnp.float32)
    out = chain(pool, seed)
    np.asarray(out)
    t0 = time.perf_counter()
    np.asarray(out)
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = chain(pool, seed)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0 - rtt)
    nbytes = DEPTH * 2 * NB * H * S * D * 2
    gbs = nbytes / best / 1e9
    print(f"{label}: {best * 1e3:.3f} ms for {nbytes / 1e6:.0f} MB "
          f"-> {gbs:.0f} GB/s")
    return gbs


def main():
    rng = np.random.default_rng(0)
    fused = jnp.asarray(
        rng.standard_normal((NB, 2, H, S, D)), jnp.bfloat16)
    split = jnp.asarray(np.moveaxis(np.asarray(fused), 1, 0).copy(),
                        jnp.bfloat16)

    _time(_make_chain(_kernel_fused, fused.shape), fused,
          "fused [NB,2,...] strided groups ")
    _time(_make_chain(_kernel_split, split.shape), split,
          "split [2,NB,...] contig groups  ")
    _time(_make_chain(_kernel_split_whole, split.shape, whole=True),
          split, "split [2,NB,...] whole-plane DMA")


if __name__ == "__main__":
    main()
