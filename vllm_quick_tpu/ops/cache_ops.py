"""Paged KV-cache device ops.

TPU-native replacements for the reference's CUDA cache kernels
(csrc/cache_kernels.cu): writes are XLA scatters into donated cache
arrays (in-place under jit), copies/swaps are batched gathers +
scatters. The CUDA ``x``-packed key layout (cache_engine.py:57-65) is
replaced by a *fused block-major* TPU layout:

    kv_cache: [num_blocks, 2, num_kv_heads, block_size, head_dim]

with K at index 0 and V at index 1 of axis 1. Fusing K and V into one
array halves the number of scattered block DMAs in the decode kernel —
the dominant cost at small batch (per-DMA issue ~7 us on this part) —
and halves the scatter count on writes. Each (block, kv) panel is a
contiguous [H, S, D] tile; tensor parallelism shards axis 2.

Slot convention: flat slot = block_number * block_size + offset.
Physical block 0 is reserved as the *null block*: padding tokens write
there (never read), which keeps every scatter in-bounds with static
shapes — the TPU analogue of the reference's -1 pad slot
(model_runner.py slot_mapping padding).
"""
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

NULL_BLOCK = 0  # reserved garbage block; pad tokens use slot 0.


def reshape_and_cache(
    key: jax.Array,            # [T, num_kv_heads, head_dim]
    value: jax.Array,          # [T, num_kv_heads, head_dim]
    kv_cache: jax.Array,       # [NB, 2, H, S, D]
    slot_mapping: jax.Array,   # [T] int32 flat slots (pad -> 0)
) -> jax.Array:
    """Scatter new K and V into the fused paged cache in one scatter;
    returns the updated cache (in place under jit with donation).

    Functional replacement of csrc/cache_kernels.cu:155-272.
    """
    s = kv_cache.shape[3]
    t, h, d = key.shape
    blk = slot_mapping // s
    off = slot_mapping % s
    # Per-token dynamic_update_slice, NOT an XLA scatter: a multi-index
    # scatter on a donated buffer copies the ENTIRE block pool first
    # (measured ~52 ms/step on a 8.6 GB pool — and a flat-view scatter
    # additionally relayouts the tiled 5D array). dus windows
    # [1, 1, H, 1, D] are rectangular, so XLA updates strictly in place.
    # Pad tokens carry slot 0 and land harmlessly in the null block.
    dtype = kv_cache.dtype
    # One [1, 2, H, 1, D] dus per token writes K and V together — the
    # fused cache layout puts them adjacent on axis 1, so pre-stacking
    # halves the dus count (~5.5 us fixed cost each).
    kv6 = jnp.stack([key.astype(dtype), value.astype(dtype)],
                    axis=1)[:, None, :, :, None, :]      # [T,1,2,H,1,D]

    def write(cache, i):
        return jax.lax.dynamic_update_slice(
            cache, kv6[i], (blk[i], 0, 0, off[i], 0))

    if t <= 64:
        # Decode-sized writes: unrolled dus chain (no loop overhead).
        for i in range(t):
            kv_cache = write(kv_cache, i)
        return kv_cache
    # Prefill-sized writes: bounded graph via an in-place carried loop,
    # 8 tokens per iteration to amortize loop overhead.
    unroll = 8
    tp = -(-t // unroll) * unroll
    if tp != t:
        # Repeat the last token's write (idempotent) to fill the chunk.
        pad = tp - t
        kv6 = jnp.concatenate([kv6, jnp.repeat(kv6[-1:], pad, 0)])
        blk = jnp.concatenate([blk, jnp.repeat(blk[-1:], pad)])
        off = jnp.concatenate([off, jnp.repeat(off[-1:], pad)])

    def chunk(c, cache):
        for u in range(unroll):
            cache = write(cache, c * unroll + u)
        return cache

    return jax.lax.fori_loop(0, tp // unroll,
                             lambda c, cache: chunk(c, cache), kv_cache)


def reshape_and_cache_prefill(
    key: jax.Array,            # [B, L, H, D] (L a multiple of S)
    value: jax.Array,          # [B, L, H, D]
    kv_cache: jax.Array,       # [NB, 2, H, S, D]
    slot_mapping: jax.Array,   # [B, L] int32 (pad -> 0)
) -> jax.Array:
    """Block-granular prefill KV write: one dynamic_update_slice per
    (sequence, block) instead of per token (~16x fewer updates).

    Relies on the engine invariant that prefill writes start block-
    aligned (fresh prompts start at offset 0; prefix caching truncates
    prefixes to block multiples, reference prefix.py:~95), so every
    S-token chunk lands wholly in one physical block. Chunks past the
    prompt length carry pad slot 0 and land in the null block; garbage
    written to the tail positions of the last real block is safe
    because those positions are only read after a later decode step
    overwrites them.
    """
    nb, _two, h, s, d = kv_cache.shape
    b, l = slot_mapping.shape
    dtype = kv_cache.dtype
    if l % s != 0:
        return reshape_and_cache(key.reshape(-1, h, d),
                                 value.reshape(-1, h, d), kv_cache,
                                 slot_mapping.reshape(-1))
    nchunk = b * (l // s)
    # [B, L//S, S, H, D] -> [B*L//S, H, S, D] chunk blocks.
    kc = key.astype(dtype).reshape(b, l // s, s, h, d).swapaxes(2, 3)
    vc = value.astype(dtype).reshape(b, l // s, s, h, d).swapaxes(2, 3)
    kc = kc.reshape(nchunk, 1, h, s, d)
    vc = vc.reshape(nchunk, 1, h, s, d)
    target = (slot_mapping[:, ::s] // s).reshape(nchunk)

    def write(i, cache):
        # [1, 1, h, s, d] chunk blocks (rank matches the cache).
        kb = jax.lax.dynamic_slice_in_dim(kc, i, 1, axis=0)
        vb = jax.lax.dynamic_slice_in_dim(vc, i, 1, axis=0)
        cache = jax.lax.dynamic_update_slice(
            cache, kb, (target[i], 0, 0, 0, 0))
        return jax.lax.dynamic_update_slice(
            cache, vb, (target[i], 1, 0, 0, 0))

    if nchunk <= 32:
        for i in range(nchunk):
            kv_cache = write(i, kv_cache)
        return kv_cache
    return jax.lax.fori_loop(0, nchunk, write, kv_cache)


def copy_blocks(
    caches: List[jax.Array],    # each [NB, ...]
    src_dst: jax.Array,         # [P, 2] int32 block-number pairs
) -> List[jax.Array]:
    """Batched copy-on-write block copies (csrc/cache_kernels.cu:66-153).

    ``src_dst`` must be padded to a fixed length with [0, 0] pairs
    (copying the null block onto itself is a no-op by construction).
    """
    if not len(caches):
        return caches
    src = src_dst[:, 0]
    dst = src_dst[:, 1]
    p = src_dst.shape[0]
    out = []
    for cache in caches:
        # Per-pair dynamic slice/update (in place under donation): a
        # multi-index scatter would copy the whole pool (see
        # reshape_and_cache). The dus chain also gives the correct
        # read-after-write ordering for chained copies.
        def body(i, c):
            blk = jax.lax.dynamic_slice_in_dim(c, src[i], 1, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(c, blk, dst[i],
                                                       axis=0)
        if p <= 16:
            for i in range(p):
                cache = body(i, cache)
        else:
            cache = jax.lax.fori_loop(0, p, body, cache)
        out.append(cache)
    return out


def swap_blocks(
    src_cache: jax.Array,
    dst_cache: jax.Array,
    src_to_dst: Dict[int, int],
) -> jax.Array:
    """Host<->device block swap (csrc/cache_kernels.cu:21-64 analogue).

    Used by the cache engine for preemption-by-swap; a gather on the
    source device, transfer, scatter on the destination. Rare path —
    clarity over speed.
    """
    if not src_to_dst:
        return dst_cache
    src_idx = jnp.asarray(list(src_to_dst.keys()), dtype=jnp.int32)
    blocks = src_cache[src_idx]
    blocks = jax.device_put(blocks, list(dst_cache.devices())[0])
    # Per-block in-place insert; a multi-index scatter would copy the
    # whole destination pool (see reshape_and_cache).
    for i, dst in enumerate(src_to_dst.values()):
        dst_cache = jax.lax.dynamic_update_slice_in_dim(
            dst_cache, blocks[i:i + 1], dst, axis=0)
    return dst_cache
