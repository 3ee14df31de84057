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
    blk = slot_mapping // s
    off = slot_mapping % s
    # Scatter directly on the 5D array: flattening it first (reshape to
    # [NB*2*H*S, D]) makes XLA physically relayout the whole cache twice
    # per call (~70 us/layer measured) because the tiled 5D and 2D
    # layouts differ. Advanced indexing on (block, kv, offset) with the
    # head/dim axes as the update window lowers to a pure scatter.
    dtype = kv_cache.dtype
    kv_cache = kv_cache.at[blk, 0, :, off].set(key.astype(dtype),
                                               mode="drop")
    kv_cache = kv_cache.at[blk, 1, :, off].set(value.astype(dtype),
                                               mode="drop")
    return kv_cache


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
    out = []
    for cache in caches:
        out.append(cache.at[dst].set(cache[src], mode="drop"))
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
    dst_idx = jnp.asarray(list(src_to_dst.values()), dtype=jnp.int32)
    blocks = src_cache[src_idx]
    blocks = jax.device_put(blocks, list(dst_cache.devices())[0])
    return dst_cache.at[dst_idx].set(blocks)
