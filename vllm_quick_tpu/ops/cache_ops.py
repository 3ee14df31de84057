"""Paged KV-cache device ops.

TPU-native replacements for the reference's CUDA cache kernels
(csrc/cache_kernels.cu): writes are XLA scatters into donated cache
arrays (in-place under jit), copies/swaps are batched gathers +
scatters. The CUDA ``x``-packed key layout (cache_engine.py:57-65) is
replaced by a *block-major* TPU layout:

    k_cache, v_cache: [num_blocks, num_kv_heads, block_size, head_dim]

chosen so the decode kernel fetches one whole block for all heads with
a single large DMA (the per-(head, block) 4KB DMAs of a head-major
layout are issue-rate-bound on TPU). Each (block, head) panel is a
lane-aligned [block_size, head_dim] tile; tensor parallelism shards
axis 1 over the mesh.

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
    k_cache: jax.Array,        # [NB, H, S, D]
    v_cache: jax.Array,        # [NB, H, S, D]
    slot_mapping: jax.Array,   # [T] int32 flat slots (pad -> 0)
) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V into the paged cache; returns updated caches.

    Functional replacement of csrc/cache_kernels.cu:155-272. Under jit
    with donated caches XLA performs the update in place.
    """
    nb, h, s, d = k_cache.shape
    t = key.shape[0]
    blk = slot_mapping // s
    off = slot_mapping % s
    # row in the [(NB*H*S), D] flat view, for every (token, head) pair
    rows = (blk[:, None] * h + jnp.arange(h)[None, :]) * s + off[:, None]
    rows = rows.reshape(-1)
    kf = k_cache.reshape(nb * h * s, d)
    vf = v_cache.reshape(nb * h * s, d)
    kf = kf.at[rows].set(key.reshape(t * h, d).astype(k_cache.dtype),
                         mode="drop")
    vf = vf.at[rows].set(value.reshape(t * h, d).astype(v_cache.dtype),
                         mode="drop")
    return kf.reshape(nb, h, s, d), vf.reshape(nb, h, s, d)


def copy_blocks(
    caches: List[jax.Array],    # each [NB, H, S, D]
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
