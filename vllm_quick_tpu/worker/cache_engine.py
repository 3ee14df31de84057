"""Paged KV cache allocation + swap/copy execution.

Reference parity: vllm/worker/cache_engine.py:16-171 — allocates
per-layer K/V block arrays on the TPU and a host-side swap pool, and
executes the scheduler's swap/copy directives. The CUDA ``x``-packed key
layout is replaced by the block-major TPU layout (ops/cache_ops.py);
dedicated CUDA streams/events are unnecessary: XLA orders the scatter
ops within the step program.

Swap/copy execution discipline: the device pool is sized to most of
HBM, so these paths must update it strictly in place. Copies and
swap-ins run inside a *jitted function with the cache donated* — the
dynamic_update_slice chains then really are in-place; an eager
(un-donated) dus would allocate a fresh pool-sized buffer per pair.
The host pool is plain numpy (pinned host memory analogue): numpy
fancy-index assignment is in-place by construction and swap-in feeds
the gathered host blocks straight into the jitted device update as
numpy args (one transfer).
"""
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.config import CacheConfig, ModelConfig, ParallelConfig
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.utils import STR_DTYPE_TO_JNP

logger = init_logger(__name__)

# Fused per-layer cache array [NB, 2, H, S, D] (ops/cache_ops.py).
KVCache = jax.Array

# Swap/copy bursts are padded to these pair counts so each distinct
# burst size does not trigger a fresh XLA compile.
_PAIR_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


def _bucket_pairs(n: int) -> int:
    for b in _PAIR_BUCKETS:
        if n <= b:
            return b
    return -(-n // _PAIR_BUCKETS[-1]) * _PAIR_BUCKETS[-1]


@functools.partial(jax.jit, donate_argnums=0)
def _copy_blocks_jit(caches, src, dst):
    """In-place batched COW copies on the donated device pool.

    Pairs are padded with (0, 0): copying the null block onto itself is
    a no-op. The dus chain preserves read-after-write order for chained
    copies (csrc/cache_kernels.cu:66-153 analogue). Pipeline-parallel
    stacked pools [pp, NB, ...] copy on axis 1 — the same block ids
    apply to every stage (block tables are layer-agnostic).
    """
    p = src.shape[0]
    out = []
    for cache in caches:
        ax = 1 if cache.ndim == 6 else 0

        def body(i, c):
            blk = jax.lax.dynamic_slice_in_dim(c, src[i], 1, axis=ax)
            return jax.lax.dynamic_update_slice_in_dim(c, blk, dst[i],
                                                       axis=ax)
        if p <= 16:
            for i in range(p):
                cache = body(i, cache)
        else:
            cache = jax.lax.fori_loop(0, p, body, cache)
        out.append(cache)
    return out


@functools.partial(jax.jit, donate_argnums=0)
def _insert_blocks_jit(caches, blocks, dst):
    """Insert host-gathered blocks [P, 2, H, S, D] per layer (stacked
    [pp, P, ...] per stage-slot under pp) into the donated device pool
    at block indices ``dst`` (swap-in device half). Padding pairs carry
    dst=0 (null block)."""
    p = dst.shape[0]
    out = []
    for cache, blk in zip(caches, blocks):
        blk = blk.astype(cache.dtype)
        ax = 1 if cache.ndim == 6 else 0

        def body(i, c):
            one = jax.lax.dynamic_slice_in_dim(blk, i, 1, axis=ax)
            return jax.lax.dynamic_update_slice_in_dim(c, one, dst[i],
                                                       axis=ax)
        if p <= 16:
            for i in range(p):
                cache = body(i, cache)
        else:
            cache = jax.lax.fori_loop(0, p, body, cache)
        out.append(cache)
    return out


@jax.jit
def _gather_blocks_jit(caches, src):
    """Gather blocks [P, 2, H, S, D] per layer ([pp, P, ...] per
    stage-slot under pp) from the device pool (swap-out device half).
    A gather output is small; no donation needed — the pool itself is
    untouched."""
    return [jnp.take(cache, src, axis=1 if cache.ndim == 6 else 0)
            for cache in caches]


class CacheEngine:

    def __init__(
        self,
        cache_config: CacheConfig,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
        mesh=None,
    ) -> None:
        self.cache_config = cache_config
        self.model_config = model_config
        self.mesh = mesh

        self.head_size = model_config.get_head_size()
        self.num_layers = model_config.get_num_layers(parallel_config)
        # Per-chip KV heads (config.py:259-267 analogue); the allocated
        # global array carries all tp shards on its head axis.
        local_kv_heads = model_config.get_num_kv_heads(parallel_config)
        self.tp_size = parallel_config.tensor_parallel_size
        self.num_kv_heads = local_kv_heads * self.tp_size \
            if self.tp_size > 1 else local_kv_heads

        self.block_size = cache_config.block_size
        self.sp_size = getattr(parallel_config, "sequence_parallel_size",
                               1)
        # Under pp, get_num_layers already returns layers-per-stage
        # (config.py:167-169, reference semantics) — the stage-slot
        # count of the stacked pool lists.
        self.pp_size = getattr(parallel_config, "pipeline_parallel_size",
                               1)
        if self.sp_size > 1:
            # sp-sharded pool: local block 0 of EACH shard is that
            # shard's null/pad block (ids are shard-major; the block
            # manager's per-shard pools start at local 1), so the
            # array row count is exactly num_gpu_blocks.
            assert cache_config.num_gpu_blocks % self.sp_size == 0, (
                cache_config.num_gpu_blocks, self.sp_size)
            self.num_device_blocks = cache_config.num_gpu_blocks
        else:
            # +1: physical block 0 is the null/pad block
            # (ops/cache_ops.py).
            self.num_device_blocks = cache_config.num_gpu_blocks + 1
        self.num_cpu_blocks = cache_config.num_cpu_blocks

        if cache_config.cache_dtype == "auto":
            self.dtype = model_config.dtype
        else:
            self.dtype = STR_DTYPE_TO_JNP[cache_config.cache_dtype]

        self.device_cache = self._allocate_device(self.num_device_blocks)
        # Host swap pool: plain numpy — in-place writes by construction.
        # Under pp it mirrors the device structure (stage-slot stacked)
        # so swap code indexes both sides identically.
        if self.pp_size > 1:
            self.host_cache: List[np.ndarray] = [
                np.zeros((self.pp_size,)
                         + self._shape(self.num_cpu_blocks),
                         dtype=jnp.dtype(self.dtype))
                for _ in range(self.num_layers)
            ]
        else:
            self.host_cache = [
                np.zeros(self._shape(self.num_cpu_blocks),
                         dtype=jnp.dtype(self.dtype))
                for _ in range(self.num_layers)
            ]

    def _shape(self, num_blocks: int) -> Tuple[int, ...]:
        return (num_blocks, 2, self.num_kv_heads, self.block_size,
                self.head_size)

    def _allocate_device(self, num_blocks: int) -> List[KVCache]:
        shape = self._shape(num_blocks)
        if self.pp_size > 1:
            # Stage-slot stacked pools [pp, NB, 2, H, S, D] sharded
            # over the pp mesh axis (parallel/pipeline.py): stage r
            # holds the pool rows for its own layers.
            from jax.sharding import NamedSharding
            from vllm_quick_tpu.parallel.pipeline import pp_cache_pspec
            sharding = NamedSharding(self.mesh, pp_cache_pspec())
            return [jnp.zeros((self.pp_size,) + shape, dtype=self.dtype,
                              device=sharding)
                    for _ in range(self.num_layers)]
        if self.mesh is not None and (self.tp_size > 1
                                      or self.sp_size > 1):
            from jax.sharding import NamedSharding
            from vllm_quick_tpu.parallel.sharding import kv_cache_pspec
            sharding = NamedSharding(
                self.mesh,
                kv_cache_pspec(sp_axis="sp" if self.sp_size > 1
                               else None))
            make = lambda: jnp.zeros(shape, dtype=self.dtype,
                                     device=sharding)
        else:
            make = lambda: jnp.zeros(shape, dtype=self.dtype)
        return [make() for _ in range(self.num_layers)]

    @staticmethod
    def _pad_pairs(src_to_dst: Dict[int, int]
                   ) -> Tuple[np.ndarray, np.ndarray, int]:
        n = len(src_to_dst)
        p = _bucket_pairs(n)
        src = np.zeros(p, np.int32)
        dst = np.zeros(p, np.int32)
        src[:n] = list(src_to_dst.keys())
        dst[:n] = list(src_to_dst.values())
        return src, dst, n

    def swap_in(self, src_to_dst: Dict[int, int]) -> None:
        """Host→device: numpy-gather the host blocks, then one jitted
        donated insert (padding writes the null block)."""
        if not src_to_dst:
            return
        src, dst, _ = self._pad_pairs(src_to_dst)
        blocks = [layer[:, src] if layer.ndim == 6 else layer[src]
                  for layer in self.host_cache]
        self.device_cache = _insert_blocks_jit(self.device_cache, blocks,
                                               dst)

    def swap_out(self, src_to_dst: Dict[int, int]) -> None:
        """Device→host: one jitted gather + one fetch, then in-place
        numpy insertion into the host pool."""
        if not src_to_dst:
            return
        src, dst, n = self._pad_pairs(src_to_dst)
        gathered = jax.device_get(
            _gather_blocks_jit(self.device_cache, src))
        for layer, blocks in zip(self.host_cache, gathered):
            if layer.ndim == 6:
                layer[:, dst[:n]] = blocks[:, :n]
            else:
                layer[dst[:n]] = blocks[:n]

    def copy(self, src_to_dsts: Dict[int, List[int]]) -> None:
        pairs = []
        for src, dsts in src_to_dsts.items():
            for dst in dsts:
                pairs.append((src, dst))
        if not pairs:
            return
        p = _bucket_pairs(len(pairs))
        arr = np.zeros((p, 2), np.int32)
        arr[:len(pairs)] = pairs
        self.device_cache = _copy_blocks_jit(self.device_cache, arr[:, 0],
                                             arr[:, 1])

    @staticmethod
    def get_cache_block_size(
        block_size: int,
        cache_dtype: str,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
    ) -> int:
        """Bytes per (K+V) block across all layers (reference:
        cache_engine.py:148-167), accounting for XLA's physical (8, 128)
        tile padding of the trailing [block, head_dim] dims — a
        head_dim < 128 or block_size < 8 occupies the full tile in HBM."""
        head_size = -(-model_config.get_head_size() // 128) * 128
        num_heads = model_config.get_num_kv_heads(parallel_config)
        num_layers = model_config.get_num_layers(parallel_config)
        padded_block = -(-block_size // 8) * 8
        if cache_dtype == "auto":
            cache_dtype = model_config.dtype
        dtype = STR_DTYPE_TO_JNP.get(cache_dtype, cache_dtype)
        itemsize = jnp.dtype(dtype).itemsize
        per_token = num_heads * head_size * itemsize
        return 2 * num_layers * padded_block * per_token
