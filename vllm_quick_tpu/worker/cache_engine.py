"""Paged KV cache allocation + swap/copy execution.

Reference parity: vllm/worker/cache_engine.py:16-171 — allocates
per-layer K/V block arrays on the TPU and pinned-host swap arrays, and
executes the scheduler's swap/copy directives. The CUDA ``x``-packed key
layout is replaced by the block-major TPU layout (ops/cache_ops.py);
dedicated CUDA streams/events are unnecessary: XLA orders the scatter
ops within the step program, and host swaps are explicit device_put
transfers.
"""
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.config import CacheConfig, ModelConfig, ParallelConfig
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.ops.cache_ops import copy_blocks, swap_blocks
from vllm_quick_tpu.utils import STR_DTYPE_TO_JNP

logger = init_logger(__name__)

# Fused per-layer cache array [NB, 2, H, S, D] (ops/cache_ops.py).
KVCache = jax.Array


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
        # +1: physical block 0 is the null/pad block (ops/cache_ops.py).
        self.num_device_blocks = cache_config.num_gpu_blocks + 1
        self.num_cpu_blocks = cache_config.num_cpu_blocks

        if cache_config.cache_dtype == "auto":
            self.dtype = model_config.dtype
        else:
            self.dtype = STR_DTYPE_TO_JNP[cache_config.cache_dtype]

        self.device_cache = self._allocate(self.num_device_blocks,
                                           device=True)
        self.host_cache = self._allocate(self.num_cpu_blocks, device=False)

    def _shape(self, num_blocks: int) -> Tuple[int, ...]:
        return (num_blocks, 2, self.num_kv_heads, self.block_size,
                self.head_size)

    def _allocate(self, num_blocks: int, device: bool) -> List[KVCache]:
        shape = self._shape(num_blocks)
        caches: List[KVCache] = []
        if device and self.mesh is not None and self.tp_size > 1:
            from jax.sharding import NamedSharding
            from vllm_quick_tpu.parallel.sharding import kv_cache_pspec
            sharding = NamedSharding(self.mesh, kv_cache_pspec())
            make = lambda: jnp.zeros(shape, dtype=self.dtype,
                                     device=sharding)
        elif device:
            make = lambda: jnp.zeros(shape, dtype=self.dtype)
        else:
            cpu = jax.devices("cpu")[0] if _has_cpu_device() else None
            if cpu is None:
                make = lambda: jnp.zeros(shape, dtype=self.dtype)
            else:
                make = lambda: jax.device_put(
                    jnp.zeros(shape, dtype=self.dtype), cpu)
        for _ in range(self.num_layers):
            caches.append(make())
        return caches

    def swap_in(self, src_to_dst: Dict[int, int]) -> None:
        for i in range(self.num_layers):
            self.device_cache[i] = swap_blocks(
                self.host_cache[i], self.device_cache[i], src_to_dst)

    def swap_out(self, src_to_dst: Dict[int, int]) -> None:
        for i in range(self.num_layers):
            self.host_cache[i] = swap_blocks(
                self.device_cache[i], self.host_cache[i], src_to_dst)

    def copy(self, src_to_dsts: Dict[int, List[int]]) -> None:
        pairs = []
        for src, dsts in src_to_dsts.items():
            for dst in dsts:
                pairs.append((src, dst))
        if not pairs:
            return
        src_dst = jnp.asarray(np.asarray(pairs, dtype=np.int32))
        self.device_cache = copy_blocks(self.device_cache, src_dst)

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
        head_size = max(model_config.get_head_size(), 128)
        num_heads = model_config.get_num_kv_heads(parallel_config)
        num_layers = model_config.get_num_layers(parallel_config)
        padded_block = -(-block_size // 8) * 8
        if cache_dtype == "auto":
            cache_dtype = model_config.dtype
        dtype = STR_DTYPE_TO_JNP.get(cache_dtype, cache_dtype)
        itemsize = jnp.dtype(dtype).itemsize
        per_token = num_heads * head_size * itemsize
        return 2 * num_layers * padded_block * per_token


def _has_cpu_device() -> bool:
    try:
        return bool(jax.devices("cpu"))
    except RuntimeError:
        return False
