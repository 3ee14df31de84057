"""Per-host execution worker.

Reference parity: vllm/worker/worker.py:24-301. TPU-native deltas: one
worker drives all local chips via SPMD (no Ray per-GPU actors, no NCCL
init dance — SURVEY.md §7 design delta 1); memory profiling uses device
memory stats instead of torch.cuda.mem_get_info; CUDA-graph warmup is
replaced by jit bucket warmup.
"""
import gc
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_quick_tpu.config import (CacheConfig, DeviceConfig, LoRAConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.parallel.mesh import ParallelContext
from vllm_quick_tpu.sequence import SamplerOutput, SequenceGroupMetadata
from vllm_quick_tpu.worker.cache_engine import CacheEngine
from vllm_quick_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)

_GB = 1 << 30
# v5e = 16 GiB/chip; overridable for other generations / test rigs.
_DEFAULT_HBM_BYTES = int(
    float(os.environ.get("VLLM_TPU_HBM_GB", "16")) * _GB)


class Worker:

    def __init__(
        self,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        device_config: DeviceConfig,
        cache_config: CacheConfig,
        lora_config: Optional[LoRAConfig] = None,
        ctx: ParallelContext = ParallelContext(),
        mesh=None,
    ) -> None:
        self.model_config = model_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.device_config = device_config
        self.cache_config = cache_config
        self.lora_config = lora_config
        self.ctx = ctx
        self.mesh = mesh

        self.model_runner = ModelRunner(model_config, parallel_config,
                                        scheduler_config, cache_config,
                                        ctx=ctx, lora_config=lora_config,
                                        mesh=mesh)
        self.cache_engine: Optional[CacheEngine] = None

    def init_model(self) -> None:
        # SPMD: nothing to initialize per-process; the mesh is built by
        # the engine. Seed the host RNG for reproducible dummy weights.
        pass

    def load_model(self) -> None:
        self.model_runner.load_model()

    # -- memory profiling ----------------------------------------------------

    def _device_memory(self) -> Tuple[int, int]:
        """(used_bytes, limit_bytes) for device 0."""
        dev = jax.devices()[0]
        try:
            stats = dev.memory_stats()
            if stats and "bytes_limit" in stats:
                return (stats.get("bytes_in_use", 0), stats["bytes_limit"])
        except Exception:
            pass
        # Fallback: estimate model bytes from the params pytree.
        used = 0
        if self.model_runner.params is not None:
            for leaf in jax.tree_util.tree_leaves(self.model_runner.params):
                if hasattr(leaf, "nbytes"):
                    used += leaf.nbytes
        return used, _DEFAULT_HBM_BYTES

    def profile_num_available_blocks(
        self,
        block_size: int,
        gpu_memory_utilization: float,
        cpu_swap_space: int,
        cache_dtype: str,
    ) -> Tuple[int, int]:
        """HBM budget -> #device blocks; swap space -> #host blocks
        (reference: worker.py:104-147)."""
        used, limit = self._device_memory()
        cache_block_size = CacheEngine.get_cache_block_size(
            block_size, cache_dtype, self.model_config,
            self.parallel_config)
        # Activation/HLO-temp reserve: measured from the AOT-compiled
        # worst-case prefill step when the backend exposes
        # memory_analysis (single-chip), with a 15% + 256 MiB margin for
        # allocator slack and the sampler/output buffers; the 10%
        # constant only as fallback. Round 3's battery showed the
        # constant under-reserving by ~4 GB at 7B prefill shapes.
        from vllm_quick_tpu.utils import STR_DTYPE_TO_JNP
        dtype = (self.model_config.dtype if cache_dtype == "auto"
                 else STR_DTYPE_TO_JNP[cache_dtype])
        probe_blocks = 1 + max(
            len(bt) for m in self.model_runner._profile_metas()
            for bt in m.block_tables.values())
        shape = self.model_runner.model.kv_cache_shape(
            probe_blocks, block_size)
        temp = self.model_runner.measure_step_temp_bytes(
            self.model_config.get_num_layers(self.parallel_config),
            shape, dtype)
        if temp is not None:
            # 25% + 512 MiB margin: OTHER (batch, len) bucket combos of
            # the same token budget compile with different HLO-temp
            # liveness than the probed shape (observed spread after the
            # flash-at-all-lens fix is schedule noise, not the 2.2x
            # attention blow-up that OOM'd round 4's first sweep).
            reserve = int(temp * 1.25) + (512 << 20)
            logger.info(
                "Measured prefill HLO temp requirement: %.2f GiB "
                "-> reserving %.2f GiB", temp / _GB, reserve / _GB)
        else:
            reserve = int(0.10 * limit)
        budget = int(limit * gpu_memory_utilization) - used - reserve
        # get_cache_block_size is per-chip: under pp it counts only one
        # stage's layers (get_num_layers divides by pp).
        num_device_blocks = max(budget // cache_block_size, 0)
        # No point allocating more blocks than the scheduler can ever
        # map: max_num_seqs concurrent sequences at max_model_len.
        max_mappable = self.scheduler_config.max_num_seqs * (
            -(-self.model_config.max_model_len // block_size))
        num_device_blocks = min(num_device_blocks, max_mappable)
        # The host swap pool holds every stage's layers AND every tp
        # shard's KV heads (cache_engine num_kv_heads = local * tp), so
        # a host block costs pp * tp x the per-chip bytes.
        pp = getattr(self.parallel_config, "pipeline_parallel_size", 1)
        tp = self.parallel_config.tensor_parallel_size
        num_cpu_blocks = int(cpu_swap_space
                             // (cache_block_size * pp * max(tp, 1)))
        num_cpu_blocks = min(num_cpu_blocks, max_mappable)
        # Multihost: every host must size the identical pool
        # (reference llm_engine.py:334 min across workers).
        from vllm_quick_tpu.parallel.multihost import agree_num_blocks
        num_device_blocks = agree_num_blocks(int(num_device_blocks))
        logger.info(
            "Memory profile: used=%.2f GiB limit=%.2f GiB "
            "block=%d KiB -> %d device blocks, %d host blocks",
            used / _GB, limit / _GB, cache_block_size // 1024,
            num_device_blocks, num_cpu_blocks)
        gc.collect()
        return int(num_device_blocks), num_cpu_blocks

    def init_cache_engine(self, cache_config: CacheConfig) -> None:
        self.cache_config = cache_config
        self.cache_engine = CacheEngine(cache_config, self.model_config,
                                        self.parallel_config,
                                        mesh=self.mesh)

    def warm_up_model(self) -> None:
        if not self.model_config.enforce_eager:
            self.cache_engine.device_cache = self.model_runner.profile_run(
                self.cache_engine.device_cache)

    # -- execution -----------------------------------------------------------

    def _apply_cache_directives(self, payload: Dict) -> None:
        """Run the scheduler's swap/copy moves on this host's pools.
        Every host applies the identical directives so follower cache
        pools never diverge on preemption/COW (the reference ships these
        maps in its per-step broadcast, worker.py:191-226)."""
        if payload.get("swap_in"):
            self.cache_engine.swap_in(payload["swap_in"])
        if payload.get("swap_out"):
            self.cache_engine.swap_out(payload["swap_out"])
        if payload.get("copy"):
            self.cache_engine.copy(payload["copy"])

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
    ) -> Optional[SamplerOutput]:
        """Driver-side step: one broadcast carries the cache directives
        AND the prepared batch inputs; every host then applies the same
        moves and runs the same jitted step."""
        from vllm_quick_tpu.parallel.multihost import (broadcast_payload,
                                                       is_multihost)
        metas = seq_group_metadata_list
        if not is_multihost():
            # Single-host fast path: no broadcast, and the runner's
            # fused step+sampler dispatch (one device interaction per
            # step instead of two — each dispatch is a full host round
            # trip on remote-attached chips).
            self._apply_cache_directives({
                "swap_in": blocks_to_swap_in,
                "swap_out": blocks_to_swap_out,
                "copy": blocks_to_copy,
            })
            if not metas:
                return None
            out, self.cache_engine.device_cache = (
                self.model_runner.execute_model(
                    metas, self.cache_engine.device_cache))
            return out
        payload: Dict = {
            "swap_in": blocks_to_swap_in,
            "swap_out": blocks_to_swap_out,
            "copy": blocks_to_copy,
        }
        if metas:
            payload["step"] = self.model_runner.prepare_step_inputs(metas)
        broadcast_payload(payload)
        self._apply_cache_directives(payload)
        if not metas:
            return None
        logits, caches, extras = self.model_runner.run_prepared(
            payload["step"], self.cache_engine.device_cache)
        self.cache_engine.device_cache = caches
        # Only the driver samples (followers return before this point).
        return self.model_runner._sample(metas, logits, extras)

    def run_follower_loop(self) -> None:
        """Follower-host serving loop: receive the driver's per-step
        payload, mirror its cache moves, run the same jitted step. Exits
        on the shutdown sentinel. Reference: the Ray-RPC'd follower
        execute_model (vllm/worker/worker.py:191-226)."""
        from vllm_quick_tpu.parallel.multihost import (broadcast_payload,
                                                       is_driver)
        assert not is_driver(), "the driver host runs the engine loop"
        logger.info("Entering follower step loop")
        while True:
            payload = broadcast_payload(None)
            if payload.get("shutdown"):
                logger.info("Follower loop shut down by driver")
                return
            self._apply_cache_directives(payload)
            if "step" in payload:
                self.model_runner.apply_lora_sync(
                    payload["step"].get("lora_sync"))
                _, caches, _ = self.model_runner.run_prepared(
                    payload["step"], self.cache_engine.device_cache)
                self.cache_engine.device_cache = caches

    def shutdown_followers(self) -> None:
        from vllm_quick_tpu.parallel.multihost import (broadcast_payload,
                                                       is_driver,
                                                       is_multihost)
        if is_multihost() and is_driver():
            broadcast_payload({"shutdown": True})
