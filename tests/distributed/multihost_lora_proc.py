"""Subprocess body for the 2-process multihost multi-LoRA test.

Rank 0 (driver) serves prompt + decode steps WITH an active LoRA
adapter; rank 1 mirrors them via Worker.run_follower_loop, loading the
adapter from its own filesystem through the per-step payload's
``lora_sync`` slot directives. The adapter targets v_proj, so if the
follower's stacks stayed zeroed (the round-3 gap, the old
NotImplementedError at engine init) the KV pools would diverge — the
final cross-process KV checksum comparison proves they don't.

Usage: python multihost_lora_proc.py <rank> <port> <model_dir> <adapter>
"""
import os
import sys

os.environ.pop("XLA_FLAGS", None)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main(rank: int, port: int, model_dir: str, adapter_dir: str) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        coordinator_bind_address=f"0.0.0.0:{port}",
        num_processes=2, process_id=rank)

    import numpy as np

    from vllm_quick_tpu.config import (CacheConfig, DeviceConfig,
                                       LoRAConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
    from vllm_quick_tpu.lora.request import LoRARequest
    from vllm_quick_tpu.sampling_params import SamplingParams
    from vllm_quick_tpu.sequence import SequenceData, SequenceGroupMetadata
    from vllm_quick_tpu.worker.worker import Worker

    cache_config = CacheConfig(16, 0.9, 1, "auto")
    cache_config.num_gpu_blocks = 16
    cache_config.num_cpu_blocks = 8
    worker = Worker(
        ModelConfig(model=model_dir, dtype="float32", seed=0,
                    max_model_len=128),
        ParallelConfig(1, 1), SchedulerConfig(2048, 16, 128, 128),
        DeviceConfig(), cache_config,
        lora_config=LoRAConfig(max_lora_rank=8, max_loras=2))
    worker.load_model()
    worker.init_cache_engine(cache_config)

    lora_req = LoRARequest("a1", 1, adapter_dir)
    if rank == 0:
        prompt_meta = SequenceGroupMetadata(
            request_id="0", is_prompt=True,
            seq_data={0: SequenceData([1, 5, 9, 2])},
            sampling_params=SamplingParams(temperature=0.0),
            block_tables={0: [1]}, lora_request=lora_req)
        out = worker.execute_model([prompt_meta], {}, {}, {})
        assert out is not None and out[0].samples

        decode_meta = SequenceGroupMetadata(
            request_id="0", is_prompt=False,
            seq_data={0: SequenceData([1, 5, 9, 2], [3])},
            sampling_params=SamplingParams(temperature=0.0),
            block_tables={0: [1]}, lora_request=lora_req)
        worker.execute_model([decode_meta], {}, {}, {})
        # One more step WITHOUT the adapter: slot stays loaded but the
        # batch's lora_indices row is -1 — both sides must agree.
        base_meta = SequenceGroupMetadata(
            request_id="1", is_prompt=True,
            seq_data={1: SequenceData([2, 7, 7])},
            sampling_params=SamplingParams(temperature=0.0),
            block_tables={1: [2]})
        worker.execute_model([base_meta], {}, {}, {})
        worker.shutdown_followers()
    else:
        worker.run_follower_loop()

    # The follower must actually have loaded the adapter.
    assert worker.model_runner.lora_manager.list_loras() == [1], (
        rank, worker.model_runner.lora_manager.list_loras())

    from jax.experimental import multihost_utils
    sums = np.asarray([
        float(np.abs(np.asarray(c, dtype=np.float64)).sum())
        for c in worker.cache_engine.device_cache
    ])
    both = multihost_utils.process_allgather(sums)
    assert both.shape[0] == 2
    assert np.allclose(both[0], both[1], rtol=1e-6), both
    assert sums.sum() > 0, "prompt step never wrote any KV"
    print(f"RANK{rank}_OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
