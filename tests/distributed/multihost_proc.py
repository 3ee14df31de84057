"""Subprocess body for the 2-process multi-host wiring test.

Each process builds the same tiny-llama Worker on its own CPU device;
process 0 acts as the driver (prepares + broadcasts steps and cache
directives), process 1 runs the follower loop. At the end both compare
per-layer KV-pool checksums across processes — they must be identical,
proving follower caches track the driver through prompt, decode, COW
copy, swap-out and swap-in.

Usage: python multihost_proc.py <rank> <port> <model_dir> [world]
       [die_rank]

With world > 2 every rank >= 1 is a follower (the driver's payload
broadcast is world-size-agnostic). die_rank (optional) makes that
follower os._exit(1) after the first mirrored step — the driver must
then FAIL FAST (exit 7 after printing DRIVER_DETECTED_DEATH) instead
of hanging, per the engine's fail-fast contract (SURVEY §5 failure
detection; reference async_llm_engine.py:19-38).
"""
import os
import sys

os.environ.pop("XLA_FLAGS", None)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main(rank: int, port: int, model_dir: str, world: int = 2,
         die_rank: int = -1) -> None:
    import jax
    # The env var JAX_PLATFORMS=cpu is overridden by site customization
    # on TPU-attached hosts; the config update is authoritative.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        coordinator_bind_address=f"0.0.0.0:{port}",
        num_processes=world, process_id=rank)
    assert jax.process_count() == world, (
        f"rank {rank}: distributed init failed "
        f"(process_count={jax.process_count()})")

    import numpy as np

    from vllm_quick_tpu.config import (CacheConfig, DeviceConfig,
                                       ModelConfig, ParallelConfig,
                                       SchedulerConfig)
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
        DeviceConfig(), cache_config)
    worker.load_model()
    worker.init_cache_engine(cache_config)

    if rank == 0:
        prompt_meta = SequenceGroupMetadata(
            request_id="0", is_prompt=True,
            seq_data={0: SequenceData([1, 5, 9, 2])},
            sampling_params=SamplingParams(temperature=0.0),
            block_tables={0: [1]})
        out = worker.execute_model([prompt_meta], {}, {}, {})
        assert out is not None and out[0].samples

        decode_meta = SequenceGroupMetadata(
            request_id="0", is_prompt=False,
            seq_data={0: SequenceData([1, 5, 9, 2], [3])},
            sampling_params=SamplingParams(temperature=0.0),
            block_tables={0: [1]})
        if die_rank >= 0:
            # Fail-fast check: the doomed follower exits after the
            # prompt step; the next broadcast must raise HostDeadError
            # within the watchdog timeout, not hang.
            from vllm_quick_tpu.parallel.multihost import HostDeadError
            try:
                worker.execute_model([decode_meta], {}, {}, {})
            except HostDeadError:
                print("DRIVER_DETECTED_DEATH", flush=True)
                os._exit(7)
            print("DRIVER_MISSED_DEATH", flush=True)
            os._exit(3)
        worker.execute_model([decode_meta], {}, {}, {1: [5]})   # + COW
        worker.execute_model([], {}, {1: 0, 5: 1}, {})          # swap out
        worker.execute_model([], {0: 3}, {}, {})                # swap in
        worker.shutdown_followers()
    elif rank == die_rank:
        # Mirror exactly ONE payload (the prompt step), then die
        # abruptly — no shutdown handshake, no atexit.
        from vllm_quick_tpu.parallel.multihost import broadcast_payload
        payload = broadcast_payload(None)
        worker._apply_cache_directives(payload)
        if "step" in payload:
            _, caches, _ = worker.model_runner.run_prepared(
                payload["step"], worker.cache_engine.device_cache)
            worker.cache_engine.device_cache = caches
        print(f"RANK{rank}_DYING", flush=True)
        os._exit(1)
    else:
        worker.run_follower_loop()

    from jax.experimental import multihost_utils
    sums = np.asarray([
        float(np.abs(np.asarray(c, dtype=np.float64)).sum())
        for c in worker.cache_engine.device_cache
    ])
    host_sums = np.asarray([
        float(np.abs(np.asarray(c, dtype=np.float64)).sum())
        for c in worker.cache_engine.host_cache
    ])
    both = multihost_utils.process_allgather(
        np.concatenate([sums, host_sums]))
    assert both.shape[0] == world
    for r in range(1, world):
        assert np.allclose(both[0], both[r], rtol=1e-6), (r, both)
    assert sums.sum() > 0, "prompt step never wrote any KV"
    print(f"RANK{rank}_OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 2,
         int(sys.argv[5]) if len(sys.argv) > 5 else -1)
