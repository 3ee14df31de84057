"""Subprocess body for the 2-process sharded-step tests (tp=2 or pp=2).

Each process contributes ONE cpu device to a global 2-device mesh —
the chosen parallel axis spans the two processes, so the jitted step's
collectives ride the (gloo) cross-process transport while the
driver/follower payload broadcast carries the step inputs: the exact
broadcast + shard_map composition a real multi-host deployment runs
(reference: vllm/worker/worker.py:191-226 metadata broadcast feeding
NCCL-TP workers — which reference PP never reached, config.py:388).

mode "tp": per-layer psum/all_gather cross the process boundary.
mode "pp": the GPipe schedule's ppermute activation hops cross it —
each process holds one stage's layers and stacked KV pool shard.

Checks vs a single-device reference (computed by the parent, JSON):
 * rank 0's greedy sampled tokens match exactly;
 * the global KV-pool checksum (sum over both ranks' shards) matches.

Usage: python multihost_tp_proc.py <rank> <port> <model_dir> <ref_json>
       [tp|pp]
"""
import json
import os
import sys

os.environ.pop("XLA_FLAGS", None)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main(rank: int, port: int, model_dir: str, ref_path: str,
         mode: str = "tp") -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        coordinator_bind_address=f"0.0.0.0:{port}",
        num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 2, jax.devices()

    import numpy as np

    from vllm_quick_tpu.config import (CacheConfig, DeviceConfig,
                                       ModelConfig, ParallelConfig,
                                       SchedulerConfig)
    from vllm_quick_tpu.parallel.mesh import ParallelContext, make_mesh
    from vllm_quick_tpu.sampling_params import SamplingParams
    from vllm_quick_tpu.sequence import SequenceData, SequenceGroupMetadata
    from vllm_quick_tpu.worker.worker import Worker

    with open(ref_path) as f:
        ref = json.load(f)

    if mode == "pp":
        mesh = make_mesh(pipeline_parallel_size=2)
        ctx = ParallelContext(pp_size=2)
        parallel_config = ParallelConfig(2, 1)
    else:
        mesh = make_mesh(tensor_parallel_size=2)
        ctx = ParallelContext(tp_size=2)
        parallel_config = ParallelConfig(1, 2)
    cache_config = CacheConfig(16, 0.9, 1, "auto")
    cache_config.num_gpu_blocks = 16
    cache_config.num_cpu_blocks = 8
    worker = Worker(
        ModelConfig(model=model_dir, dtype="float32", seed=0,
                    max_model_len=128),
        parallel_config, SchedulerConfig(2048, 16, 128, 128),
        DeviceConfig(), cache_config, ctx=ctx, mesh=mesh)
    worker.load_model()
    worker.init_cache_engine(cache_config)

    prompt = ref["prompt"]
    if rank == 0:
        sampled = []
        meta = SequenceGroupMetadata(
            request_id="0", is_prompt=True,
            seq_data={0: SequenceData(list(prompt))},
            sampling_params=SamplingParams(temperature=0.0),
            block_tables={0: [1]})
        out = worker.execute_model([meta], {}, {}, {})
        tok = out[0].samples[0].output_token
        sampled.append(int(tok))
        outputs = [int(tok)]
        for _ in range(2):
            meta = SequenceGroupMetadata(
                request_id="0", is_prompt=False,
                seq_data={0: SequenceData(list(prompt), list(outputs))},
                sampling_params=SamplingParams(temperature=0.0),
                block_tables={0: [1]})
            out = worker.execute_model([meta], {}, {}, {})
            tok = int(out[0].samples[0].output_token)
            sampled.append(tok)
            outputs.append(tok)
        assert sampled == ref["tokens"], (sampled, ref["tokens"])
        worker.shutdown_followers()
    else:
        worker.run_follower_loop()

    from jax.experimental import multihost_utils
    local = 0.0
    for c in worker.cache_engine.device_cache:
        for shard in c.addressable_shards:
            d = np.asarray(shard.data, dtype=np.float64)
            # Exclude the null block (0): pad rows and pp don't-care
            # ticks write don't-care data there.
            d = d[:, 1:] if d.ndim == 6 else d[1:]
            local += float(np.abs(d).sum())
    both = multihost_utils.process_allgather(np.asarray([local]))
    total = float(both.sum())
    assert total > 0, "no KV ever written"
    assert np.isclose(total, ref["pool_sum"], rtol=1e-4), (
        total, ref["pool_sum"])
    print(f"RANK{rank}_OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
         sys.argv[5] if len(sys.argv) > 5 else "tp")
