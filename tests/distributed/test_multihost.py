"""Multihost coordination helpers (single-process behavior + the
prepare/broadcast/run split used by the follower path)."""
import numpy as np

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.parallel import multihost


def test_single_process_noops():
    assert not multihost.is_multihost()
    assert multihost.is_driver()
    payload = {"x": np.arange(4)}
    assert multihost.broadcast_step_inputs(payload) is payload
    multihost.sync_global_devices("tag")
    assert multihost.agree_num_blocks(42) == 42


def test_prepare_broadcast_run_roundtrip():
    """The driver's prepared payload must reproduce execute_model's
    result through run_prepared (the follower code path)."""
    from vllm_quick_tpu.config import (CacheConfig, DeviceConfig,
                                       ModelConfig, ParallelConfig,
                                       SchedulerConfig)
    from vllm_quick_tpu.sampling_params import SamplingParams
    from vllm_quick_tpu.sequence import SequenceData, SequenceGroupMetadata
    from vllm_quick_tpu.worker.worker import Worker

    d = make_tiny_llama_dir()
    cache_config = CacheConfig(16, 0.9, 1, "auto")
    cache_config.num_gpu_blocks = 32
    cache_config.num_cpu_blocks = 4
    worker = Worker(ModelConfig(model=d, dtype="float32", seed=0,
                                max_model_len=128),
                    ParallelConfig(1, 1),
                    SchedulerConfig(2048, 16, 128, 128), DeviceConfig(),
                    cache_config)
    worker.load_model()
    worker.init_cache_engine(cache_config)
    runner = worker.model_runner

    meta = SequenceGroupMetadata(
        request_id="0", is_prompt=True,
        seq_data={0: SequenceData([1, 5, 9, 2])},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={0: [1, 2]})

    payload = runner.prepare_step_inputs([meta])
    assert all(isinstance(v, np.ndarray)
               for v in payload.values()), payload
    caches = worker.cache_engine.device_cache
    logits, caches, extras = runner.run_prepared(payload, caches)
    assert extras is None
    assert np.isfinite(np.asarray(logits)).all()
