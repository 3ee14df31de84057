"""ModelRunner input preparation (reference parity:
tests/worker/test_model_runner.py — _prepare_prompt shape / slot-mapping
checks, extended with decode bucketing)."""
import numpy as np

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.config import (CacheConfig, DeviceConfig, ModelConfig,
                                   ParallelConfig, SchedulerConfig)
from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.sequence import SequenceData, SequenceGroupMetadata
from vllm_quick_tpu.worker.model_runner import (_DECODE_BATCH_BUCKETS,
                                                _PREFILL_BATCH_BUCKETS)
from vllm_quick_tpu.worker.worker import Worker

BLOCK = 16


def _make_runner():
    d = make_tiny_llama_dir()
    cache_config = CacheConfig(BLOCK, 0.9, 1, "auto")
    cache_config.num_gpu_blocks = 32
    cache_config.num_cpu_blocks = 4
    worker = Worker(ModelConfig(model=d, dtype="float32", seed=0,
                                max_model_len=128),
                    ParallelConfig(1, 1),
                    SchedulerConfig(2048, 16, 128, 128), DeviceConfig(),
                    cache_config)
    worker.load_model()
    worker.init_cache_engine(cache_config)
    return worker.model_runner


def _prompt_meta(rid, tokens, blocks):
    return SequenceGroupMetadata(
        request_id=rid, is_prompt=True,
        seq_data={int(rid): SequenceData(tokens)},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={int(rid): blocks})


def test_prepare_prompt_shapes_and_slots():
    runner = _make_runner()
    metas = [
        _prompt_meta("0", [1, 5, 9, 2], [3, 7]),
        _prompt_meta("1", list(range(2, 22)), [5, 9]),  # 20 tokens
    ]
    payload = runner.prepare_step_inputs(metas)
    assert bool(payload["is_prompt"])
    ids, pos, slots = payload["ids"], payload["pos"], payload["slot_mapping"]
    b = ids.shape[0]
    lmax = ids.shape[1]
    # Batch padded to a prefill bucket, length to a multiple of BLOCK
    # (required by the block-granular cache write).
    assert b in _PREFILL_BATCH_BUCKETS
    assert lmax % BLOCK == 0 and lmax >= 20
    assert pos.shape == (b, lmax) and slots.shape == (b, lmax)
    # Slot mapping: token p of seq 0 lives in block 3 (p < 16).
    for p in range(4):
        assert slots[0, p] == 3 * BLOCK + p
    # Seq 1 spans two blocks: 5 then 9.
    for p in range(20):
        blk = [5, 9][p // BLOCK]
        assert slots[1, p] == blk * BLOCK + p % BLOCK
    # Pad tokens map to the null block (slot 0).
    assert (np.asarray(slots)[2:] == 0).all()
    assert np.asarray(payload["prompt_lens"])[:2].tolist() == [4, 20]


def test_prepare_decode_shapes_and_block_tables():
    runner = _make_runner()
    metas = []
    for i in range(3):
        data = SequenceData(list(range(1, 18)))  # 17 tokens: 2 blocks
        metas.append(SequenceGroupMetadata(
            request_id=str(i), is_prompt=False,
            seq_data={i: data},
            sampling_params=SamplingParams(temperature=0.0),
            block_tables={i: [2 * i + 1, 2 * i + 2]}))
    payload = runner.prepare_step_inputs(metas)
    assert not bool(payload["is_prompt"])
    ids = payload["ids"]
    b = ids.shape[0]
    assert b in _DECODE_BATCH_BUCKETS
    # One token per sequence; position = len - 1 = 16 -> second block.
    pos = np.asarray(payload["pos"])
    slots = np.asarray(payload["slot_mapping"])
    cl = np.asarray(payload["context_lens"])
    bt = np.asarray(payload["block_tables"])
    for i in range(3):
        assert pos[i] == 16
        assert slots[i] == (2 * i + 2) * BLOCK + 0
        assert cl[i] == 17
        assert bt[i, :2].tolist() == [2 * i + 1, 2 * i + 2]
    # Padded rows are inert: context 0, null slots.
    assert (cl[3:] == 0).all() and (slots[3:] == 0).all()
