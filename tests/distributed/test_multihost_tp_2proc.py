"""2 processes x tp=2: the sharded step + payload broadcast composed.

The tp mesh axis spans the two processes (one cpu device each), so the
per-layer psum/all_gather collectives cross the process boundary inside
the jitted step while the driver broadcasts prepared batch inputs —
the combination a real multi-host TP slice runs. Verified against a
tp=1 in-process reference: identical greedy tokens and KV-pool sum.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

from tests.utils import make_tiny_llama_dir

_HELPER = os.path.join(os.path.dirname(__file__), "multihost_tp_proc.py")
_PROMPT = [3, 5, 9, 2, 7, 1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _tp1_reference(model_dir):
    """Greedy tokens + final KV-pool checksum from a plain tp=1 worker."""
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

    tokens = []
    meta = SequenceGroupMetadata(
        request_id="0", is_prompt=True,
        seq_data={0: SequenceData(list(_PROMPT))},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={0: [1]})
    out = worker.execute_model([meta], {}, {}, {})
    tokens.append(int(out[0].samples[0].output_token))
    outputs = list(tokens)
    for _ in range(2):
        meta = SequenceGroupMetadata(
            request_id="0", is_prompt=False,
            seq_data={0: SequenceData(list(_PROMPT), list(outputs))},
            sampling_params=SamplingParams(temperature=0.0),
            block_tables={0: [1]})
        out = worker.execute_model([meta], {}, {}, {})
        tok = int(out[0].samples[0].output_token)
        tokens.append(tok)
        outputs.append(tok)
    pool_sum = sum(
        float(abs(np.asarray(c, dtype=np.float64)[1:]).sum())
        for c in worker.cache_engine.device_cache)
    return tokens, pool_sum


@pytest.mark.timeout(300)
@pytest.mark.parametrize("mode", ["tp", "pp"])
def test_two_process_sharded_step(tmp_path, mode):
    """mode 'tp': per-layer collectives cross the process boundary.
    mode 'pp': each process is one pipeline stage — the GPipe
    schedule's ppermute activation hops cross it (the deployment shape
    PP exists for; the reference never got here, config.py:388)."""
    model_dir = make_tiny_llama_dir()
    tokens, pool_sum = _tp1_reference(model_dir)
    ref_path = tmp_path / "ref.json"
    ref_path.write_text(json.dumps(
        {"prompt": _PROMPT, "tokens": tokens, "pool_sum": pool_sum}))

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _HELPER, str(rank), str(port), model_dir,
             str(ref_path), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=270)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"rank {rank} failed (rc={p.returncode}):\n{out[-4000:]}")
        assert f"RANK{rank}_OK" in out, out[-4000:]
