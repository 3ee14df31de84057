"""Speculative decoding components (reference:
tests/worker/spec_decode/test_multi_step_worker.py + rejection sampler
tests): multi-step draft execution equals repeated single steps, and
the rejection sampler obeys the accept/recover/bonus contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.config import (CacheConfig, DeviceConfig, ModelConfig,
                                   ParallelConfig, SchedulerConfig)
from vllm_quick_tpu.model_executor.layers.rejection_sampler import (
    rejection_sample)
from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.sequence import SequenceData, SequenceGroupMetadata
from vllm_quick_tpu.worker.spec_decode.multi_step_worker import (
    MultiStepWorker)


# -- rejection sampler ------------------------------------------------------

def test_rejection_all_accept_when_distributions_match():
    b, k, v = 4, 3, 16
    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(v), size=(b, k)).astype(np.float32)
    drafts = np.argmax(probs, axis=-1).astype(np.int32)
    bonus = np.full((b,), 7, np.int32)
    out, n = rejection_sample(jax.random.PRNGKey(0), jnp.asarray(probs),
                              jnp.asarray(drafts), jnp.asarray(probs),
                              jnp.asarray(bonus))
    out = np.asarray(out)
    n = np.asarray(n)
    # p_t / p_d == 1 -> always accepted; bonus emitted at position k.
    assert (n == k + 1).all()
    np.testing.assert_array_equal(out[:, :k], drafts)
    assert (out[:, k] == 7).all()


def test_rejection_rejects_zero_target_prob():
    b, k, v = 2, 2, 8
    draft_probs = np.full((b, k, v), 1.0 / v, np.float32)
    drafts = np.zeros((b, k), np.int32)
    target = np.zeros((b, k, v), np.float32)
    target[:, :, 3] = 1.0          # target puts all mass on token 3
    out, n = rejection_sample(jax.random.PRNGKey(1),
                              jnp.asarray(draft_probs),
                              jnp.asarray(drafts), jnp.asarray(target),
                              jnp.asarray(np.zeros(b, np.int32)))
    out = np.asarray(out)
    n = np.asarray(n)
    # First draft must be rejected (accept prob 0) and recovered = 3.
    assert (n == 1).all()
    assert (out[:, 0] == 3).all()
    assert (out[:, 1:] == -1).all()


def test_rejection_output_distribution_matches_target():
    """Speculative decoding guarantee: emitted first tokens follow the
    target distribution regardless of the draft."""
    v, trials = 4, 3000
    draft = np.asarray([0.7, 0.1, 0.1, 0.1], np.float32)
    target = np.asarray([0.1, 0.4, 0.3, 0.2], np.float32)
    rng = np.random.default_rng(0)
    counts = np.zeros(v)
    draft_probs = jnp.asarray(np.tile(draft, (trials, 1, 1)))
    target_probs = jnp.asarray(np.tile(target, (trials, 1, 1)))
    drafts = jnp.asarray(
        rng.choice(v, size=(trials, 1), p=draft).astype(np.int32))
    bonus = jnp.zeros((trials,), jnp.int32)
    out, _ = rejection_sample(jax.random.PRNGKey(2), draft_probs,
                              drafts, target_probs, bonus)
    first = np.asarray(out)[:, 0]
    for t in range(v):
        counts[t] = (first == t).sum()
    emp = counts / trials
    np.testing.assert_allclose(emp, target, atol=0.04)


# -- multi-step worker -------------------------------------------------------

@pytest.fixture(scope="module")
def msw():
    d = make_tiny_llama_dir()
    model_config = ModelConfig(model=d, dtype="float32", seed=0,
                               max_model_len=256)
    parallel_config = ParallelConfig(1, 1)
    scheduler_config = SchedulerConfig(2048, 16, 256, 256)
    cache_config = CacheConfig(16, 0.9, 1, "auto")
    cache_config.num_gpu_blocks = 64
    cache_config.num_cpu_blocks = 8
    worker = MultiStepWorker(model_config, parallel_config,
                             scheduler_config, DeviceConfig(),
                             cache_config)
    worker.load_model()
    worker.init_cache_engine(cache_config)
    return worker


def _decode_meta(token_ids, seq_id=0):
    data = SequenceData(list(token_ids))
    blocks = [1 + seq_id * 8 + j for j in range(8)]
    return SequenceGroupMetadata(
        request_id=str(seq_id), is_prompt=False,
        seq_data={seq_id: data},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={seq_id: blocks})


def _prefill(worker, token_ids, seq_id=0):
    data = SequenceData(list(token_ids))
    blocks = [1 + seq_id * 8 + j for j in range(8)]
    meta = SequenceGroupMetadata(
        request_id=str(seq_id), is_prompt=True,
        seq_data={seq_id: data},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={seq_id: blocks})
    return worker.execute_model([meta], {}, {}, {})


def test_multi_step_equals_single_steps(msw):
    prompt = [1, 9, 4, 77, 30]
    out = _prefill(msw, prompt, seq_id=0)
    first = out[0].samples[0].output_token

    # Path A: three explicit single steps.
    seq = prompt + [first]
    single_tokens = []
    for _ in range(3):
        meta = _decode_meta(seq, seq_id=0)
        o = msw.execute_model([meta], {}, {}, {})
        tok = o[0].samples[0].output_token
        single_tokens.append(tok)
        seq.append(tok)

    # Path B: multi-step on a fresh sequence id / block range.
    _prefill(msw, prompt, seq_id=1)
    meta = _decode_meta(prompt + [first], seq_id=1)
    outs = msw.execute_model_multi_step([meta], {}, {}, {}, num_steps=3)
    multi_tokens = [o[0].samples[0].output_token for o in outs]

    assert multi_tokens == single_tokens
    # Caller's metadata must be untouched (shallow-copy contract).
    assert meta.seq_data[1].get_output_len() == 0
