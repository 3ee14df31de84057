"""Sampler unit tests with injected logits (the mocked-logits style of
the reference's tests/samplers/test_sampler.py:16-28)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_quick_tpu.model_executor.layers.sampler import Sampler
from vllm_quick_tpu.model_executor.sampling_metadata import (
    build_sampling_tensors)
from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.sequence import SequenceData

VOCAB = 32


def _run(params_list, logits, seq_datas=None, step_seed=7):
    n = len(params_list)
    if seq_datas is None:
        seq_datas = [SequenceData([1, 2, 3]) for _ in range(n)]
    tensors, flags, _ = build_sampling_tensors(seq_datas, params_list,
                                               VOCAB, step_seed=step_seed)
    sp = tensors.temperatures.shape[0]
    logits = np.pad(logits, ((0, sp - len(logits)), (0, 0)))
    sampler = Sampler(VOCAB)
    chosen, chosen_lp, top_lp, top_ids = sampler(
        jnp.asarray(logits, jnp.float32), tensors, flags)
    return (np.asarray(chosen)[:n], np.asarray(chosen_lp)[:n],
            np.asarray(top_lp)[:n], np.asarray(top_ids)[:n])


def test_greedy_picks_argmax(rng):
    logits = rng.standard_normal((4, VOCAB)).astype(np.float32)
    params = [SamplingParams(temperature=0.0)] * 4
    chosen, _, _, _ = _run(params, logits)
    np.testing.assert_array_equal(chosen[:, 0], logits.argmax(-1))


def test_top_k_restricts_support(rng):
    logits = rng.standard_normal((64, VOCAB)).astype(np.float32)
    k = 3
    params = [SamplingParams(temperature=1.0, top_k=k, seed=i)
              for i in range(64)]
    chosen, _, _, _ = _run(params, logits)
    topk_sets = np.argsort(-logits, axis=-1)[:, :k]
    for i in range(64):
        assert chosen[i, 0] in topk_sets[i]


def test_top_p_restricts_support(rng):
    # Peaked distribution: top_p=0.5 must always return the argmax.
    logits = np.zeros((16, VOCAB), np.float32)
    peaks = rng.integers(0, VOCAB, 16)
    logits[np.arange(16), peaks] = 10.0
    params = [SamplingParams(temperature=1.0, top_p=0.5, seed=i)
              for i in range(16)]
    chosen, _, _, _ = _run(params, logits)
    np.testing.assert_array_equal(chosen[:, 0], peaks)


def test_min_p_restricts_support(rng):
    logits = np.zeros((8, VOCAB), np.float32)
    logits[:, 0] = 5.0   # dominant token
    logits[:, 1] = 4.9   # survives min_p=0.5
    params = [SamplingParams(temperature=1.0, min_p=0.5, seed=i)
              for i in range(8)]
    chosen, _, _, _ = _run(params, logits)
    assert set(np.unique(chosen[:, 0])) <= {0, 1}


def test_seeded_sampling_deterministic(rng):
    logits = rng.standard_normal((4, VOCAB)).astype(np.float32)
    params = [SamplingParams(temperature=1.0, seed=1234)] * 4
    a = _run(params, logits, step_seed=1)[0]
    b = _run(params, logits, step_seed=2)[0]  # step seed must not matter
    np.testing.assert_array_equal(a, b)
    c = _run([SamplingParams(temperature=1.0, seed=99)] * 4, logits)[0]
    assert not np.array_equal(a, c)


def test_presence_frequency_penalties(rng):
    logits = np.zeros((2, VOCAB), np.float32)
    seqs = [SequenceData([1], output_token_ids=[5, 5, 5]),
            SequenceData([1], output_token_ids=[5, 5, 5])]
    params = [SamplingParams(temperature=0.0),
              SamplingParams(temperature=0.0, presence_penalty=1.5,
                             frequency_penalty=1.5)]
    logits[:, 5] = 2.0
    logits[:, 7] = 1.0
    chosen, _, _, _ = _run(params, logits, seq_datas=seqs)
    assert chosen[0, 0] == 5          # unpenalized keeps argmax
    assert chosen[1, 0] == 7          # penalties push 5 below 7


def test_repetition_penalty(rng):
    logits = np.zeros((1, VOCAB), np.float32)
    logits[0, 3] = 2.0
    logits[0, 4] = 1.5
    seqs = [SequenceData([3], output_token_ids=[])]
    params = [SamplingParams(temperature=0.0, repetition_penalty=2.0)]
    chosen, _, _, _ = _run(params, logits, seq_datas=seqs)
    # token 3 appeared in the prompt: 2.0 / 2.0 = 1.0 < 1.5
    assert chosen[0, 0] == 4


def test_logprobs_output(rng):
    logits = rng.standard_normal((3, VOCAB)).astype(np.float32)
    params = [SamplingParams(temperature=0.0, logprobs=5)] * 3
    chosen, chosen_lp, top_lp, top_ids = _run(params, logits)
    assert top_ids.shape[1] >= 5
    ref_lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for i in range(3):
        np.testing.assert_allclose(
            top_lp[i, 0], ref_lp[i].max(), rtol=1e-4, atol=1e-4)
        assert top_ids[i, 0] == ref_lp[i].argmax()


def test_best_of_returns_multiple(rng):
    logits = rng.standard_normal((1, VOCAB)).astype(np.float32)
    params = [SamplingParams(temperature=1.0, n=1, best_of=4, seed=0)]
    chosen, _, _, _ = _run(params, logits)
    assert chosen.shape[1] >= 4
