"""Multi-step decode (num_decode_steps > 1) must be a pure latency
optimization: greedy outputs are token-for-token identical to the
single-step engine, including under repetition/presence penalties
(which exercise the in-graph output-token append between chained
steps), and stop conditions land on exact boundaries."""
import jax.numpy  # noqa: F401  (backend init order)
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu import LLM, SamplingParams

PROMPTS = ["hello world this is", "the quick brown", "a"]


def _generate(num_decode_steps, sampling_params, max_num_seqs=8):
    llm = LLM(model=make_tiny_llama_dir(), dtype="float32",
              max_model_len=128, max_num_seqs=max_num_seqs,
              num_decode_steps=num_decode_steps)
    outs = llm.generate(PROMPTS, sampling_params)
    return [tuple(o.outputs[0].token_ids) for o in outs]


@pytest.mark.parametrize("k", [2, 4])
def test_multi_step_matches_single_step_greedy(k):
    sp = SamplingParams(temperature=0.0, max_tokens=9)
    assert _generate(k, sp) == _generate(1, sp)


def test_multi_step_matches_with_penalties():
    sp = SamplingParams(temperature=0.0, max_tokens=10,
                        repetition_penalty=1.3, presence_penalty=0.5,
                        frequency_penalty=0.2)
    assert _generate(4, sp) == _generate(1, sp)


def test_multi_step_respects_max_tokens():
    # 7 tokens with k=4: second dispatch over-generates one token that
    # the engine must truncate.
    sp = SamplingParams(temperature=0.0, max_tokens=7)
    for toks in _generate(4, sp):
        assert len(toks) == 7


def test_multi_step_stop_token():
    base = _generate(1, SamplingParams(temperature=0.0, max_tokens=12))
    # Stop on a token the greedy continuation actually emits mid-chain.
    stop_tok = base[0][5]
    sp = SamplingParams(temperature=0.0, max_tokens=12,
                        stop_token_ids=[stop_tok])
    got = _generate(4, sp)
    want = _generate(1, sp)
    assert got == want


def test_multi_step_random_sampling_runs():
    # Sampled path: not bit-comparable to single-step (different
    # per-step seed folding) but must produce max_tokens valid ids.
    sp = SamplingParams(temperature=0.8, top_p=0.9, seed=7,
                        max_tokens=8)
    for toks in _generate(4, sp):
        assert len(toks) == 8
        assert all(0 <= t < 512 for t in toks)
