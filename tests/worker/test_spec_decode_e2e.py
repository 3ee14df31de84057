"""End-to-end speculative decoding.

The speculative-decoding guarantee: emitted tokens follow the TARGET
model's distribution exactly, whatever the draft proposes. For greedy
sampling that means spec-decode output must be IDENTICAL to normal
decoding — both with a perfect draft (the target itself) and with an
unrelated draft (different random weights, low acceptance).
"""
import pytest

from tests.utils import make_tiny_llama_dir

PROMPTS = [
    "the quick brown fox jumps",
    "hello world and good",
    "one two three four",
]


def _generate(model_dir, spec_model=None, k=3, max_tokens=12):
    from vllm_quick_tpu import LLM, SamplingParams
    kwargs = {}
    if spec_model is not None:
        kwargs.update(speculative_model=spec_model,
                      num_speculative_tokens=k)
    llm = LLM(model=model_dir, dtype="float32", enforce_eager=True,
              num_tpu_blocks_override=256, max_model_len=128,
              max_num_batched_tokens=512, disable_log_stats=True,
              **kwargs)
    outs = llm.generate(PROMPTS, SamplingParams(temperature=0.0,
                                                max_tokens=max_tokens))
    texts = [o.outputs[0].token_ids for o in outs]
    worker = llm.llm_engine.worker
    del llm
    return texts, worker


@pytest.fixture(scope="module")
def baseline():
    d = make_tiny_llama_dir(key="spec_target")
    tokens, _ = _generate(d)
    return d, tokens


def test_spec_decode_perfect_draft_matches_greedy(baseline):
    d, want = baseline
    got, worker = _generate(d, spec_model=d)
    assert got == want
    # A perfect draft must accept (nearly) everything: >= k tokens per
    # step on average would be exact; require a high acceptance rate.
    assert worker.spec_steps > 0
    avg = worker.emitted_tokens / worker.spec_steps
    assert avg > 2.0, f"perfect draft emitted only {avg:.2f} tokens/step"


def test_spec_decode_wrong_draft_still_exact(baseline):
    d, want = baseline
    draft = make_tiny_llama_dir(seed=123, key="spec_draft")
    got, worker = _generate(d, spec_model=draft)
    assert got == want
    assert worker.spec_steps > 0


def test_spec_decode_stop_conditions_match(baseline):
    """Stops must trigger mid-chain exactly as they would token-by-token:
    max_tokens truncation and stop_token_ids both land on the same
    boundary as non-speculative decoding."""
    from vllm_quick_tpu import LLM, SamplingParams
    d, _ = baseline
    llm = LLM(model=d, dtype="float32", enforce_eager=True,
              num_tpu_blocks_override=256, max_model_len=128,
              max_num_batched_tokens=512, disable_log_stats=True,
              speculative_model=d, num_speculative_tokens=4)
    base = llm.generate(PROMPTS[:1],
                        SamplingParams(temperature=0.0, max_tokens=9))
    want9 = base[0].outputs[0].token_ids
    assert len(want9) == 9  # max_tokens cuts mid-chain (9 % (k+1) != 0)

    # A stop token inside the continuation must end the output there.
    stop_tok = want9[4]
    out = llm.generate(
        PROMPTS[:1],
        SamplingParams(temperature=0.0, max_tokens=12,
                       stop_token_ids=[stop_tok]))[0]
    got = out.outputs[0].token_ids
    assert got == want9[:5]
    assert out.outputs[0].finish_reason == "stop"


def test_spec_decode_ineligible_requests_fall_back(baseline):
    """top-p sampling is outside the spec gate; the engine must still
    serve it (via the fallback path) without errors."""
    from vllm_quick_tpu import LLM, SamplingParams
    d, _ = baseline
    llm = LLM(model=d, dtype="float32", enforce_eager=True,
              num_tpu_blocks_override=256, max_model_len=128,
              max_num_batched_tokens=512, disable_log_stats=True,
              speculative_model=d, num_speculative_tokens=3)
    outs = llm.generate(
        ["a b c d"],
        SamplingParams(temperature=0.8, top_p=0.9, max_tokens=8))
    assert len(outs[0].outputs[0].token_ids) == 8
