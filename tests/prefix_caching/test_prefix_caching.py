"""Prefix caching end-to-end (reference:
tests/prefix_caching/test_prefix_caching.py — generation with
prefix_pos must match generation without)."""
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def llm():
    d = make_tiny_llama_dir()
    return LLM(model=d, dtype="float32", max_model_len=256,
               disable_log_stats=True)


def test_prefix_cached_generation_matches(llm):
    prefix = ("You are an expert school principal in a long meeting "
              "about hiring decisions for the upcoming year. ")
    prompts = [prefix + "Describe the ideal candidate.",
               prefix + "List three interview questions."]
    params = SamplingParams(temperature=0.0, max_tokens=8)

    baseline = llm.generate(prompts, params)
    prefix_pos = len(llm.get_tokenizer()(prefix).input_ids)

    # First prefixed run computes + marks the prefix; run twice so the
    # second run actually hits the cached path.
    _ = llm.generate(prompts, params, prefix_pos=[prefix_pos] * 2)
    cached = llm.generate(prompts, params, prefix_pos=[prefix_pos] * 2)

    for b, c in zip(baseline, cached):
        assert b.outputs[0].token_ids == c.outputs[0].token_ids, \
            (b.outputs[0].text, c.outputs[0].text)
