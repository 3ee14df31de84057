"""Chunked prefill end to end: identical greedy output, longer prompts.

The chunked engine (max_num_batched_tokens=32, block 16) must produce
exactly the tokens the plain engine produces, and must serve prompts
longer than the per-step budget that the plain engine rejects.
"""
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.entrypoints.llm import LLM
from vllm_quick_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def model_dir():
    return make_tiny_llama_dir()


def test_chunked_matches_plain_greedy(model_dir):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 500, size=n).tolist()
               for n in (50, 23, 70)]     # 50/70 exceed the 32 budget
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)

    plain = LLM(model=model_dir, max_model_len=128, block_size=16,
                dtype="float32")
    ref = plain.generate(prompt_token_ids=prompts, sampling_params=sp,
                         use_tqdm=False)
    ref_tokens = [o.outputs[0].token_ids for o in ref]
    del plain

    chunked = LLM(model=model_dir, max_model_len=128, block_size=16,
                  dtype="float32", max_num_batched_tokens=32,
                  max_num_seqs=8, enable_chunked_prefill=True)
    out = chunked.generate(prompt_token_ids=prompts, sampling_params=sp,
                           use_tqdm=False)
    out_tokens = [o.outputs[0].token_ids for o in out]

    assert out_tokens == ref_tokens
