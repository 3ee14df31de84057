"""Engine-level pipeline parallelism: --pipeline-parallel-size serving.

The pp engine (stage-stacked params + KV pools over the pp mesh axis,
GPipe microbatch schedule, parallel/pipeline.py) must emit exactly the
tokens the plain engine emits. The reference rejects pp at config time
(config.py:388-390).
"""
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.entrypoints.llm import LLM
from vllm_quick_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def model_dir():
    return make_tiny_llama_dir()


@pytest.mark.parametrize("pp,tp", [(2, 1), (2, 2)])
def test_pp_engine_matches_plain_greedy(model_dir, pp, tp):
    rng = np.random.default_rng(0)
    # Lengths straddling block (16) and microbatch boundaries.
    prompts = [rng.integers(3, 500, size=n).tolist()
               for n in (70, 16, 33)]
    params = SamplingParams(max_tokens=12, temperature=0.0,
                            ignore_eos=True)

    plain = LLM(model=model_dir, max_model_len=256, block_size=16,
                dtype="float32")
    ref = plain.generate(prompt_token_ids=prompts,
                         sampling_params=params, use_tqdm=False)
    ref_tokens = [o.outputs[0].token_ids for o in ref]
    del plain

    pp_llm = LLM(model=model_dir, max_model_len=256, block_size=16,
                 dtype="float32", pipeline_parallel_size=pp,
                 tensor_parallel_size=tp)
    out = pp_llm.generate(prompt_token_ids=prompts,
                          sampling_params=params, use_tqdm=False)
    out_tokens = [o.outputs[0].token_ids for o in out]

    assert out_tokens == ref_tokens


def test_pp_engine_beam_search_matches_plain(model_dir):
    """Beam search forks candidates post-prefill and triggers
    copy-on-write on the shared tail block — under pp the COW copy
    runs on the stacked [pp, NB, ...] pool (axis-1 dus). Outputs must
    match the plain engine exactly."""
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 500, size=40).tolist()]
    params = SamplingParams(max_tokens=8, temperature=0.0,
                            use_beam_search=True, best_of=2,
                            ignore_eos=True)

    plain = LLM(model=model_dir, max_model_len=256, block_size=16,
                dtype="float32")
    ref = plain.generate(prompt_token_ids=prompts,
                         sampling_params=params, use_tqdm=False)
    ref_tokens = sorted(tuple(o.token_ids) for o in ref[0].outputs)
    del plain

    pp_llm = LLM(model=model_dir, max_model_len=256, block_size=16,
                 dtype="float32", pipeline_parallel_size=2)
    out = pp_llm.generate(prompt_token_ids=prompts,
                          sampling_params=params, use_tqdm=False)
    out_tokens = sorted(tuple(o.token_ids) for o in out[0].outputs)

    assert out_tokens == ref_tokens
