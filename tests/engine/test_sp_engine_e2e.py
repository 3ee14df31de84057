"""Engine-level context parallelism: --sequence-parallel-size serving.

The sp engine (block-strided KV pool over the sp mesh axis, ring
prefill + combined decode) must emit exactly the tokens the plain
engine emits. No reference counterpart (prompts beyond one batch are
rejected there; context never scales past one GPU's pool).
"""
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.entrypoints.llm import LLM
from vllm_quick_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def model_dir():
    return make_tiny_llama_dir()


@pytest.mark.parametrize("sp,tp", [(4, 1), (2, 2)])
def test_sp_engine_matches_plain_greedy(model_dir, sp, tp):
    rng = np.random.default_rng(0)
    # Lengths straddling block (16) and sp-chunk boundaries.
    prompts = [rng.integers(3, 500, size=n).tolist()
               for n in (70, 16, 33)]
    sp_params = SamplingParams(max_tokens=12, temperature=0.0,
                               ignore_eos=True)

    plain = LLM(model=model_dir, max_model_len=256, block_size=16,
                dtype="float32")
    ref = plain.generate(prompt_token_ids=prompts,
                         sampling_params=sp_params, use_tqdm=False)
    ref_tokens = [o.outputs[0].token_ids for o in ref]
    del plain

    sp_llm = LLM(model=model_dir, max_model_len=256, block_size=16,
                 dtype="float32", sequence_parallel_size=sp,
                 tensor_parallel_size=tp)
    out = sp_llm.generate(prompt_token_ids=prompts,
                          sampling_params=sp_params, use_tqdm=False)
    out_tokens = [o.outputs[0].token_ids for o in out]

    assert out_tokens == ref_tokens


def test_sp_engine_beam_search_matches_plain(model_dir):
    """Beam search forks candidates post-prefill and triggers
    copy-on-write on the shared tail block — under sp the fresh block
    must come from the same shard. Outputs must match the plain
    engine exactly."""
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 500, size=40).tolist()]
    sp_params = SamplingParams(max_tokens=8, temperature=0.0,
                               use_beam_search=True, best_of=2,
                               ignore_eos=True)

    plain = LLM(model=model_dir, max_model_len=256, block_size=16,
                dtype="float32")
    ref = plain.generate(prompt_token_ids=prompts,
                         sampling_params=sp_params, use_tqdm=False)
    ref_tokens = sorted(tuple(o.token_ids) for o in ref[0].outputs)
    del plain

    sp_llm = LLM(model=model_dir, max_model_len=256, block_size=16,
                 dtype="float32", sequence_parallel_size=4)
    out = sp_llm.generate(prompt_token_ids=prompts,
                          sampling_params=sp_params, use_tqdm=False)
    out_tokens = sorted(tuple(o.token_ids) for o in out[0].outputs)

    assert out_tokens == ref_tokens


def test_sp_engine_lora_matches_plain(model_dir):
    """Multi-LoRA under sp: per-token adapter indices ride the same
    block-strided token permutation as the ids/slots (prompt) and
    replicate per rank (decode). Adapter and base outputs must match
    the plain LoRA engine exactly."""
    from tests.lora.test_lora import _make_adapter
    from vllm_quick_tpu.lora.request import LoRARequest

    base_dir = make_tiny_llama_dir(key="sp_lora_base")
    ad1, _ = _make_adapter(base_dir, seed=31)
    prompts = ["the quick brown fox jumps over it",
               "hello world says hi"]
    params = SamplingParams(temperature=0.0, max_tokens=6)

    def run(**extra):
        llm = LLM(model=base_dir, dtype="float32", max_model_len=256,
                  block_size=16, enable_lora=True, max_loras=2,
                  max_lora_rank=8, disable_log_stats=True, **extra)
        outs = []
        for req in (LoRARequest("a1", 1, ad1), None):
            outs.append([o.outputs[0].token_ids
                         for o in llm.generate(prompts, params,
                                               lora_request=req,
                                               use_tqdm=False)])
        return outs

    ref = run()
    got = run(sequence_parallel_size=4)
    assert got == ref
    assert ref[0] != ref[1]     # the adapter actually does something
