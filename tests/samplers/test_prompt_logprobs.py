"""Prompt logprobs (echo) and logits_processors end-to-end.

Reference behavior: vllm/model_executor/layers/sampler.py:426-537
(prompt logprob extraction) and :152-167 (logits processors).
"""
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir


@pytest.fixture(scope="module")
def tiny_llm():
    from vllm_quick_tpu import LLM
    d = make_tiny_llama_dir()
    return LLM(model=d, dtype="float32", enforce_eager=True,
               num_tpu_blocks_override=128, max_model_len=128,
               max_num_batched_tokens=512, disable_log_stats=True)


def _hf_prompt_logprobs(model_dir, token_ids):
    import torch
    from transformers import LlamaForCausalLM
    model = LlamaForCausalLM.from_pretrained(model_dir,
                                             torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        logits = model(torch.tensor([token_ids])).logits[0]
    lsm = torch.log_softmax(logits.float(), dim=-1)
    # Position i scores token i+1.
    return [float(lsm[i - 1, token_ids[i]])
            for i in range(1, len(token_ids))]


def test_prompt_logprobs_match_hf(tiny_llm):
    from vllm_quick_tpu import SamplingParams
    prompt = "hello there friend"
    out = tiny_llm.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=1, prompt_logprobs=2),
    )[0]
    token_ids = out.prompt_token_ids
    got = out.prompt_logprobs
    assert got is not None
    assert len(got) == len(token_ids)
    assert got[0] is None
    want = _hf_prompt_logprobs(tiny_llm.llm_engine.model_config.model,
                               token_ids)
    for j in range(1, len(token_ids)):
        entry = got[j]
        assert token_ids[j] in entry
        assert entry[token_ids[j]] == pytest.approx(want[j - 1],
                                                    abs=2e-2)
        # top-k entries present (plus possibly the actual token).
        assert len(entry) >= 2


def test_prompt_logprobs_off_by_default(tiny_llm):
    from vllm_quick_tpu import SamplingParams
    out = tiny_llm.generate(
        ["hi"], SamplingParams(temperature=0.0, max_tokens=1))[0]
    assert out.prompt_logprobs is None


def test_logits_processor_is_applied(tiny_llm):
    from vllm_quick_tpu import SamplingParams

    forced = 7

    def force_token(generated, logits):
        logits[:] = -1e9
        logits[forced] = 0.0
        return logits

    out = tiny_llm.generate(
        ["abc"],
        SamplingParams(temperature=0.0, max_tokens=4,
                       logits_processors=[force_token]),
    )[0]
    assert list(out.outputs[0].token_ids) == [forced] * 4
