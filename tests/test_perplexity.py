"""Perplexity harness vs HF ground truth on a tiny model."""
import numpy as np

from benchmarks.benchmark_perplexity import compute_perplexity
from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.model_loader import get_model


def test_perplexity_matches_hf():
    import math
    import torch
    from transformers import AutoModelForCausalLM

    d = make_tiny_llama_dir()
    mc = ModelConfig(model=d, dtype="float32")
    model, params = get_model(mc)

    rng = np.random.default_rng(0)
    token_ids = rng.integers(3, 250, size=100).tolist()

    ppl, n = compute_perplexity(model, params, token_ids, max_len=64,
                                stride=32)
    assert n == 99 - (64 - 32) * 0 or n > 0

    hf = AutoModelForCausalLM.from_pretrained(
        d, torch_dtype=torch.float32).eval()
    nll = 0.0
    count = 0
    with torch.no_grad():
        for start in range(0, len(token_ids) - 1, 32):
            window = token_ids[start:start + 64]
            if len(window) < 2:
                break
            logits = hf(torch.tensor([window])).logits[0]
            logp = torch.log_softmax(logits, dim=-1)
            first = 0 if start == 0 else 32
            t = torch.tensor(window[1:])
            token_nll = -logp[torch.arange(len(window) - 1), t]
            nll += float(token_nll[first:].sum())
            count += len(window) - 1 - first
            if start + 64 >= len(token_ids):
                break
    hf_ppl = math.exp(nll / count)
    # bf16 casts in compute_perplexity aren't used here (fp32 model);
    # tolerances cover accumulation-order differences.
    assert abs(ppl - hf_ppl) / hf_ppl < 0.02, (ppl, hf_ppl)
