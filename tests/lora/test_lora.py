"""Multi-LoRA serving (reference: tests/lora/ — layer math vs reference
torch LoRA, manager LRU, end-to-end adapter generation).

Ground truth by construction: generation with an adapter must equal
generation from a checkpoint whose weights were merged offline
(W' = W + scaling * B @ A).
"""
import json
import os
import tempfile

import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.lora.request import LoRARequest

RANK = 8
ALPHA = 16
TARGETS = ["q_proj", "v_proj", "gate_proj", "down_proj"]


def _make_adapter(llama_dir: str, seed: int):
    """PEFT-format adapter + the equivalent merged checkpoint."""
    import torch
    from safetensors.numpy import load_file, save_file

    rng = np.random.default_rng(seed)
    weights = {}
    for f in os.listdir(llama_dir):
        if f.endswith(".safetensors"):
            weights.update(load_file(os.path.join(llama_dir, f)))

    adapter = {}
    merged = dict(weights)
    scaling = ALPHA / RANK
    for name, w in weights.items():
        if not name.endswith(".weight"):
            continue
        module = name.rsplit(".", 2)[-2]
        if module not in TARGETS or ".layers." not in name:
            continue
        n, k = w.shape
        a = (rng.standard_normal((RANK, k)) * 0.05).astype(np.float32)
        b = (rng.standard_normal((n, RANK)) * 0.05).astype(np.float32)
        base = "base_model.model." + name[:-len(".weight")]
        adapter[f"{base}.lora_A.weight"] = a
        adapter[f"{base}.lora_B.weight"] = b
        merged[name] = (w.astype(np.float32)
                        + scaling * (b @ a)).astype(w.dtype)

    ad = tempfile.mkdtemp(prefix=f"adapter_{seed}_")
    save_file(adapter, os.path.join(ad, "adapter_model.safetensors"))
    with open(os.path.join(ad, "adapter_config.json"), "w") as f:
        json.dump({"r": RANK, "lora_alpha": ALPHA,
                   "target_modules": TARGETS,
                   "peft_type": "LORA"}, f)

    md = tempfile.mkdtemp(prefix=f"merged_{seed}_")
    save_file(merged, os.path.join(md, "model.safetensors"))
    for f in ("config.json", "tokenizer.json", "tokenizer_config.json",
              "special_tokens_map.json"):
        src = os.path.join(llama_dir, f)
        if os.path.exists(src):
            import shutil
            shutil.copy(src, md)
    return ad, md


def test_bgmv_matches_loop(rng):
    import jax.numpy as jnp
    from vllm_quick_tpu.ops.bgmv import bgmv
    t, k, n, l, r = 5, 16, 24, 3, 4
    x = rng.standard_normal((t, k)).astype(np.float32)
    a = rng.standard_normal((l, k, r)).astype(np.float32)
    b = rng.standard_normal((l, r, n)).astype(np.float32)
    idx = np.asarray([0, 2, -1, 1, 2], np.int32)
    got = np.asarray(bgmv(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b),
                          jnp.asarray(idx)))
    want = np.zeros((t, n), np.float32)
    for i in range(t):
        if idx[i] >= 0:
            want[i] = x[i] @ a[idx[i]] @ b[idx[i]]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def lora_setup():
    from vllm_quick_tpu import LLM, SamplingParams
    llama_dir = make_tiny_llama_dir(key="lora_base")
    ad1, md1 = _make_adapter(llama_dir, seed=1)
    ad2, md2 = _make_adapter(llama_dir, seed=2)
    llm = LLM(model=llama_dir, dtype="float32", max_model_len=256,
              enable_lora=True, max_loras=2, max_lora_rank=8,
              disable_log_stats=True)
    return llm, llama_dir, (ad1, md1), (ad2, md2)


def _merged_tokens(md, prompts, params):
    from vllm_quick_tpu import LLM
    llm = LLM(model=md, tokenizer=md, dtype="float32", max_model_len=256,
              disable_log_stats=True)
    return [o.outputs[0].token_ids for o in llm.generate(prompts, params)]


def test_lora_matches_merged_checkpoint(lora_setup):
    from vllm_quick_tpu import SamplingParams
    llm, llama_dir, (ad1, md1), _ = lora_setup
    prompts = ["the quick brown fox", "hello world says"]
    params = SamplingParams(temperature=0.0, max_tokens=6)

    req = LoRARequest("a1", 1, ad1)
    got = [o.outputs[0].token_ids
           for o in llm.generate(prompts, params, lora_request=req)]
    want = _merged_tokens(md1, prompts, params)
    assert got == want

    # Base model (no adapter) still un-adapted and differs from lora.
    base = [o.outputs[0].token_ids for o in llm.generate(prompts, params)]
    base2 = _merged_tokens(llama_dir, prompts, params)
    assert base == base2


def test_second_adapter_and_eviction(lora_setup):
    from vllm_quick_tpu import SamplingParams
    llm, _, (ad1, md1), (ad2, md2) = lora_setup
    prompts = ["numbers one two three"]
    params = SamplingParams(temperature=0.0, max_tokens=6)

    req2 = LoRARequest("a2", 2, ad2)
    got2 = [o.outputs[0].token_ids
            for o in llm.generate(prompts, params, lora_request=req2)]
    assert got2 == _merged_tokens(md2, prompts, params)

    # Back to adapter 1 (may require slot reuse).
    req1 = LoRARequest("a1", 1, ad1)
    got1 = [o.outputs[0].token_ids
            for o in llm.generate(prompts, params, lora_request=req1)]
    assert got1 == _merged_tokens(md1, prompts, params)

    ids = llm.llm_engine.list_loras()
    assert 1 in ids
    assert llm.llm_engine.remove_lora(1)
    assert 1 not in llm.llm_engine.list_loras()


# -- embedding / lm_head / extra-vocab adapters (reference:
# vllm/lora/layers.py:147-280,783-944, lora_extra_vocab_size) ----------

EXTRA = 4


def _make_embed_adapter(llama_dir: str, seed: int):
    """PEFT adapter with embed_tokens + lm_head LoRA and EXTRA added
    tokens (new_embeddings.safetensors), plus the equivalent merged
    checkpoint with an extended vocab."""
    from safetensors.numpy import load_file, save_file

    rng = np.random.default_rng(seed)
    weights = {}
    for f in os.listdir(llama_dir):
        if f.endswith(".safetensors"):
            weights.update(load_file(os.path.join(llama_dir, f)))
    w_e = weights["model.embed_tokens.weight"].astype(np.float32)  # [V,E]
    w_h = weights["lm_head.weight"].astype(np.float32)             # [V,E]
    v, e = w_e.shape
    scaling = ALPHA / RANK

    # Embedding LoRA over the EXTENDED vocab (PEFT lora_embedding_A/B
    # layout: A [r, V+X], B [E, r]).
    a_e = (rng.standard_normal((RANK, v + EXTRA)) * 0.05).astype(np.float32)
    b_e = (rng.standard_normal((e, RANK)) * 0.05).astype(np.float32)
    # lm_head LoRA (linear layout: lora_A [r, E], lora_B [V+X, r]).
    a_h = (rng.standard_normal((RANK, e)) * 0.05).astype(np.float32)
    b_h = (rng.standard_normal((v + EXTRA, RANK)) * 0.05).astype(np.float32)
    # Added-token embeddings.
    inp = (rng.standard_normal((EXTRA, e)) * 0.5).astype(np.float32)
    out = (rng.standard_normal((EXTRA, e)) * 0.5).astype(np.float32)

    adapter = {
        "base_model.model.model.embed_tokens.lora_embedding_A": a_e,
        "base_model.model.model.embed_tokens.lora_embedding_B": b_e,
        "base_model.model.lm_head.lora_A.weight": a_h,
        "base_model.model.lm_head.lora_B.weight": b_h,
    }
    ad = tempfile.mkdtemp(prefix=f"adapter_ev_{seed}_")
    save_file(adapter, os.path.join(ad, "adapter_model.safetensors"))
    save_file({"input_embeddings": inp, "output_embeddings": out},
              os.path.join(ad, "new_embeddings.safetensors"))
    with open(os.path.join(ad, "adapter_config.json"), "w") as f:
        json.dump({"r": RANK, "lora_alpha": ALPHA,
                   "target_modules": ["embed_tokens", "lm_head"],
                   "peft_type": "LORA"}, f)

    # Merged checkpoint with vocab V+EXTRA.
    merged = dict(weights)
    w_e_ext = np.concatenate([w_e, inp], axis=0)
    w_e_ext = w_e_ext + scaling * (a_e.T @ b_e.T)      # [V+X, E]
    w_h_ext = np.concatenate([w_h, out], axis=0)
    w_h_ext = w_h_ext + scaling * (b_h @ a_h)          # [V+X, E]
    merged["model.embed_tokens.weight"] = w_e_ext.astype(np.float32)
    merged["lm_head.weight"] = w_h_ext.astype(np.float32)
    md = tempfile.mkdtemp(prefix=f"merged_ev_{seed}_")
    save_file(merged, os.path.join(md, "model.safetensors"))
    import shutil
    for f in ("config.json", "tokenizer.json", "tokenizer_config.json",
              "special_tokens_map.json"):
        src = os.path.join(llama_dir, f)
        if os.path.exists(src):
            shutil.copy(src, md)
    with open(os.path.join(md, "config.json")) as f:
        cfg = json.load(f)
    cfg["vocab_size"] = v + EXTRA
    with open(os.path.join(md, "config.json"), "w") as f:
        json.dump(cfg, f)
    return ad, md


def test_embedding_lm_head_lora_extra_vocab():
    """Adapter with embed/lm_head LoRA + added tokens generates the
    same greedy tokens as the offline-merged extended-vocab model —
    including prompts that USE the added token ids (>= vocab_size)."""
    from vllm_quick_tpu import LLM, SamplingParams
    llama_dir = make_tiny_llama_dir(key="lora_embed_base")
    ad, md = _make_embed_adapter(llama_dir, seed=7)
    v = 512

    llm = LLM(model=llama_dir, dtype="float32", max_model_len=256,
              enable_lora=True, max_loras=2, max_lora_rank=8,
              lora_extra_vocab_size=EXTRA, disable_log_stats=True)
    params = SamplingParams(temperature=0.0, max_tokens=6)
    # Prompt mixes base tokens and every added token id.
    prompt_ids = [[5, 17, v, v + 1, 9, v + 3],
                  [3, 4, 5, v + 2]]

    req = LoRARequest("ev", 1, ad)
    got = [o.outputs[0].token_ids
           for o in llm.generate(prompt_token_ids=prompt_ids,
                                 sampling_params=params,
                                 lora_request=req)]

    mllm = LLM(model=md, tokenizer=md, dtype="float32",
               max_model_len=256, disable_log_stats=True)
    want = [o.outputs[0].token_ids
            for o in mllm.generate(prompt_token_ids=prompt_ids,
                                   sampling_params=params)]
    assert got == want

    # Base-model behaviour (no adapter) is unchanged on base-vocab
    # prompts, and extra columns never win the argmax.
    base_ids = [[5, 17, 9, 12]]
    base = [o.outputs[0].token_ids
            for o in llm.generate(prompt_token_ids=base_ids,
                                  sampling_params=params)]
    bllm = LLM(model=llama_dir, dtype="float32", max_model_len=256,
               disable_log_stats=True)
    want_base = [o.outputs[0].token_ids
                 for o in bllm.generate(prompt_token_ids=base_ids,
                                        sampling_params=params)]
    assert base == want_base
    assert all(t < v for ts in base for t in ts)
