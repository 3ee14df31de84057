"""Golden-token tests across model families vs HuggingFace
(the no-network analogue of the reference's tests/models/test_models.py
13-model greedy comparison): prefill logits must match HF fp32, and
paged greedy decode must produce identical tokens.
"""
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.model_loader import get_model

BLOCK = 16


def _gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel
    cfg = GPT2Config(vocab_size=256, n_embd=128, n_layer=2, n_head=4,
                     n_positions=128, n_inner=256)
    return cfg, GPT2LMHeadModel(cfg)


def _opt():
    from transformers import OPTConfig, OPTForCausalLM
    cfg = OPTConfig(vocab_size=256, hidden_size=128, num_hidden_layers=2,
                    num_attention_heads=4, ffn_dim=256,
                    max_position_embeddings=128, word_embed_proj_dim=128,
                    do_layer_norm_before=True)
    return cfg, OPTForCausalLM(cfg)


def _gpt_neox_parallel():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    cfg = GPTNeoXConfig(vocab_size=256, hidden_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=256, rotary_pct=0.25,
                        max_position_embeddings=128,
                        use_parallel_residual=True)
    return cfg, GPTNeoXForCausalLM(cfg)


def _gpt_neox_sequential():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    cfg = GPTNeoXConfig(vocab_size=256, hidden_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=256, rotary_pct=1.0,
                        max_position_embeddings=128,
                        use_parallel_residual=False)
    return cfg, GPTNeoXForCausalLM(cfg)


def _gptj():
    from transformers import GPTJConfig, GPTJForCausalLM
    cfg = GPTJConfig(vocab_size=256, n_embd=128, n_layer=2, n_head=4,
                     rotary_dim=16, n_positions=128, n_inner=256)
    return cfg, GPTJForCausalLM(cfg)


def _qwen2():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    cfg = Qwen2Config(vocab_size=256, hidden_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, intermediate_size=256,
                      max_position_embeddings=128,
                      tie_word_embeddings=False)
    return cfg, Qwen2ForCausalLM(cfg)


def _gpt_bigcode():
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM
    cfg = GPTBigCodeConfig(vocab_size=256, n_embd=128, n_layer=2, n_head=4,
                           n_positions=128, n_inner=256, multi_query=True,
                           activation_function="gelu_pytorch_tanh")
    return cfg, GPTBigCodeForCausalLM(cfg)


def _phi():
    from transformers import PhiConfig, PhiForCausalLM
    cfg = PhiConfig(vocab_size=256, hidden_size=128, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=256,
                    partial_rotary_factor=0.5,
                    max_position_embeddings=128)
    return cfg, PhiForCausalLM(cfg)


def _bloom():
    from transformers import BloomConfig, BloomForCausalLM
    cfg = BloomConfig(vocab_size=256, hidden_size=128, n_layer=2, n_head=4)
    return cfg, BloomForCausalLM(cfg)


def _falcon_mq():
    from transformers import FalconConfig, FalconForCausalLM
    cfg = FalconConfig(vocab_size=256, hidden_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       new_decoder_architecture=False, multi_query=True,
                       parallel_attn=True, bias=False, alibi=False)
    return cfg, FalconForCausalLM(cfg)


def _falcon_new():
    from transformers import FalconConfig, FalconForCausalLM
    cfg = FalconConfig(vocab_size=256, hidden_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       new_decoder_architecture=True, num_kv_heads=2,
                       bias=False, alibi=False)
    return cfg, FalconForCausalLM(cfg)


def _stablelm():
    from transformers import StableLmConfig, StableLmForCausalLM
    cfg = StableLmConfig(vocab_size=256, hidden_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, intermediate_size=256,
                         partial_rotary_factor=0.25,
                         max_position_embeddings=128)
    return cfg, StableLmForCausalLM(cfg)


def _mpt():
    from transformers import MptConfig, MptForCausalLM
    cfg = MptConfig(d_model=128, n_heads=4, n_layers=2,
                    expansion_ratio=2, vocab_size=256,
                    max_seq_len=128)
    return cfg, MptForCausalLM(cfg)


FAMILIES = {
    "gpt2": _gpt2,
    "opt": _opt,
    "gpt_neox_parallel": _gpt_neox_parallel,
    "gpt_neox_sequential": _gpt_neox_sequential,
    "gptj": _gptj,
    "qwen2": _qwen2,
    "gpt_bigcode": _gpt_bigcode,
    "phi": _phi,
    "bloom": _bloom,
    "falcon_mq": _falcon_mq,
    "falcon_new": _falcon_new,
    "stablelm": _stablelm,
    "mpt": _mpt,
}


def _save(builder):
    import torch
    torch.manual_seed(0)
    cfg, model = builder()
    model = model.to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_model_")
    model.save_pretrained(d, safe_serialization=True)
    return d, model, cfg


def run_prefill(model, params, token_ids, num_blocks=32):
    l = len(token_ids)
    caches = [jnp.zeros(model.kv_cache_shape(num_blocks, BLOCK),
                        jnp.float32)
              for _ in range(model.num_layers)]
    ids = jnp.asarray([token_ids], jnp.int32)
    pos = jnp.arange(l, dtype=jnp.int32)[None, :]
    slots = jnp.asarray(
        [[(1 + t // BLOCK) * BLOCK + t % BLOCK for t in range(l)]],
        jnp.int32)
    meta = InputMetadata(is_prompt=True, slot_mapping=slots,
                         prompt_lens=jnp.asarray([l], jnp.int32))
    hidden, caches = model.forward(params, ids, pos, caches, meta)
    logits = model.compute_logits(params, hidden)
    return np.asarray(logits[0], np.float32), caches


def paged_greedy(model, params, caches, prompt, first_token, n_steps):
    out = [first_token]
    ctx = len(prompt)
    token = first_token
    for _ in range(n_steps - 1):
        pos = ctx
        ctx += 1
        slot = (1 + pos // BLOCK) * BLOCK + pos % BLOCK
        meta = InputMetadata(
            is_prompt=False,
            slot_mapping=jnp.asarray([slot], jnp.int32),
            context_lens=jnp.asarray([ctx], jnp.int32),
            block_tables=jnp.asarray([[1 + j for j in range(8)]],
                                     jnp.int32))
        hidden, caches = model.forward(
            params, jnp.asarray([token], jnp.int32),
            jnp.asarray([pos], jnp.int32), caches, meta)
        logits = model.compute_logits(params, hidden)
        token = int(np.argmax(np.asarray(logits[0], np.float32)))
        out.append(token)
    return out


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_family_matches_hf(family):
    import torch
    d, hf_model, cfg = _save(FAMILIES[family])
    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)
    model, params = get_model(mc)

    prompt = [1, 7, 42, 3, 250, 99, 5, 11]
    ours, caches = run_prefill(model, params, prompt)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)

    # Greedy continuation: ours via paged decode, HF via full re-forward.
    n_steps = 6
    seq = list(prompt)
    hf_new = []
    with torch.no_grad():
        for _ in range(n_steps):
            logits = hf_model(torch.tensor([seq])).logits[0, -1].numpy()
            tok = int(np.argmax(logits))
            hf_new.append(tok)
            seq.append(tok)
    ours_new = paged_greedy(model, params, caches, prompt,
                            int(np.argmax(ours[len(prompt) - 1])), n_steps)
    assert ours_new == hf_new, (family, ours_new, hf_new)


def test_mistral_sliding_window_matches_hf():
    """Sliding-window attention (reference: tests/models/test_mistral.py)
    with a window smaller than the prompt so it actually clips."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM
    cfg = MistralConfig(vocab_size=256, hidden_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, intermediate_size=256,
                        max_position_embeddings=128, sliding_window=8,
                        tie_word_embeddings=False,
                        attn_implementation="eager")
    torch.manual_seed(0)
    hf_model = MistralForCausalLM(cfg).to(torch.float32).eval()
    import tempfile
    d = tempfile.mkdtemp(prefix="tiny_mistral_")
    hf_model.save_pretrained(d, safe_serialization=True)

    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)
    model, params = get_model(mc)
    assert model.sliding_window == 8

    prompt = list(range(3, 3 + 24))   # 24 tokens > window 8
    ours, caches = run_prefill(model, params, prompt)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
