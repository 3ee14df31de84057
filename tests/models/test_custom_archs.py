"""Trust-remote-code model families (no transformers class available):
validated by construction — fabricate each family's checkpoint layout
from a tiny Llama checkpoint and require exact logit equality with the
Llama module (these archs are Llama-equivalent modulo weight layout),
plus paged prefill/decode self-consistency for the rest.
"""
import json
import os
import shutil
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from tests.models.test_models_golden import (BLOCK, paged_greedy,
                                             run_prefill)
from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.model_loader import get_model
from vllm_quick_tpu.model_executor.weight_utils import collect_weights

PROMPT = [1, 7, 42, 3, 250, 99, 5, 11]


def _llama_weights(num_heads=4, num_kv=4):
    d = make_tiny_llama_dir(num_heads=num_heads, num_kv_heads=num_kv,
                            vocab_size=256, hidden_size=128,
                            intermediate_size=256,
                            key=f"custom_{num_heads}_{num_kv}")
    return d, collect_weights(d)


def _save_ckpt(weights, config_dict):
    import torch
    from safetensors.torch import save_file
    d = tempfile.mkdtemp(prefix="fab_ckpt_")
    save_file({k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in weights.items()},
              os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config_dict, f)
    return d


def _llama_reference_logits(llama_dir):
    mc = ModelConfig(model=llama_dir, dtype="float32")
    model, params = get_model(mc)
    logits, caches = run_prefill(model, params, PROMPT)
    toks = paged_greedy(model, params, caches, PROMPT,
                        int(np.argmax(logits[len(PROMPT) - 1])), 5)
    return logits, toks


def _run_model(ckpt_dir, trust_remote_code=True):
    mc = ModelConfig(model=ckpt_dir, dtype="float32",
                     trust_remote_code=trust_remote_code)
    model, params = get_model(mc)
    logits, caches = run_prefill(model, params, PROMPT)
    toks = paged_greedy(model, params, caches, PROMPT,
                        int(np.argmax(logits[len(PROMPT) - 1])), 5)
    return logits, toks


def test_baichuan_matches_llama_construction():
    llama_dir, w = _llama_weights()
    ref_logits, ref_toks = _llama_reference_logits(llama_dir)

    new = {}
    for k, v in w.items():
        if ".self_attn.q_proj." in k:
            pfx = k.split(".self_attn.")[0]
            q = w[f"{pfx}.self_attn.q_proj.weight"]
            kk = w[f"{pfx}.self_attn.k_proj.weight"]
            vv = w[f"{pfx}.self_attn.v_proj.weight"]
            new[f"{pfx}.self_attn.W_pack.weight"] = np.concatenate(
                [q, kk, vv], axis=0)
        elif ".self_attn.k_proj." in k or ".self_attn.v_proj." in k:
            continue
        else:
            new[k] = v
    cfg = {"model_type": "baichuan",
           "architectures": ["BaiChuanForCausalLM"],
           "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "rms_norm_eps": 1e-6,
           "max_position_embeddings": 128}
    d = _save_ckpt(new, cfg)
    logits, toks = _run_model(d)
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-4, atol=2e-4)
    assert toks == ref_toks


def test_internlm2_matches_llama_construction():
    llama_dir, w = _llama_weights(num_heads=4, num_kv=2)
    ref_logits, ref_toks = _llama_reference_logits(llama_dir)

    hd = 32
    h, kv = 4, 2
    q_per = h // kv
    new = {}
    for i in range(2):
        pfx = f"model.layers.{i}"
        q = w[f"{pfx}.self_attn.q_proj.weight"].reshape(h, hd, 128)
        kk = w[f"{pfx}.self_attn.k_proj.weight"].reshape(kv, hd, 128)
        vv = w[f"{pfx}.self_attn.v_proj.weight"].reshape(kv, hd, 128)
        groups = []
        for g in range(kv):
            groups.append(q[g * q_per:(g + 1) * q_per])
            groups.append(kk[g:g + 1])
            groups.append(vv[g:g + 1])
        wqkv = np.concatenate(groups, axis=0).reshape(-1, 128)
        new[f"{pfx}.attention.wqkv.weight"] = wqkv
        new[f"{pfx}.attention.wo.weight"] = \
            w[f"{pfx}.self_attn.o_proj.weight"]
        new[f"{pfx}.feed_forward.w1.weight"] = \
            w[f"{pfx}.mlp.gate_proj.weight"]
        new[f"{pfx}.feed_forward.w3.weight"] = \
            w[f"{pfx}.mlp.up_proj.weight"]
        new[f"{pfx}.feed_forward.w2.weight"] = \
            w[f"{pfx}.mlp.down_proj.weight"]
        new[f"{pfx}.attention_norm.weight"] = \
            w[f"{pfx}.input_layernorm.weight"]
        new[f"{pfx}.ffn_norm.weight"] = \
            w[f"{pfx}.post_attention_layernorm.weight"]
    new["model.tok_embeddings.weight"] = w["model.embed_tokens.weight"]
    new["model.norm.weight"] = w["model.norm.weight"]
    new["output.weight"] = w["lm_head.weight"]
    cfg = {"model_type": "internlm2",
           "architectures": ["InternLM2ForCausalLM"],
           "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "num_key_value_heads": 2,
           "rms_norm_eps": 1e-6, "max_position_embeddings": 128,
           "rope_theta": 10000.0}
    d = _save_ckpt(new, cfg)
    logits, toks = _run_model(d)
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-4, atol=2e-4)
    assert toks == ref_toks


def test_qwen_matches_llama_construction():
    llama_dir, w = _llama_weights()
    ref_logits, ref_toks = _llama_reference_logits(llama_dir)

    new = {"transformer.wte.weight": w["model.embed_tokens.weight"],
           "transformer.ln_f.weight": w["model.norm.weight"],
           "lm_head.weight": w["lm_head.weight"]}
    for i in range(2):
        lp = f"model.layers.{i}"
        qp = f"transformer.h.{i}"
        new[f"{qp}.attn.c_attn.weight"] = np.concatenate(
            [w[f"{lp}.self_attn.q_proj.weight"],
             w[f"{lp}.self_attn.k_proj.weight"],
             w[f"{lp}.self_attn.v_proj.weight"]], axis=0)
        new[f"{qp}.attn.c_proj.weight"] = \
            w[f"{lp}.self_attn.o_proj.weight"]
        new[f"{qp}.mlp.w2.weight"] = w[f"{lp}.mlp.gate_proj.weight"]
        new[f"{qp}.mlp.w1.weight"] = w[f"{lp}.mlp.up_proj.weight"]
        new[f"{qp}.mlp.c_proj.weight"] = w[f"{lp}.mlp.down_proj.weight"]
        new[f"{qp}.ln_1.weight"] = w[f"{lp}.input_layernorm.weight"]
        new[f"{qp}.ln_2.weight"] = \
            w[f"{lp}.post_attention_layernorm.weight"]
    cfg = {"model_type": "qwen", "architectures": ["QWenLMHeadModel"],
           "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4, "layer_norm_epsilon": 1e-6,
           "max_position_embeddings": 128, "rotary_emb_base": 10000,
           "seq_length": 128}
    d = _save_ckpt(new, cfg)
    logits, toks = _run_model(d)
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-4, atol=2e-4)
    assert toks == ref_toks


def test_decilm_uniform_matches_llama():
    llama_dir, w = _llama_weights(num_heads=4, num_kv=2)
    ref_logits, ref_toks = _llama_reference_logits(llama_dir)
    d = tempfile.mkdtemp(prefix="decilm_")
    for f in os.listdir(llama_dir):
        if f.startswith(("model", "config")):
            shutil.copy(os.path.join(llama_dir, f), d)
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    cfg["architectures"] = ["DeciLMForCausalLM"]
    cfg["num_key_value_heads_per_layer"] = [2, 2]
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    logits, toks = _run_model(d, trust_remote_code=False)
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-4, atol=2e-4)
    assert toks == ref_toks


def test_decilm_variable_gqa_runs():
    llama_dir, w = _llama_weights(num_heads=4, num_kv=2)
    hd = 32
    new = dict(w)
    # Layer 1 gets 1 kv head: keep only its first head's k/v rows.
    for proj in ("k_proj", "v_proj"):
        name = f"model.layers.1.self_attn.{proj}.weight"
        new[name] = w[name][:hd]
    cfg = {"model_type": "llama", "architectures": ["DeciLMForCausalLM"],
           "vocab_size": 256, "hidden_size": 128,
           "intermediate_size": 256, "num_hidden_layers": 2,
           "num_attention_heads": 4,
           "num_key_value_heads_per_layer": [2, 1],
           "rms_norm_eps": 1e-6, "max_position_embeddings": 128}
    d = _save_ckpt(new, cfg)
    logits, toks = _run_model(d, trust_remote_code=False)
    assert np.all(np.isfinite(logits))
    assert len(toks) == 5


def test_chatglm_prefill_decode_consistency():
    """No public HF class for ChatGLM: check internal consistency —
    paged decode logits must equal full-prefill logits position by
    position (catches cache layout / rotary errors)."""
    rng = np.random.default_rng(0)
    e, h, kv, hd, ffn, vocab = 128, 4, 2, 32, 128, 256

    def rnd(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    new = {"transformer.embedding.word_embeddings.weight": rnd(vocab, e),
           "transformer.encoder.final_layernorm.weight": np.ones(
               e, np.float32),
           "transformer.output_layer.weight": rnd(vocab, e)}
    for i in range(2):
        pfx = f"transformer.encoder.layers.{i}"
        new[f"{pfx}.self_attention.query_key_value.weight"] = rnd(
            (h + 2 * kv) * hd, e)
        new[f"{pfx}.self_attention.query_key_value.bias"] = rnd(
            (h + 2 * kv) * hd)
        new[f"{pfx}.self_attention.dense.weight"] = rnd(e, e)
        new[f"{pfx}.mlp.dense_h_to_4h.weight"] = rnd(2 * ffn, e)
        new[f"{pfx}.mlp.dense_4h_to_h.weight"] = rnd(e, ffn)
        new[f"{pfx}.input_layernorm.weight"] = np.ones(e, np.float32)
        new[f"{pfx}.post_attention_layernorm.weight"] = np.ones(
            e, np.float32)
    cfg = {"model_type": "chatglm",
           "architectures": ["ChatGLMModel"],
           "num_layers": 2, "padded_vocab_size": vocab,
           "hidden_size": e, "ffn_hidden_size": ffn,
           "num_attention_heads": h, "multi_query_attention": True,
           "multi_query_group_num": kv, "kv_channels": hd,
           "seq_length": 128, "add_qkv_bias": True}
    d = _save_ckpt(new, cfg)
    mc = ModelConfig(model=d, dtype="float32", trust_remote_code=True)
    model, params = get_model(mc)

    full_logits, _ = run_prefill(model, params, PROMPT)

    # Re-run with prefill of PROMPT[:-1], then decode the last token:
    # its logits must match full prefill's last row.
    short_logits, caches = run_prefill(model, params, PROMPT[:-1])
    from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
    pos = len(PROMPT) - 1
    slot = (1 + pos // BLOCK) * BLOCK + pos % BLOCK
    meta = InputMetadata(
        is_prompt=False,
        slot_mapping=jnp.asarray([slot], jnp.int32),
        context_lens=jnp.asarray([len(PROMPT)], jnp.int32),
        block_tables=jnp.asarray([[1 + j for j in range(8)]], jnp.int32))
    hidden, _ = model.forward(params,
                              jnp.asarray([PROMPT[-1]], jnp.int32),
                              jnp.asarray([pos], jnp.int32), caches, meta)
    dec_logits = np.asarray(model.compute_logits(params, hidden)[0],
                            np.float32)
    np.testing.assert_allclose(dec_logits, full_logits[-1],
                               rtol=2e-4, atol=2e-4)


def test_deepseek_moe_consistency():
    """DeepSeek-MoE (shared experts + dense first layer): paged decode
    logits must equal full-prefill logits (no HF class available)."""
    rng = np.random.default_rng(0)
    e, h, kv, hd, ffn, moe_ffn, vocab, ne = 128, 4, 2, 32, 128, 64, 256, 4

    def rnd(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    new = {"model.embed_tokens.weight": rnd(vocab, e),
           "model.norm.weight": np.ones(e, np.float32),
           "lm_head.weight": rnd(vocab, e)}
    for i in range(2):
        pfx = f"model.layers.{i}"
        for p, shape in (("q_proj", (h * hd, e)),
                         ("k_proj", (kv * hd, e)),
                         ("v_proj", (kv * hd, e)),
                         ("o_proj", (e, h * hd))):
            new[f"{pfx}.self_attn.{p}.weight"] = rnd(*shape)
        new[f"{pfx}.input_layernorm.weight"] = np.ones(e, np.float32)
        new[f"{pfx}.post_attention_layernorm.weight"] = np.ones(
            e, np.float32)
        if i == 0:
            # dense layer (first_k_dense_replace=1)
            new[f"{pfx}.mlp.gate_proj.weight"] = rnd(ffn, e)
            new[f"{pfx}.mlp.up_proj.weight"] = rnd(ffn, e)
            new[f"{pfx}.mlp.down_proj.weight"] = rnd(e, ffn)
        else:
            new[f"{pfx}.mlp.gate.weight"] = rnd(ne, e)
            for x in range(ne):
                new[f"{pfx}.mlp.experts.{x}.gate_proj.weight"] = rnd(
                    moe_ffn, e)
                new[f"{pfx}.mlp.experts.{x}.up_proj.weight"] = rnd(
                    moe_ffn, e)
                new[f"{pfx}.mlp.experts.{x}.down_proj.weight"] = rnd(
                    e, moe_ffn)
            new[f"{pfx}.mlp.shared_experts.gate_proj.weight"] = rnd(
                moe_ffn, e)
            new[f"{pfx}.mlp.shared_experts.up_proj.weight"] = rnd(
                moe_ffn, e)
            new[f"{pfx}.mlp.shared_experts.down_proj.weight"] = rnd(
                e, moe_ffn)
    cfg = {"model_type": "deepseek",
           "architectures": ["DeepseekForCausalLM"],
           "vocab_size": vocab, "hidden_size": e,
           "intermediate_size": ffn, "moe_intermediate_size": moe_ffn,
           "num_hidden_layers": 2, "num_attention_heads": h,
           "num_key_value_heads": kv, "n_routed_experts": ne,
           "num_experts_per_tok": 2, "n_shared_experts": 1,
           "first_k_dense_replace": 1, "moe_layer_freq": 1,
           "rms_norm_eps": 1e-6, "max_position_embeddings": 128}
    d = _save_ckpt(new, cfg)
    mc = ModelConfig(model=d, dtype="float32", trust_remote_code=True)
    model, params = get_model(mc)

    full_logits, _ = run_prefill(model, params, PROMPT)
    short_logits, caches = run_prefill(model, params, PROMPT[:-1])
    from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
    pos = len(PROMPT) - 1
    slot = (1 + pos // BLOCK) * BLOCK + pos % BLOCK
    meta = InputMetadata(
        is_prompt=False,
        slot_mapping=jnp.asarray([slot], jnp.int32),
        context_lens=jnp.asarray([len(PROMPT)], jnp.int32),
        block_tables=jnp.asarray([[1 + j for j in range(8)]], jnp.int32))
    hidden, _ = model.forward(params,
                              jnp.asarray([PROMPT[-1]], jnp.int32),
                              jnp.asarray([pos], jnp.int32), caches, meta)
    dec_logits = np.asarray(model.compute_logits(params, hidden)[0],
                            np.float32)
    np.testing.assert_allclose(dec_logits, full_logits[-1],
                               rtol=2e-4, atol=2e-4)
