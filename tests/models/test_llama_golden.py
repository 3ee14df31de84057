"""Golden-token test: our functional Llama vs HuggingFace transformers
on a tiny random-weight checkpoint (the no-network analogue of the
reference's HF-vs-vLLM greedy comparison, tests/models/test_models.py).
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.model_loader import get_model
from vllm_quick_tpu.ops.cache_ops import NULL_BLOCK


@pytest.fixture(scope="module")
def tiny_llama_dir():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model = model.to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_llama_")
    model.save_pretrained(d, safe_serialization=True)
    yield d, model, cfg


def run_prefill(model, params, token_ids, block_size=16, num_blocks=32):
    """Single-sequence prefill; returns logits for every position."""
    l = len(token_ids)
    kv_caches = [
        jnp.zeros(model.kv_cache_shape(num_blocks, block_size),
                  dtype=jnp.float32)
        for _ in range(model.num_layers)
    ]
    ids = jnp.asarray([token_ids], dtype=jnp.int32)
    pos = jnp.arange(l, dtype=jnp.int32)[None, :]
    slots = jnp.asarray(
        [[(1 + t // block_size) * block_size + t % block_size
          for t in range(l)]], dtype=jnp.int32)
    meta = InputMetadata(is_prompt=True, slot_mapping=slots,
                         prompt_lens=jnp.asarray([l], jnp.int32))
    hidden, kv_caches = model.forward(params, ids, pos, kv_caches, meta)
    logits = model.compute_logits(params, hidden)
    return np.asarray(logits[0], dtype=np.float32), kv_caches


def test_prefill_logits_match_hf(tiny_llama_dir):
    import torch
    d, hf_model, cfg = tiny_llama_dir
    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)
    model, params = get_model(mc)
    prompt = [1, 5, 9, 200, 33, 17, 2, 99]
    ours, _ = run_prefill(model, params, prompt)

    with torch.no_grad():
        hf_out = hf_model(torch.tensor([prompt])).logits[0].numpy()
    np.testing.assert_allclose(ours, hf_out, rtol=2e-3, atol=2e-3)


def test_greedy_decode_matches_hf(tiny_llama_dir):
    import torch
    d, hf_model, cfg = tiny_llama_dir
    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)
    model, params = get_model(mc)
    block_size = 16
    prompt = [1, 7, 42, 3, 250]
    n_steps = 8

    # HF greedy
    with torch.no_grad():
        hf_ids = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=n_steps, do_sample=False,
            num_beams=1, pad_token_id=0)[0].tolist()
    hf_new = hf_ids[len(prompt):]

    # ours: prefill then paged decode
    logits, kv_caches = run_prefill(model, params, prompt,
                                    block_size=block_size)
    ours_new = []
    ctx = len(prompt)
    token = int(np.argmax(logits[ctx - 1]))
    ours_new.append(token)
    for _ in range(n_steps - 1):
        pos = ctx
        ctx += 1
        blk = 1 + pos // block_size
        slot = blk * block_size + pos % block_size
        bt = [[1 + j for j in range(8)]]
        meta = InputMetadata(
            is_prompt=False,
            slot_mapping=jnp.asarray([slot], jnp.int32),
            context_lens=jnp.asarray([ctx], jnp.int32),
            block_tables=jnp.asarray(bt, jnp.int32))
        hidden, kv_caches = model.forward(
            params, jnp.asarray([token], jnp.int32),
            jnp.asarray([pos], jnp.int32), kv_caches, meta)
        logit = model.compute_logits(params, hidden)
        token = int(np.argmax(np.asarray(logit[0], np.float32)))
        ours_new.append(token)

    assert ours_new == hf_new


def test_quantized_forward_close_to_dense(tiny_llama_dir):
    """Quantize-on-the-fly: int4 model logits stay close in rank order."""
    d, hf_model, cfg = tiny_llama_dir
    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)
    model, params = get_model(mc)

    from vllm_quick_tpu.model_executor.param_builder import ParamBuilder
    from vllm_quick_tpu.model_executor.weight_utils import collect_weights
    weights = collect_weights(d)
    pb = ParamBuilder(weights, None, "float32")
    qparams = dict(params)
    qlayers = []
    for i, layer in enumerate(params["layers"]):
        pfx = f"model.layers.{i}"
        ql = dict(layer)
        ql["qkv"] = pb.quantize_dense([f"{pfx}.self_attn.q_proj",
                                       f"{pfx}.self_attn.k_proj",
                                       f"{pfx}.self_attn.v_proj"])
        ql["gate_up"] = pb.quantize_dense([f"{pfx}.mlp.gate_proj",
                                           f"{pfx}.mlp.up_proj"])
        ql["o"] = pb.quantize_dense([f"{pfx}.self_attn.o_proj"],
                                    shard="row")
        ql["down"] = pb.quantize_dense([f"{pfx}.mlp.down_proj"],
                                       shard="row")
        qlayers.append(ql)
    qparams["layers"] = qlayers

    prompt = [1, 5, 9, 200, 33, 17, 2, 99]
    dense_logits, _ = run_prefill(model, params, prompt)
    quant_logits, _ = run_prefill(model, qparams, prompt)
    # int4 error is bounded; argmax of the last position should agree for
    # a random tiny model at fp32 activations most of the time. Use a
    # loose correlation check instead of exact equality.
    dl = dense_logits[-1]
    ql_ = quant_logits[-1]
    corr = np.corrcoef(dl, ql_)[0, 1]
    assert corr > 0.99, corr


def test_greedy_decode_fused_attn_matches_hf(tiny_llama_dir, monkeypatch):
    """The fused rope+write+attend decode path (TPU default; forced on
    here via interpret) must be token-identical to HF greedy decode —
    the end-to-end guard over the kernel-level equivalence test."""
    import functools
    import torch

    import vllm_quick_tpu.ops.paged_attention as pa

    monkeypatch.setattr(pa, "use_pallas_attention",
                        lambda *a, **k: True)
    monkeypatch.setattr(
        pa, "paged_decode_attention_fused",
        functools.partial(pa.paged_decode_attention_fused,
                          interpret=True))

    d, hf_model, cfg = tiny_llama_dir
    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)
    model, params = get_model(mc)
    block_size = 16
    prompt = [1, 7, 42, 3, 250]
    n_steps = 6

    with torch.no_grad():
        hf_ids = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=n_steps,
            do_sample=False, num_beams=1, pad_token_id=0)[0].tolist()
    hf_new = hf_ids[len(prompt):]

    logits, kv_caches = run_prefill(model, params, prompt,
                                    block_size=block_size)
    ours_new = []
    ctx = len(prompt)
    token = int(np.argmax(logits[ctx - 1]))
    ours_new.append(token)
    for _ in range(n_steps - 1):
        pos = ctx
        ctx += 1
        blk = 1 + pos // block_size
        slot = blk * block_size + pos % block_size
        meta = InputMetadata(
            is_prompt=False,
            slot_mapping=jnp.asarray([slot], jnp.int32),
            context_lens=jnp.asarray([ctx], jnp.int32),
            block_tables=jnp.asarray([[1 + j for j in range(8)]],
                                     jnp.int32))
        hidden, kv_caches = model.forward(
            params, jnp.asarray([token], jnp.int32),
            jnp.asarray([pos], jnp.int32), kv_caches, meta)
        logit = model.compute_logits(params, hidden)
        token = int(np.argmax(np.asarray(logit[0], np.float32)))
        ours_new.append(token)

    assert ours_new == hf_new
