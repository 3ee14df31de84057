"""Tensor-parallel execution on a virtual device mesh.

The reference validates TP with 2-GPU Ray/NCCL integration tests
(tests/distributed/test_comm_ops.py); here the same capability is
checked on the 8-virtual-device CPU mesh: a sharded step over the
(dp, ep, tp) mesh must reproduce the single-chip logits exactly
(same math, collectives inserted by shard_map).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.model_loader import get_model
from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM
from vllm_quick_tpu.model_executor.param_builder import ParamBuilder
from vllm_quick_tpu.model_executor.weight_utils import collect_weights
from vllm_quick_tpu.parallel.mesh import ParallelContext, make_mesh
from vllm_quick_tpu.parallel.sharding import (assemble_global_params,
                                              make_sharded_step,
                                              param_pspecs)

BLOCK = 16


def _model_config(model_dir, dtype="float32", quant=None):
    return ModelConfig(
        model=model_dir, tokenizer=model_dir, tokenizer_mode="auto",
        trust_remote_code=False, download_dir=None, load_format="auto",
        dtype=dtype, seed=0, quantization=quant)


def _step_fn(model):
    def _step(params, input_ids, positions, kv_caches, meta, prompt_lens):
        hidden, new_caches = model.forward(params, input_ids, positions,
                                           kv_caches, meta)
        if meta.is_prompt:
            idx = jnp.maximum(prompt_lens - 1, 0)
            hidden = jnp.take_along_axis(
                hidden, idx[:, None, None], axis=1)[:, 0]
        logits = model.compute_logits(params, hidden)
        return logits, new_caches
    return _step


def _make_caches(model, num_blocks=8, tp=1):
    shape = model.kv_cache_shape(num_blocks, BLOCK)
    # Head axis (index 2 of fused [NB, 2, H, S, D]) carries all tp shards.
    shape = shape[:2] + (shape[2] * tp,) + shape[3:]
    return [jnp.zeros(shape, jnp.float32)
            for _ in range(model.num_layers)]


def _prompt_inputs():
    ids = np.array([[3, 5, 7, 11, 13, 17, 19, 23],
                    [2, 4, 6, 8, 10, 12, 14, 16]], np.int32)
    pos = np.tile(np.arange(8, dtype=np.int32), (2, 1))
    slots = np.stack([np.arange(8) + 1 * BLOCK,
                      np.arange(8) + 2 * BLOCK]).astype(np.int32)
    meta = InputMetadata(is_prompt=True,
                         slot_mapping=jnp.asarray(slots),
                         prompt_lens=jnp.asarray([8, 8], np.int32))
    return (jnp.asarray(ids), jnp.asarray(pos), meta,
            jnp.asarray([8, 8], np.int32))


def _decode_inputs():
    ids = jnp.asarray([29, 31], jnp.int32)
    pos = jnp.asarray([8, 8], jnp.int32)
    slots = jnp.asarray([8 + 1 * BLOCK, 8 + 2 * BLOCK], jnp.int32)
    meta = InputMetadata(
        is_prompt=False,
        slot_mapping=slots,
        context_lens=jnp.asarray([9, 9], jnp.int32),
        block_tables=jnp.asarray([[1, 0], [2, 0]], jnp.int32),
    )
    return ids, pos, meta, jnp.zeros(2, jnp.int32)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_chip(tp):
    model_dir = make_tiny_llama_dir()
    cfg = _model_config(model_dir)

    # Single-chip ground truth.
    model1, params1 = get_model(cfg, ParallelContext())
    step1 = jax.jit(_step_fn(model1))
    caches1 = _make_caches(model1)
    p_in = _prompt_inputs()
    logits1, caches1 = step1(params1, *p_in[:2], caches1, *p_in[2:])
    d_in = _decode_inputs()
    dlogits1, _ = step1(params1, *d_in[:2], caches1, *d_in[2:])

    # Sharded over the tp mesh axis.
    mesh = make_mesh(tensor_parallel_size=tp)
    ctx = ParallelContext(tp_size=tp)
    modelN, paramsN = get_model(cfg, ctx, mesh=mesh)
    specs = param_pspecs(paramsN)
    stepN = make_sharded_step(_step_fn(modelN), mesh, specs,
                              donate_caches=False)
    cachesN = _make_caches(modelN, tp=tp)
    logitsN, cachesN = stepN(paramsN, *p_in[:2], cachesN, *p_in[2:])
    dlogitsN, _ = stepN(paramsN, *d_in[:2], cachesN, *d_in[2:])

    np.testing.assert_allclose(np.asarray(logits1),
                               np.asarray(logitsN), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dlogits1),
                               np.asarray(dlogitsN), rtol=2e-4, atol=2e-4)


def _quantized_params(model, weights, rank, size):
    """Build params with every linear quantized on-the-fly to packed
    INT4 — exercises pack-factor-aware TP sharding (the analogue of the
    reference's divisibility rules, awq.py:84-93)."""
    pb = ParamBuilder(weights, None, "float32", tp_rank=rank, tp_size=size)
    params = model.build_params(pb)
    for i, layer in enumerate(params["layers"]):
        pfx = f"model.layers.{i}"
        layer["qkv"] = pb.quantize_dense(
            [f"{pfx}.self_attn.q_proj", f"{pfx}.self_attn.k_proj",
             f"{pfx}.self_attn.v_proj"], shard="col")
        layer["o"] = pb.quantize_dense([f"{pfx}.self_attn.o_proj"],
                                       shard="row")
        layer["gate_up"] = pb.quantize_dense(
            [f"{pfx}.mlp.gate_proj", f"{pfx}.mlp.up_proj"], shard="col")
        layer["down"] = pb.quantize_dense([f"{pfx}.mlp.down_proj"],
                                          shard="row")
    return params


def test_tp_quantized_matches_single_chip():
    model_dir = make_tiny_llama_dir(hidden_size=256, intermediate_size=512,
                                    num_heads=8, num_kv_heads=4,
                                    key="tp_quant")
    tp = 2
    cfg = _model_config(model_dir)
    weights = collect_weights(model_dir, "auto")

    model1 = LlamaForCausalLM(cfg.hf_config, quant=None,
                              ctx=ParallelContext(), dtype="float32")
    params1 = _quantized_params(model1, weights, 0, 1)
    step1 = jax.jit(_step_fn(model1))
    caches1 = _make_caches(model1)
    p_in = _prompt_inputs()
    logits1, _ = step1(params1, *p_in[:2], caches1, *p_in[2:])

    mesh = make_mesh(tensor_parallel_size=tp)
    modelN = LlamaForCausalLM(cfg.hf_config, quant=None,
                              ctx=ParallelContext(tp_size=tp),
                              dtype="float32")
    rank_params = [_quantized_params(modelN, weights, r, tp)
                   for r in range(tp)]
    specs = param_pspecs(rank_params[0])
    paramsN = assemble_global_params(rank_params, specs, mesh)
    stepN = make_sharded_step(_step_fn(modelN), mesh, specs,
                              donate_caches=False)
    cachesN = _make_caches(modelN, tp=tp)
    logitsN, _ = stepN(paramsN, *p_in[:2], cachesN, *p_in[2:])

    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logitsN),
                               rtol=2e-4, atol=2e-4)
