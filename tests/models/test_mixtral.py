"""Mixtral MoE: HF golden + expert/tensor-parallel sharded execution
(reference: tests/models has no MoE golden — this exceeds its coverage;
mixtral.py:66-130 is the TP-sharded expert scheme being validated).
"""
import dataclasses
import tempfile

import jax
import numpy as np
import pytest

from tests.models.test_models_golden import paged_greedy, run_prefill
from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.model_loader import get_model
from vllm_quick_tpu.parallel.mesh import ParallelContext, make_mesh
from vllm_quick_tpu.parallel.sharding import (make_sharded_step,
                                              param_pspecs)

PROMPT = [1, 7, 42, 3, 250, 99, 5, 11]


@pytest.fixture(scope="module")
def tiny_mixtral():
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM
    cfg = MixtralConfig(vocab_size=256, hidden_size=128,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        num_local_experts=4, num_experts_per_tok=2,
                        max_position_embeddings=128,
                        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = MixtralForCausalLM(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix="tiny_mixtral_")
    model.save_pretrained(d, safe_serialization=True)
    return d, model, cfg


def test_mixtral_matches_hf(tiny_mixtral):
    import torch
    d, hf_model, cfg = tiny_mixtral
    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)
    model, params = get_model(mc)
    ours, caches = run_prefill(model, params, PROMPT)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([PROMPT])).logits[0].numpy()
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)

    n_steps = 6
    seq = list(PROMPT)
    hf_new = []
    with torch.no_grad():
        for _ in range(n_steps):
            logits = hf_model(torch.tensor([seq])).logits[0, -1].numpy()
            tok = int(np.argmax(logits))
            hf_new.append(tok)
            seq.append(tok)
    ours_new = paged_greedy(model, params, caches, PROMPT,
                            int(np.argmax(ours[len(PROMPT) - 1])), n_steps)
    assert ours_new == hf_new


def test_mixtral_quant_close_to_dense(tiny_mixtral):
    """Per-expert-quantized Mixtral (models/mixtral_quant.py — the
    variant the loader swaps in for AWQ/GPTQ checkpoints, reference
    model_loader.py:27-29) must track the dense model within INT4
    quantization error and keep the same greedy argmax."""
    import numpy as np
    d, _, cfg = tiny_mixtral
    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)
    model, params = get_model(mc)
    dense_logits, _ = run_prefill(model, params, PROMPT)

    from vllm_quick_tpu.model_executor.models.mixtral_quant import (
        MixtralQuantForCausalLM)
    from vllm_quick_tpu.model_executor.param_builder import ParamBuilder
    from vllm_quick_tpu.model_executor.weight_utils import collect_weights
    weights = collect_weights(d, "auto")
    qmodel = MixtralQuantForCausalLM(cfg, dtype="float32")
    qparams = qmodel.load_params(weights)
    # The fp32 checkpoint loads dense; quantize the expert + attention
    # linears on the fly to exercise the quantized execution path.
    from vllm_quick_tpu.ops.quant_formats import stack_quantized_weights
    pb = ParamBuilder(weights, None, "float32")
    for i, layer in enumerate(qparams["layers"]):
        moe = f"model.layers.{i}.block_sparse_moe"
        w13s, w2s = [], []
        for e in range(qmodel.num_experts):
            w13s.append(pb.quantize_dense(
                [f"{moe}.experts.{e}.w1", f"{moe}.experts.{e}.w3"],
                shard="col", group_size=64).qw)
            w2s.append(pb.quantize_dense(
                [f"{moe}.experts.{e}.w2"], shard="row",
                group_size=64).qw)
        layer.pop("moe_w13", None)
        layer.pop("moe_w2", None)
        from vllm_quick_tpu.model_executor.layers.linear import (
            LinearWeights)
        layer["experts_w13"] = LinearWeights(
            qw=stack_quantized_weights(w13s), shard="col")
        layer["experts_w2"] = LinearWeights(
            qw=stack_quantized_weights(w2s), shard="row")
    quant_logits, _ = run_prefill(qmodel, qparams, PROMPT)
    last_d = dense_logits[-1]
    last_q = quant_logits[-1]
    assert int(np.argmax(last_d)) == int(np.argmax(last_q))
    corr = np.corrcoef(last_d, last_q)[0, 1]
    assert corr > 0.99, corr


@pytest.mark.parametrize("tp,ep", [(2, 1), (1, 2), (2, 2)])
def test_mixtral_parallel_matches_single(tiny_mixtral, tp, ep):
    import jax.numpy as jnp
    from tests.distributed.test_tp_sharding import (_decode_inputs,
                                                    _make_caches,
                                                    _prompt_inputs,
                                                    _step_fn)
    d, _, cfg = tiny_mixtral
    mc = ModelConfig(model=d, dtype="float32", hf_config=cfg)

    model1, params1 = get_model(mc, ParallelContext())
    step1 = jax.jit(_step_fn(model1))
    caches1 = _make_caches(model1)
    p_in = _prompt_inputs()
    logits1, caches1 = step1(params1, *p_in[:2], caches1, *p_in[2:])
    d_in = _decode_inputs()
    dlogits1, _ = step1(params1, *d_in[:2], caches1, *d_in[2:])

    mesh = make_mesh(tensor_parallel_size=tp, expert_parallel_size=ep)
    ctx = ParallelContext(tp_size=tp, ep_size=ep)
    modelN, paramsN = get_model(mc, ctx, mesh=mesh)
    specs = param_pspecs(paramsN)
    stepN = make_sharded_step(_step_fn(modelN), mesh, specs,
                              donate_caches=False)
    cachesN = _make_caches(modelN, tp=tp)
    logitsN, cachesN = stepN(paramsN, *p_in[:2], cachesN, *p_in[2:])
    dlogitsN, _ = stepN(paramsN, *d_in[:2], cachesN, *d_in[2:])

    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logitsN),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dlogits1),
                               np.asarray(dlogitsN), rtol=2e-4, atol=2e-4)
