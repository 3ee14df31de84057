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


def test_int4_vs_dequant_ppl_delta(tmp_path):
    """BASELINE accuracy-gate methodology on local data: the INT4
    execution path's perplexity must match a dense model built from the
    SAME dequantized weights (the only difference is kernel numerics,
    the quantity the real-checkpoint gate bounds at 0.1)."""
    import json
    import os
    import shutil

    from safetensors.numpy import load_file, save_file

    import vllm_quick_tpu.ops.quant_formats as qf
    from benchmarks.make_synthetic_checkpoint import generate

    qdir = str(tmp_path / "awq")
    generate(qdir, preset="tiny", group_size=64)

    # Dense twin: dequantize (q - z) * s per group into fp32 weights.
    t = load_file(os.path.join(qdir, "model.safetensors"))
    dense = {}
    for name in t:
        if name.endswith(".qweight"):
            p = name[:-len(".qweight")]
            q = qf.awq_unpack_int32(t[name]).astype(np.float32)
            z = qf.awq_unpack_int32(t[p + ".qzeros"]).astype(np.float32)
            s = t[p + ".scales"].astype(np.float32)
            g = q.shape[0] // s.shape[0]
            w = (q - np.repeat(z, g, axis=0)) * np.repeat(s, g, axis=0)
            dense[p + ".weight"] = np.ascontiguousarray(w.T)  # HF [N,K]
        elif not name.endswith((".qzeros", ".scales")):
            dense[name] = t[name].astype(np.float32)
    ddir = str(tmp_path / "dense")
    os.makedirs(ddir)
    save_file(dense, os.path.join(ddir, "model.safetensors"))
    with open(os.path.join(qdir, "config.json")) as f:
        cfg = json.load(f)
    cfg.pop("quantization_config")
    cfg["torch_dtype"] = "float32"
    with open(os.path.join(ddir, "config.json"), "w") as f:
        json.dump(cfg, f)
    for fn in ("tokenizer.json", "tokenizer_config.json",
               "special_tokens_map.json"):
        shutil.copy(os.path.join(qdir, fn), ddir)

    rng = np.random.default_rng(1)
    token_ids = rng.integers(3, 250, size=96).tolist()
    mq, pq = get_model(ModelConfig(model=qdir, dtype="float32"))
    ppl_q, _ = compute_perplexity(mq, pq, token_ids, max_len=48)
    md, pd = get_model(ModelConfig(model=ddir, dtype="float32"))
    ppl_d, _ = compute_perplexity(md, pd, token_ids, max_len=48)
    assert abs(ppl_q - ppl_d) / ppl_d < 0.02, (ppl_q, ppl_d)


def test_int8_lm_head_ppl_delta():
    """Gate for lm_head_dtype=int8 (per-column PTQ, ops/dense_matmul.py):
    perplexity on the SAME weights must stay within the 0.1-equivalent
    relative band of the bf16 head — the accuracy evidence behind the
    bench/serving default (BREAKDOWN.md round 4)."""
    d = make_tiny_llama_dir()
    rng = np.random.default_rng(2)
    token_ids = rng.integers(3, 250, size=96).tolist()
    m0, p0 = get_model(ModelConfig(model=d, dtype="float32"))
    ppl0, _ = compute_perplexity(m0, p0, token_ids, max_len=48)
    m8, p8 = get_model(ModelConfig(model=d, dtype="float32",
                                   lm_head_dtype="int8"))
    assert isinstance(p8["lm_head"], dict)          # transform applied
    ppl8, _ = compute_perplexity(m8, p8, token_ids, max_len=48)
    assert abs(ppl8 - ppl0) / ppl0 < 0.02, (ppl8, ppl0)


def test_w4a8_prefill_ppl_delta(tmp_path, monkeypatch):
    """Gate for VLLM_TPU_W4A8 (int8-activation prefill GEMMs): model
    perplexity with the W4A8 kernel must stay within 3% of the bf16
    fused-kernel path on the SAME quantized checkpoint — the accuracy
    evidence required before W4A8 can become a prefill default."""
    import functools

    from benchmarks.make_synthetic_checkpoint import generate
    import vllm_quick_tpu.model_executor.layers.linear as linear_mod
    from vllm_quick_tpu.ops.quant_matmul import quant_matmul

    # group 128 -> the i8pair format; windows > 64 tokens -> the
    # M-tiled prefill kernel (W4A8 engages only above the decode-kernel
    # token ceiling).
    qdir = str(tmp_path / "awq")
    generate(qdir, preset="tiny", group_size=128)
    rng = np.random.default_rng(3)
    token_ids = rng.integers(3, 250, size=200).tolist()

    # Force the Pallas kernel path (interpret) on CPU so the prefill
    # M-tiled kernel — and under the env flag, its W4A8 variant — is
    # what computes the GEMMs, exactly as on TPU.
    monkeypatch.setattr(
        linear_mod, "quant_matmul",
        functools.partial(quant_matmul, use_kernel=True, interpret=True))

    mq, pq = get_model(ModelConfig(model=qdir, dtype="float32"))
    ppl_bf16, _ = compute_perplexity(mq, pq, token_ids, max_len=96)
    monkeypatch.setenv("VLLM_TPU_W4A8", "1")
    ppl_w4a8, _ = compute_perplexity(mq, pq, token_ids, max_len=96)
    assert abs(ppl_w4a8 - ppl_bf16) / ppl_bf16 < 0.03, (ppl_w4a8,
                                                        ppl_bf16)


def test_knob_product_ppl_delta(tmp_path, monkeypatch):
    """JOINT accuracy gate over the quantization knob product (VERDICT
    r4 item 9): every perf knob the bench/serving config enables at
    once — INT4 weights x W4A8 prefill x int8 lm_head x fp8_e5m2 KV —
    measured TOGETHER, prefill-path ppl AND decode-path ppl, against
    the same checkpoint with every knob off. Individual gates above
    bound each knob; this bounds their interaction."""
    import functools

    import jax.numpy as jnp

    from benchmarks.benchmark_perplexity import compute_perplexity_decode
    from benchmarks.make_synthetic_checkpoint import generate
    import vllm_quick_tpu.model_executor.layers.linear as linear_mod
    from vllm_quick_tpu.ops.quant_matmul import quant_matmul

    qdir = str(tmp_path / "awq")
    generate(qdir, preset="tiny", group_size=128)
    rng = np.random.default_rng(5)
    token_ids = rng.integers(3, 250, size=200).tolist()

    monkeypatch.setattr(
        linear_mod, "quant_matmul",
        functools.partial(quant_matmul, use_kernel=True, interpret=True))

    # All knobs OFF (INT4 ckpt, bf16 activations/head/KV).
    m0, p0 = get_model(ModelConfig(model=qdir, dtype="float32"))
    ppl_pre0, _ = compute_perplexity(m0, p0, token_ids, max_len=96)
    ppl_dec0, _ = compute_perplexity_decode(m0, p0, token_ids,
                                            max_len=48)

    # All knobs ON.
    monkeypatch.setenv("VLLM_TPU_W4A8", "1")
    m1, p1 = get_model(ModelConfig(model=qdir, dtype="float32",
                                   lm_head_dtype="int8"))
    assert isinstance(p1["lm_head"], dict)
    ppl_pre1, _ = compute_perplexity(m1, p1, token_ids, max_len=96)
    ppl_dec1, _ = compute_perplexity_decode(
        m1, p1, token_ids, max_len=48, kv_dtype=jnp.float8_e5m2)

    assert abs(ppl_pre1 - ppl_pre0) / ppl_pre0 < 0.05, (ppl_pre1,
                                                        ppl_pre0)
    assert abs(ppl_dec1 - ppl_dec0) / ppl_dec0 < 0.05, (ppl_dec1,
                                                        ppl_dec0)
    # The two paths must agree with each other too (same model, same
    # tokens; prefill window 96 vs decode window 48 differ slightly in
    # coverage, so compare the baselines loosely).
    assert abs(ppl_dec0 - ppl_pre0) / ppl_pre0 < 0.25, (ppl_dec0,
                                                        ppl_pre0)
