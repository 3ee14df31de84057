"""Synthesize an AWQ-format Llama checkpoint with random weights.

The environment has no network access, so real quantized checkpoints
cannot be downloaded; serving/latency/throughput numbers, however, are
a function of tensor SHAPES, not weight values. This tool emits a
checkpoint-on-disk in the exact on-disk AWQ format the loader ingests
(reference: vllm/model_executor/layers/quantization/awq.py:80-141 —
qweight int32 [K, N/8] in AWQ nibble order, qzeros int32 [K/G, N/8],
scales fp16 [K/G, N]) plus config.json with a quantization_config and
a local byte-level tokenizer, so the FULL stack (quant config fetch ->
safetensors iterate -> AWQ unpack -> TPU repack -> serve) runs exactly
as it would for a real Llama-2-7B-AWQ download.

Usage:
    python benchmarks/make_synthetic_checkpoint.py --preset 7b \
        --out /tmp/llama7b_awq_synth
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

AWQ_PACK_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)

PRESETS = {
    # vocab, hidden, inter, layers, heads, kv_heads, max_pos
    "7b": (32000, 4096, 11008, 32, 32, 32, 4096),
    "tiny": (512, 256, 512, 2, 4, 4, 512),
    "1b": (32000, 2048, 5632, 22, 32, 4, 2048),   # TinyLlama-1.1B shape
}


def awq_pack_int32(q: np.ndarray) -> np.ndarray:
    """Pack uint4-valued [..., N] -> int32 [..., N/8] in AWQ nibble
    order (inverse of ops/quant_formats.awq_unpack_int32)."""
    *lead, n = q.shape
    assert n % 8 == 0
    grp = q.reshape(*lead, n // 8, 8).astype(np.uint32)
    out = np.zeros((*lead, n // 8), np.uint32)
    for pos, elem in enumerate(AWQ_PACK_ORDER):
        out |= grp[..., elem] << np.uint32(4 * pos)
    return out.view(np.int32)


def _quant_tensors(rng, k, n, group_size, dtype=np.float16):
    q = rng.integers(0, 16, size=(k, n), dtype=np.int64).astype(np.uint8)
    z = rng.integers(7, 9, size=(k // group_size, n),
                     dtype=np.int64).astype(np.uint8)
    # Scale so dequantized weights land at ~N(0, 1/sqrt(k)) magnitude:
    # keeps activations bounded through 32 layers (no overflow in bf16).
    s = (rng.uniform(0.5, 1.5, size=(k // group_size, n))
         / (4.0 * np.sqrt(k))).astype(dtype)
    return {
        "qweight": awq_pack_int32(q),
        "qzeros": awq_pack_int32(z),
        "scales": s,
    }


def generate(out: str, preset: str = "7b", group_size: int = 128,
             seed: int = 0) -> int:
    """Write the checkpoint; returns total tensor bytes."""
    vocab, e, inter, layers, heads, kv_heads, max_pos = PRESETS[preset]
    head_dim = e // heads
    g = group_size
    rng = np.random.default_rng(seed)

    os.makedirs(out, exist_ok=True)

    tensors = {}
    emb_scale = 1.0 / np.sqrt(e)
    tensors["model.embed_tokens.weight"] = (
        rng.standard_normal((vocab, e)) * emb_scale).astype(np.float16)
    tensors["lm_head.weight"] = (
        rng.standard_normal((vocab, e)) * emb_scale).astype(np.float16)
    tensors["model.norm.weight"] = np.ones((e,), np.float16)

    kv_sz = kv_heads * head_dim
    for i in range(layers):
        p = f"model.layers.{i}"
        tensors[f"{p}.input_layernorm.weight"] = np.ones((e,), np.float16)
        tensors[f"{p}.post_attention_layernorm.weight"] = \
            np.ones((e,), np.float16)
        for name, (k, n) in {
            "self_attn.q_proj": (e, e),
            "self_attn.k_proj": (e, kv_sz),
            "self_attn.v_proj": (e, kv_sz),
            "self_attn.o_proj": (e, e),
            "mlp.gate_proj": (e, inter),
            "mlp.up_proj": (e, inter),
            "mlp.down_proj": (inter, e),
        }.items():
            for suffix, t in _quant_tensors(rng, k, n, g).items():
                tensors[f"{p}.{name}.{suffix}"] = t
        if (i + 1) % 8 == 0:
            print(f"  layer {i + 1}/{layers}", file=sys.stderr)

    from safetensors.numpy import save_file
    save_file(tensors, os.path.join(out, "model.safetensors"))

    config = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": vocab,
        "hidden_size": e,
        "intermediate_size": inter,
        "num_hidden_layers": layers,
        "num_attention_heads": heads,
        "num_key_value_heads": kv_heads,
        "max_position_embeddings": max_pos,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "torch_dtype": "float16",
        "bos_token_id": 1,
        "eos_token_id": 2,
        "quantization_config": {
            "quant_method": "awq",
            "bits": 4,
            "group_size": g,
            "zero_point": True,
            "version": "gemm",
        },
    }
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(config, f, indent=1)

    # Byte-level tokenizer (same recipe as tests/utils.py, standalone so
    # benchmarks don't import the test tree).
    from tokenizers import Tokenizer
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from transformers import PreTrainedTokenizerFast
    alphabet = sorted(ByteLevel.alphabet())
    tok_vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i, ch in enumerate(alphabet):
        tok_vocab[ch] = i + 3
    tok = Tokenizer(BPE(vocab=tok_vocab, merges=[], unk_token="<unk>"))
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False)
    tok.decoder = ByteLevelDecoder()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>",
        model_max_length=max_pos).save_pretrained(out)

    return sum(t.nbytes for t in tensors.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--preset", default="7b", choices=sorted(PRESETS))
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    nbytes = generate(args.out, args.preset, args.group_size, args.seed)
    print(json.dumps({"out": args.out, "preset": args.preset,
                      "bytes": nbytes}))


if __name__ == "__main__":
    main()
