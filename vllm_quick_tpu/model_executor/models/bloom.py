"""BLOOM (reference parity: vllm/model_executor/models/bloom.py).

ALiBi attention (no rotary/positions), embedding LayerNorm, fused
head-interleaved QKV, tied lm_head.
"""
from typing import Any, Dict

from vllm_quick_tpu.model_executor.models.base import GenericDecoder
from vllm_quick_tpu.model_executor.models.gpt_neox import deinterleave_qkv


class BloomForCausalLM(GenericDecoder):
    norm_type = "ln"
    pos_mode = "alibi"
    act_name = "gelu_new"   # BloomGelu == tanh-approximated gelu
    embed_ln = True

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.n_layer
        self.total_heads = cfg.n_head
        self.total_kv_heads = cfg.n_head
        self.head_dim = cfg.hidden_size // cfg.n_head
        self.norm_eps = getattr(cfg, "layer_norm_epsilon", 1e-5)

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "transformer.word_embeddings.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        params["embed_ln"] = self._norm_params(
            pb, "transformer.word_embeddings_layernorm")
        alibi = self._alibi_param()
        if alibi is not None:
            params["alibi_slopes"] = alibi
        h, hd = self.total_heads, self.head_dim
        layers = []
        for i in range(self.num_layers):
            pfx = f"transformer.h.{i}"
            w = pb.weights[f"{pfx}.self_attention.query_key_value.weight"]
            b = pb.weights.get(f"{pfx}.self_attention.query_key_value.bias")
            parts, bias_parts = deinterleave_qkv(w, b, h, hd)
            qkv, _ = pb.linear_from_arrays(parts, shard="col",
                                           part_units=[h, h, h],
                                           bias_parts=bias_parts)
            o, o_b = pb.linear([f"{pfx}.self_attention.dense"],
                               shard="row", bias=True)
            fc1, _ = pb.linear([f"{pfx}.mlp.dense_h_to_4h"], shard="col",
                               bias=True)
            fc2, fc2_b = pb.linear([f"{pfx}.mlp.dense_4h_to_h"],
                                   shard="row", bias=True)
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.input_layernorm"),
                "ln2": self._norm_params(pb,
                                         f"{pfx}.post_attention_layernorm"),
                "qkv": qkv, "o": o, "o_bias": o_b,
                "fc1": fc1, "fc2": fc2, "fc2_bias": fc2_b,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb, "transformer.ln_f")
        params["lm_head"] = pb.array(
            "transformer.word_embeddings.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
