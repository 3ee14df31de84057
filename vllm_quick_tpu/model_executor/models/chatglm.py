"""ChatGLM2/3 (reference parity: vllm/model_executor/models/chatglm.py).

RMSNorm decoder, grouped multi-query attention with QKV bias,
interleaved (GPT-J-style) rotary over half the head dim, SwiGLU MLP.
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class ChatGLMForCausalLM(GenericDecoder):
    norm_type = "rms"
    gated_mlp = True
    act_name = "silu"
    pos_mode = "rope"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.padded_vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_layers
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = (cfg.multi_query_group_num
                               if getattr(cfg, "multi_query_attention",
                                          False)
                               else cfg.num_attention_heads)
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.norm_eps = getattr(cfg, "layernorm_epsilon", 1e-5)
        assert getattr(cfg, "rmsnorm", True), \
            "LayerNorm ChatGLM variants are not supported"

    def _make_rope(self, cfg):
        # ChatGLM applies interleaved rotary to half the head dim
        # (reference chatglm.py: rotary_dim = head_dim // 2,
        # is_neox_style=False).
        return get_rope(self.head_dim, self.head_dim // 2,
                        getattr(cfg, "seq_length", 8192),
                        getattr(cfg, "rope_ratio", 1) * 10000.0,
                        is_neox_style=False)

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "transformer.embedding.word_embeddings.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        h, kv, hd = self.total_heads, self.total_kv_heads, self.head_dim
        layers = []
        for i in range(self.num_layers):
            pfx = f"transformer.encoder.layers.{i}"
            w = pb.weights[f"{pfx}.self_attention.query_key_value.weight"]
            w = w.T                                     # [E, (h+2kv)*hd]
            b = pb.weights.get(f"{pfx}.self_attention.query_key_value.bias")
            q_sz, kv_sz = h * hd, kv * hd
            ws = [w[:, :q_sz], w[:, q_sz:q_sz + kv_sz],
                  w[:, q_sz + kv_sz:]]
            bs = [b[:q_sz], b[q_sz:q_sz + kv_sz], b[q_sz + kv_sz:]] \
                if b is not None else None
            qkv, _ = pb.linear_from_arrays(ws, shard="col",
                                           part_units=[h, kv, kv],
                                           bias_parts=bs)
            o, _ = pb.linear([f"{pfx}.self_attention.dense"], shard="row")
            # dense_h_to_4h fuses [gate | up]: split before TP slicing so
            # each rank keeps matching gate/up shards.
            gu = pb.weights[f"{pfx}.mlp.dense_h_to_4h.weight"].T
            fc1, _ = pb.linear_from_arrays(
                list(np.split(gu, 2, axis=1)), shard="col")
            fc2, _ = pb.linear([f"{pfx}.mlp.dense_4h_to_h"], shard="row")
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.input_layernorm",
                                         bias=False),
                "ln2": self._norm_params(pb,
                                         f"{pfx}.post_attention_layernorm",
                                         bias=False),
                "qkv": qkv, "o": o,
                "fc1": fc1, "fc2": fc2,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(
            pb, "transformer.encoder.final_layernorm", bias=False)
        params["lm_head"] = pb.array(
            "transformer.output_layer.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
