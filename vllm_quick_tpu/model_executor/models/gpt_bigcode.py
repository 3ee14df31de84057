"""GPT-BigCode / StarCoder (reference parity:
vllm/model_executor/models/gpt_bigcode.py).

GPT-2-style decoder with multi-query attention (1 KV head) and learned
positions; fused c_attn is [E, E + 2*kv*head_dim].
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class GPTBigCodeForCausalLM(GenericDecoder):
    norm_type = "ln"
    pos_mode = "learned"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.total_heads = cfg.num_attention_heads
        self.multi_query = getattr(cfg, "multi_query", True)
        self.total_kv_heads = 1 if self.multi_query else self.total_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.norm_eps = getattr(cfg, "layer_norm_epsilon", 1e-5)
        self.act_name = getattr(cfg, "activation_function",
                                "gelu_pytorch_tanh")

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "transformer.wte.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        params["pos_embed"] = pb.array("transformer.wpe.weight")
        h, kv, hd = self.total_heads, self.total_kv_heads, self.head_dim
        layers = []
        for i in range(self.num_layers):
            pfx = f"transformer.h.{i}"
            # Linear layout [N, K]: transpose, then split columns into
            # q [E] | k [kv*hd] | v [kv*hd].
            w = pb.weights[f"{pfx}.attn.c_attn.weight"].T
            b = pb.weights.get(f"{pfx}.attn.c_attn.bias")
            q_sz = h * hd
            kv_sz = kv * hd
            ws = [w[:, :q_sz], w[:, q_sz:q_sz + kv_sz],
                  w[:, q_sz + kv_sz:]]
            bs = [b[:q_sz], b[q_sz:q_sz + kv_sz], b[q_sz + kv_sz:]] \
                if b is not None else [None] * 3
            qkv, _ = pb.linear_from_arrays(ws, shard="col",
                                           part_units=[h, kv, kv],
                                           bias_parts=bs)
            o, o_b = pb.linear([f"{pfx}.attn.c_proj"], shard="row",
                               bias=True)
            fc1, _ = pb.linear([f"{pfx}.mlp.c_fc"], shard="col", bias=True)
            fc2, fc2_b = pb.linear([f"{pfx}.mlp.c_proj"], shard="row",
                                   bias=True)
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.ln_1"),
                "ln2": self._norm_params(pb, f"{pfx}.ln_2"),
                "qkv": qkv, "o": o, "o_bias": o_b,
                "fc1": fc1, "fc2": fc2, "fc2_bias": fc2_b,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb, "transformer.ln_f")
        params["lm_head"] = pb.array(
            "transformer.wte.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
