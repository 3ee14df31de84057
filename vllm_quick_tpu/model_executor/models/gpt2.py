"""GPT-2 (reference parity: vllm/model_executor/models/gpt2.py).

Learned absolute positions, pre-LN, fused Conv1D c_attn, gelu_new MLP,
tied lm_head.
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class GPT2LMHeadModel(GenericDecoder):
    norm_type = "ln"
    act_name = "gelu_new"
    pos_mode = "learned"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.norm_eps = getattr(cfg, "layer_norm_epsilon", 1e-5)
        self.act_name = getattr(cfg, "activation_function", "gelu_new")

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "transformer.wte.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        params["pos_embed"] = pb.array("transformer.wpe.weight")
        layers = []
        h = self.total_heads
        for i in range(self.num_layers):
            pfx = f"transformer.h.{i}"
            # Conv1D tensors are already [K, N]; c_attn is [K, 3E] with
            # q|k|v column sections.
            ca = pb.weights[f"{pfx}.attn.c_attn.weight"]
            cb = pb.weights.get(f"{pfx}.attn.c_attn.bias")
            ws = np.split(ca, 3, axis=1)
            bs = np.split(cb, 3) if cb is not None else [None] * 3
            qkv, _ = pb.linear_from_arrays(ws, shard="col",
                                           part_units=[h, h, h],
                                           bias_parts=bs)
            o, o_b = pb.linear_from_arrays(
                [pb.weights[f"{pfx}.attn.c_proj.weight"]], shard="row",
                bias_parts=[pb.weights.get(f"{pfx}.attn.c_proj.bias")])
            fc1, _ = pb.linear_from_arrays(
                [pb.weights[f"{pfx}.mlp.c_fc.weight"]], shard="col",
                bias_parts=[pb.weights.get(f"{pfx}.mlp.c_fc.bias")])
            fc2, fc2_b = pb.linear_from_arrays(
                [pb.weights[f"{pfx}.mlp.c_proj.weight"]], shard="row",
                bias_parts=[pb.weights.get(f"{pfx}.mlp.c_proj.bias")])
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
