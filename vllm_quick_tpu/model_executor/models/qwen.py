"""QWen v1 (reference parity: vllm/model_executor/models/qwen.py).

RMSNorm decoder, fused c_attn with bias, gated SiLU MLP where gate=w2
and up=w1 (the reference's stacked-params mapping, qwen.py).
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class QWenLMHeadModel(GenericDecoder):
    norm_type = "rms"
    gated_mlp = True
    act_name = "silu"
    pos_mode = "rope"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.norm_eps = getattr(cfg, "layer_norm_epsilon", 1e-6)

    def _make_rope(self, cfg):
        return get_rope(self.head_dim, self.head_dim,
                        getattr(cfg, "max_position_embeddings", 8192),
                        getattr(cfg, "rotary_emb_base", 10000),
                        is_neox_style=True)

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "transformer.wte.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        h = self.total_heads
        layers = []
        for i in range(self.num_layers):
            pfx = f"transformer.h.{i}"
            w = pb.weights[f"{pfx}.attn.c_attn.weight"].T  # [E, 3E]
            b = pb.weights.get(f"{pfx}.attn.c_attn.bias")
            ws = np.split(w, 3, axis=1)
            bs = np.split(b, 3) if b is not None else None
            qkv, _ = pb.linear_from_arrays(ws, shard="col",
                                           part_units=[h, h, h],
                                           bias_parts=bs)
            o, _ = pb.linear([f"{pfx}.attn.c_proj"], shard="row")
            # gate = w2, up = w1 (reference qwen.py weight mapping).
            fc1, _ = pb.linear([f"{pfx}.mlp.w2", f"{pfx}.mlp.w1"],
                               shard="col")
            fc2, _ = pb.linear([f"{pfx}.mlp.c_proj"], shard="row")
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.ln_1", bias=False),
                "ln2": self._norm_params(pb, f"{pfx}.ln_2", bias=False),
                "qkv": qkv, "o": o,
                "fc1": fc1, "fc2": fc2,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb, "transformer.ln_f",
                                                 bias=False)
        params["lm_head"] = pb.array(
            "lm_head.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
