"""Baichuan 1/2, 7B/13B (reference parity:
vllm/model_executor/models/baichuan.py).

Llama-style gated decoder with a single fused W_pack QKV. 7B uses
rotary positions; 13B (hidden 5120) uses ALiBi — selected the same way
the reference does (baichuan.py BaichuanForCausalLM: by hidden size).
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class BaiChuanBase(GenericDecoder):
    norm_type = "rms"
    gated_mlp = True
    act_name = "silu"

    position_embedding = "ROPE"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.norm_eps = getattr(cfg, "rms_norm_eps", 1e-6)
        self.pos_mode = ("rope" if self.position_embedding == "ROPE"
                         else "alibi")

    def _make_rope(self, cfg):
        return get_rope(self.head_dim, self.head_dim,
                        getattr(cfg, "max_position_embeddings", 4096),
                        getattr(cfg, "rope_theta", 10000.0),
                        is_neox_style=True)

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "model.embed_tokens.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        alibi = self._alibi_param()
        if alibi is not None:
            params["alibi_slopes"] = alibi
        h = self.total_heads
        layers = []
        for i in range(self.num_layers):
            pfx = f"model.layers.{i}"
            # W_pack: [3E, E] with sequential q|k|v rows.
            w = pb.weights[f"{pfx}.self_attn.W_pack.weight"].T  # [E, 3E]
            ws = np.split(w, 3, axis=1)
            qkv, _ = pb.linear_from_arrays(ws, shard="col",
                                           part_units=[h, h, h])
            o, _ = pb.linear([f"{pfx}.self_attn.o_proj"], shard="row")
            fc1, _ = pb.linear([f"{pfx}.mlp.gate_proj",
                                f"{pfx}.mlp.up_proj"], shard="col")
            fc2, _ = pb.linear([f"{pfx}.mlp.down_proj"], shard="row")
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
        params["final_norm"] = self._norm_params(pb, "model.norm",
                                                 bias=False)
        params["lm_head"] = pb.array(
            "lm_head.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params


class BaiChuanForCausalLM(BaiChuanBase):
    """baichuan-7B family (ROPE)."""
    position_embedding = "ROPE"


class BaichuanForCausalLM(BaiChuanBase):
    """Baichuan(2)-13B uses ALiBi; 7B checkpoints with this arch string
    still use rotary (reference baichuan.py selects by hidden size)."""

    def _configure(self, cfg) -> None:
        self.position_embedding = ("ROPE" if cfg.hidden_size == 4096
                                   else "ALIBI")
        super()._configure(cfg)
