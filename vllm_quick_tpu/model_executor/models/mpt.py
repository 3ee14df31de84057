"""MPT (reference parity: vllm/model_executor/models/mpt.py).

ALiBi attention, optional QKV clipping, bias-free LayerNorms, plain
GELU MLP, tied lm_head.
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class MPTForCausalLM(GenericDecoder):
    norm_type = "ln"
    pos_mode = "alibi"
    act_name = "gelu"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.d_model
        self.num_layers = cfg.n_layers
        self.total_heads = cfg.n_heads
        attn_cfg = getattr(cfg, "attn_config", {}) or {}
        if not isinstance(attn_cfg, dict):
            attn_cfg = attn_cfg.to_dict() if hasattr(attn_cfg, "to_dict") \
                else vars(attn_cfg)
        self.total_kv_heads = attn_cfg.get("kv_n_heads", cfg.n_heads)
        self.head_dim = cfg.d_model // cfg.n_heads
        self.clip_qkv = attn_cfg.get("clip_qkv")
        assert attn_cfg.get("alibi", True), \
            "MPT without ALiBi is not supported"
        assert not attn_cfg.get("qk_ln", False), \
            "MPT qk_ln is not supported yet"
        self.norm_eps = 1e-5

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "transformer.wte.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        alibi = self._alibi_param()
        if alibi is not None:
            params["alibi_slopes"] = alibi
        h, kv, hd = self.total_heads, self.total_kv_heads, self.head_dim
        layers = []
        for i in range(self.num_layers):
            pfx = f"transformer.blocks.{i}"
            w = pb.weights[f"{pfx}.attn.Wqkv.weight"].T   # [E, (h+2kv)*hd]
            q_sz, kv_sz = h * hd, kv * hd
            ws = [w[:, :q_sz], w[:, q_sz:q_sz + kv_sz],
                  w[:, q_sz + kv_sz:]]
            qkv, _ = pb.linear_from_arrays(ws, shard="col",
                                           part_units=[h, kv, kv])
            o, _ = pb.linear([f"{pfx}.attn.out_proj"], shard="row")
            fc1, _ = pb.linear([f"{pfx}.ffn.up_proj"], shard="col")
            fc2, _ = pb.linear([f"{pfx}.ffn.down_proj"], shard="row")
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.norm_1", bias=False),
                "ln2": self._norm_params(pb, f"{pfx}.norm_2", bias=False),
                "qkv": qkv, "o": o,
                "fc1": fc1, "fc2": fc2,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb, "transformer.norm_f",
                                                 bias=False)
        params["lm_head"] = pb.array(
            "transformer.wte.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
