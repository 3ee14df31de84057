"""Phi 1/1.5/2 (reference parity: vllm/model_executor/models/phi.py).

Parallel residual with one shared LN, partial neox rotary, biases on
every projection, untied lm_head with bias.
"""
from typing import Any, Dict

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class PhiForCausalLM(GenericDecoder):
    norm_type = "ln"
    parallel_residual = True
    shared_parallel_norm = True
    pos_mode = "rope"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = getattr(cfg, "num_key_value_heads",
                                      None) or cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.norm_eps = getattr(cfg, "layer_norm_eps", 1e-5)
        self.act_name = getattr(cfg, "hidden_act", "gelu_new")

    def _make_rope(self, cfg):
        rotary_dim = int(self.head_dim *
                         getattr(cfg, "partial_rotary_factor", 0.5))
        return get_rope(self.head_dim, rotary_dim,
                        getattr(cfg, "max_position_embeddings", 2048),
                        getattr(cfg, "rope_theta", 10000.0),
                        is_neox_style=True,
                        rope_scaling=getattr(cfg, "rope_scaling", None))

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "model.embed_tokens.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        h, kv = self.total_heads, self.total_kv_heads
        layers = []
        for i in range(self.num_layers):
            pfx = f"model.layers.{i}"
            qkv = pb.qkv(f"{pfx}.self_attn.q_proj",
                         f"{pfx}.self_attn.k_proj",
                         f"{pfx}.self_attn.v_proj", h, kv, self.head_dim,
                         bias=True)
            o, o_b = pb.linear([f"{pfx}.self_attn.dense"], shard="row",
                               bias=True)
            fc1, _ = pb.linear([f"{pfx}.mlp.fc1"], shard="col", bias=True)
            fc2, fc2_b = pb.linear([f"{pfx}.mlp.fc2"], shard="row",
                                   bias=True)
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.input_layernorm"),
                "qkv": qkv, "o": o, "o_bias": o_b,
                "fc1": fc1, "fc2": fc2, "fc2_bias": fc2_b,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb,
                                                 "model.final_layernorm")
        params["lm_head"] = pb.array(
            "lm_head.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        if pb.has("lm_head.bias"):
            params["lm_head_bias"] = pb.array("lm_head.bias")
        return params
