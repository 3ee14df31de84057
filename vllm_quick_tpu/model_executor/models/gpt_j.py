"""GPT-J (reference parity: vllm/model_executor/models/gpt_j.py).

Parallel residual with a single shared LN, GPT-J-style (interleaved)
partial rotary, untied lm_head with bias.
"""
from typing import Any, Dict

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class GPTJForCausalLM(GenericDecoder):
    norm_type = "ln"
    parallel_residual = True
    shared_parallel_norm = True
    pos_mode = "rope"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.n_embd
        self.num_layers = cfg.n_layer
        self.total_heads = cfg.n_head
        self.total_kv_heads = cfg.n_head
        self.head_dim = cfg.n_embd // cfg.n_head
        self.rotary_dim = getattr(cfg, "rotary_dim", None) or self.head_dim
        self.norm_eps = getattr(cfg, "layer_norm_epsilon", 1e-5)
        self.act_name = getattr(cfg, "activation_function", "gelu_new")

    def _make_rope(self, cfg):
        return get_rope(self.head_dim, self.rotary_dim,
                        getattr(cfg, "n_positions", 2048), 10000,
                        is_neox_style=False)

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "transformer.wte.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        h = self.total_heads
        layers = []
        for i in range(self.num_layers):
            pfx = f"transformer.h.{i}"
            qkv = pb.qkv(f"{pfx}.attn.q_proj", f"{pfx}.attn.k_proj",
                         f"{pfx}.attn.v_proj", h, h, self.head_dim)
            o, o_b = pb.linear([f"{pfx}.attn.out_proj"], shard="row",
                               bias=True)
            fc1, _ = pb.linear([f"{pfx}.mlp.fc_in"], shard="col", bias=True)
            fc2, fc2_b = pb.linear([f"{pfx}.mlp.fc_out"], shard="row",
                                   bias=True)
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.ln_1"),
                "qkv": qkv, "o": o, "o_bias": o_b,
                "fc1": fc1, "fc2": fc2, "fc2_bias": fc2_b,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb, "transformer.ln_f")
        params["lm_head"] = pb.array(
            "lm_head.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        if pb.has("lm_head.bias"):
            params["lm_head_bias"] = pb.array("lm_head.bias")
        return params
