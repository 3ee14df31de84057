"""StableLM (reference parity: vllm/model_executor/models/stablelm.py).

Llama-style gated-SiLU decoder but with LayerNorm (+bias) norms, partial
neox rotary, optional QKV bias.
"""
from typing import Any, Dict

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class StableLmForCausalLM(GenericDecoder):
    norm_type = "ln"
    gated_mlp = True
    act_name = "silu"
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
        self.parallel_residual = getattr(cfg, "use_parallel_residual",
                                         False)

    def _make_rope(self, cfg):
        factor = getattr(cfg, "partial_rotary_factor", None)
        if factor is None:
            factor = getattr(cfg, "rope_pct", 0.25)
        rotary_dim = int(self.head_dim * factor)
        return get_rope(self.head_dim, rotary_dim,
                        getattr(cfg, "max_position_embeddings", 4096),
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
            o, _ = pb.linear([f"{pfx}.self_attn.o_proj"], shard="row")
            fc1, _ = pb.linear([f"{pfx}.mlp.gate_proj",
                                f"{pfx}.mlp.up_proj"], shard="col")
            fc2, _ = pb.linear([f"{pfx}.mlp.down_proj"], shard="row")
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.input_layernorm"),
                "ln2": self._norm_params(pb,
                                         f"{pfx}.post_attention_layernorm"),
                "qkv": qkv, "o": o,
                "fc1": fc1, "fc2": fc2,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb, "model.norm")
        params["lm_head"] = pb.array(
            "lm_head.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
