"""GPT-NeoX / Pythia (reference parity:
vllm/model_executor/models/gpt_neox.py).

Optionally parallel residual (separate norms), partial rotary
(rotary_pct), fused QKV stored head-interleaved [heads, 3, head_dim]
— de-interleaved at load time like the reference's weight_loader.
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


def deinterleave_qkv(w: np.ndarray, b, num_heads: int, head_dim: int):
    """HF NeoX/Bloom fused qkv weight [heads*3*hd, E] (row-major
    [head, {q,k,v}, hd]) -> three [E, heads*hd] matmul-ready parts."""
    e = w.shape[1]
    w = w.reshape(num_heads, 3, head_dim, e)
    parts = [np.ascontiguousarray(
        w[:, j].reshape(num_heads * head_dim, e).T) for j in range(3)]
    bias_parts = [None] * 3
    if b is not None:
        b = b.reshape(num_heads, 3, head_dim)
        bias_parts = [np.ascontiguousarray(b[:, j].reshape(-1))
                      for j in range(3)]
    return parts, bias_parts


class GPTNeoXForCausalLM(GenericDecoder):
    norm_type = "ln"
    pos_mode = "rope"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.norm_eps = getattr(cfg, "layer_norm_eps", 1e-5)
        self.act_name = getattr(cfg, "hidden_act", "gelu")
        self.parallel_residual = getattr(cfg, "use_parallel_residual", True)
        self.shared_parallel_norm = False

    def _make_rope(self, cfg):
        rotary_dim = int(self.head_dim * getattr(cfg, "rotary_pct", 0.25))
        return get_rope(self.head_dim, rotary_dim,
                        getattr(cfg, "max_position_embeddings", 2048),
                        getattr(cfg, "rotary_emb_base", 10000),
                        is_neox_style=True,
                        rope_scaling=getattr(cfg, "rope_scaling", None))

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "gpt_neox.embed_in.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        h, hd = self.total_heads, self.head_dim
        layers = []
        for i in range(self.num_layers):
            pfx = f"gpt_neox.layers.{i}"
            w = pb.weights[f"{pfx}.attention.query_key_value.weight"]
            b = pb.weights.get(f"{pfx}.attention.query_key_value.bias")
            parts, bias_parts = deinterleave_qkv(w, b, h, hd)
            qkv, _ = pb.linear_from_arrays(parts, shard="col",
                                           part_units=[h, h, h],
                                           bias_parts=bias_parts)
            o, o_b = pb.linear([f"{pfx}.attention.dense"], shard="row",
                               bias=True)
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
        params["final_norm"] = self._norm_params(
            pb, "gpt_neox.final_layer_norm")
        params["lm_head"] = pb.array(
            "embed_out.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
