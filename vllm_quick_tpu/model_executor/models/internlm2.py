"""InternLM2 (reference parity: vllm/model_executor/models/internlm2.py).

Llama-style gated decoder with a grouped-interleaved fused wqkv
([kv_heads, q_per_group + 2, head_dim] row layout) and w1/w3/w2 MLP.
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


def internlm2_split_wqkv(w: np.ndarray, num_heads: int, num_kv: int,
                         head_dim: int):
    """wqkv [ (num_kv*(q_per+2))*hd, E ] grouped rows -> q/k/v [E, ...]."""
    e = w.shape[1]
    q_per = num_heads // num_kv
    g = w.reshape(num_kv, q_per + 2, head_dim, e)
    q = g[:, :q_per].reshape(num_heads * head_dim, e)
    k = g[:, -2].reshape(num_kv * head_dim, e)
    v = g[:, -1].reshape(num_kv * head_dim, e)
    return (np.ascontiguousarray(q.T), np.ascontiguousarray(k.T),
            np.ascontiguousarray(v.T))


class InternLM2ForCausalLM(GenericDecoder):
    norm_type = "rms"
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
        self.norm_eps = getattr(cfg, "rms_norm_eps", 1e-6)

    def _make_rope(self, cfg):
        return get_rope(self.head_dim, self.head_dim,
                        getattr(cfg, "max_position_embeddings", 2048),
                        getattr(cfg, "rope_theta", 10000.0),
                        is_neox_style=True,
                        rope_scaling=getattr(cfg, "rope_scaling", None))

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "model.tok_embeddings.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        h, kv, hd = self.total_heads, self.total_kv_heads, self.head_dim
        layers = []
        for i in range(self.num_layers):
            pfx = f"model.layers.{i}"
            w = pb.weights[f"{pfx}.attention.wqkv.weight"]
            q, k, v = internlm2_split_wqkv(w, h, kv, hd)
            qkv, _ = pb.linear_from_arrays([q, k, v], shard="col",
                                           part_units=[h, kv, kv])
            o, _ = pb.linear([f"{pfx}.attention.wo"], shard="row")
            fc1, _ = pb.linear([f"{pfx}.feed_forward.w1",
                                f"{pfx}.feed_forward.w3"], shard="col")
            fc2, _ = pb.linear([f"{pfx}.feed_forward.w2"], shard="row")
            layers.append({
                "ln1": self._norm_params(pb, f"{pfx}.attention_norm",
                                         bias=False),
                "ln2": self._norm_params(pb, f"{pfx}.ffn_norm",
                                         bias=False),
                "qkv": qkv, "o": o,
                "fc1": fc1, "fc2": fc2,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb, "model.norm",
                                                 bias=False)
        params["lm_head"] = pb.array(
            "output.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
