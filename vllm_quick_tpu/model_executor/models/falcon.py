"""Falcon / RefinedWeb (reference parity:
vllm/model_executor/models/falcon.py).

Three fused-QKV layouts (classic MHA interleave, 7B multi-query, 40B+
grouped "new decoder architecture"), parallel attention with shared or
dual norms, neox rotary or ALiBi.
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.models.base import GenericDecoder


def falcon_split_qkv(w: np.ndarray, num_heads: int, num_kv: int,
                     head_dim: int, new_arch: bool, multi_query: bool):
    """HF Falcon fused qkv [rows, E] -> (q [E, H*D], k [E, KV*D],
    v [E, KV*D]) in matmul layout."""
    e = w.shape[1]
    if new_arch:
        # [kv_groups, q_per_group + 2, head_dim] row grouping.
        q_per = num_heads // num_kv
        g = w.reshape(num_kv, q_per + 2, head_dim, e)
        q = g[:, :q_per].reshape(num_heads * head_dim, e)
        k = g[:, -2].reshape(num_kv * head_dim, e)
        v = g[:, -1].reshape(num_kv * head_dim, e)
    elif multi_query:
        # [num_heads q rows..., k, v]
        q = w[:num_heads * head_dim]
        k = w[num_heads * head_dim:(num_heads + 1) * head_dim]
        v = w[(num_heads + 1) * head_dim:]
    else:
        g = w.reshape(num_heads, 3, head_dim, e)
        q = g[:, 0].reshape(num_heads * head_dim, e)
        k = g[:, 1].reshape(num_heads * head_dim, e)
        v = g[:, 2].reshape(num_heads * head_dim, e)
    return (np.ascontiguousarray(q.T), np.ascontiguousarray(k.T),
            np.ascontiguousarray(v.T))


class FalconForCausalLM(GenericDecoder):
    norm_type = "ln"

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        self.num_layers = cfg.num_hidden_layers
        self.total_heads = cfg.num_attention_heads
        self.new_arch = getattr(cfg, "new_decoder_architecture", False)
        self.multi_query = getattr(cfg, "multi_query", True)
        if self.new_arch:
            self.total_kv_heads = cfg.num_kv_heads
        elif self.multi_query:
            self.total_kv_heads = 1
        else:
            self.total_kv_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.norm_eps = getattr(cfg, "layer_norm_epsilon", 1e-5)
        self.act_name = "gelu"
        self.use_alibi = getattr(cfg, "alibi", False)
        self.pos_mode = "alibi" if self.use_alibi else "rope"
        self.bias = getattr(cfg, "bias", False)
        self.parallel_attn = getattr(cfg, "parallel_attn", True)
        self.parallel_residual = self.parallel_attn or self.new_arch
        # 7B: one shared input_layernorm; 40B+: separate ln_attn/ln_mlp.
        self.shared_parallel_norm = not self.new_arch

    def _make_rope(self, cfg):
        return get_rope(self.head_dim, self.head_dim,
                        getattr(cfg, "max_position_embeddings", 2048),
                        getattr(cfg, "rope_theta", 10000.0),
                        is_neox_style=True,
                        rope_scaling=getattr(cfg, "rope_scaling", None))

    def build_params(self, pb) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            "transformer.word_embeddings.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        alibi = self._alibi_param()
        if alibi is not None:
            params["alibi_slopes"] = alibi
        h, kv, hd = self.total_heads, self.total_kv_heads, self.head_dim
        layers = []
        for i in range(self.num_layers):
            pfx = f"transformer.h.{i}"
            w = pb.weights[f"{pfx}.self_attention.query_key_value.weight"]
            q, k, v = falcon_split_qkv(w, h, kv, hd, self.new_arch,
                                       self.multi_query)
            bias_parts = None
            bname = f"{pfx}.self_attention.query_key_value.bias"
            if self.bias and pb.has(bname):
                b = pb.weights[bname][:, None]
                qb, kb, vb = falcon_split_qkv(
                    np.repeat(b, 1, 1), h, kv, hd, self.new_arch,
                    self.multi_query)
                bias_parts = [qb.reshape(-1), kb.reshape(-1),
                              vb.reshape(-1)]
            qkv, _ = pb.linear_from_arrays([q, k, v], shard="col",
                                           part_units=[h, kv, kv],
                                           bias_parts=bias_parts)
            o, o_b = pb.linear([f"{pfx}.self_attention.dense"],
                               shard="row", bias=self.bias)
            fc1, _ = pb.linear([f"{pfx}.mlp.dense_h_to_4h"], shard="col",
                               bias=self.bias)
            fc2, fc2_b = pb.linear([f"{pfx}.mlp.dense_4h_to_h"],
                                   shard="row", bias=self.bias)
            layer = {"qkv": qkv, "o": o, "o_bias": o_b,
                     "fc1": fc1, "fc2": fc2, "fc2_bias": fc2_b}
            if self.new_arch:
                layer["ln1"] = self._norm_params(pb, f"{pfx}.ln_attn")
                layer["ln2"] = self._norm_params(pb, f"{pfx}.ln_mlp")
            else:
                layer["ln1"] = self._norm_params(pb,
                                                 f"{pfx}.input_layernorm")
                if not self.parallel_attn:
                    layer["ln2"] = self._norm_params(
                        pb, f"{pfx}.post_attention_layernorm")
            layers.append(layer)
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb, "transformer.ln_f")
        params["lm_head"] = pb.array(
            "lm_head.weight" if pb.has("lm_head.weight")
            else "transformer.word_embeddings.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
