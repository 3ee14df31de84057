"""OPT (reference parity: vllm/model_executor/models/opt.py).

Learned positions with the historical +2 offset, pre-LN (standard OPT),
ReLU MLP, tied lm_head.
"""
from typing import Any, Dict

from vllm_quick_tpu.model_executor.models.base import GenericDecoder


class OPTForCausalLM(GenericDecoder):
    norm_type = "ln"
    act_name = "relu"
    pos_mode = "learned"
    pos_offset = 2

    def _configure(self, cfg) -> None:
        self.vocab_size = cfg.vocab_size
        self.hidden_size = cfg.hidden_size
        assert getattr(cfg, "word_embed_proj_dim",
                       cfg.hidden_size) == cfg.hidden_size, \
            "OPT word_embed_proj_dim != hidden_size is not supported"
        assert getattr(cfg, "do_layer_norm_before", True), \
            "post-LN OPT variants (350m) are not supported"
        self.num_layers = cfg.num_hidden_layers
        self.total_heads = cfg.num_attention_heads
        self.total_kv_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.act_name = getattr(cfg, "activation_function", "relu")
        self.norm_eps = 1e-5

    def build_params(self, pb) -> Dict[str, Any]:
        base = "model.decoder"
        params: Dict[str, Any] = {}
        params["embed"] = pb.array(
            f"{base}.embed_tokens.weight",
            shard_axis=0 if pb.tp_size > 1 else None)
        params["pos_embed"] = pb.array(f"{base}.embed_positions.weight")
        h = self.total_heads
        layers = []
        for i in range(self.num_layers):
            pfx = f"{base}.layers.{i}"
            qkv = pb.qkv(f"{pfx}.self_attn.q_proj",
                         f"{pfx}.self_attn.k_proj",
                         f"{pfx}.self_attn.v_proj", h, h, self.head_dim,
                         bias=True)
            o, o_b = pb.linear([f"{pfx}.self_attn.out_proj"], shard="row",
                               bias=True)
            fc1, _ = pb.linear([f"{pfx}.fc1"], shard="col", bias=True)
            fc2, fc2_b = pb.linear([f"{pfx}.fc2"], shard="row", bias=True)
            layers.append({
                "ln1": self._norm_params(pb,
                                         f"{pfx}.self_attn_layer_norm"),
                "ln2": self._norm_params(pb, f"{pfx}.final_layer_norm"),
                "qkv": qkv, "o": o, "o_bias": o_b,
                "fc1": fc1, "fc2": fc2, "fc2_bias": fc2_b,
            })
        params["layers"] = layers
        params["final_norm"] = self._norm_params(pb,
                                                 f"{base}.final_layer_norm")
        params["lm_head"] = pb.array(
            f"{base}.embed_tokens.weight", transpose=True,
            shard_axis=1 if pb.tp_size > 1 else None)
        return params
