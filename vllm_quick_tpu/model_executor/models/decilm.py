"""DeciLM (reference parity: vllm/model_executor/models/decilm.py).

Llama decoder with *variable GQA*: each layer has its own KV-head count
(config.num_key_value_heads_per_layer). The paged cache wants a uniform
shape, so K/V projections are expanded at load time to the maximum KV
count by repeating each head's columns — numerically identical GQA
(the reference instead degroups to the uniform count in its
load_weights; same idea).
"""
from typing import Any, Dict

import numpy as np

from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM


def _expand_kv(w: np.ndarray, kv_l: int, kv_u: int,
               head_dim: int) -> np.ndarray:
    """[N=kv_l*hd, K] HF layout -> repeat each head block to kv_u."""
    rep = kv_u // kv_l
    n, k = w.shape
    return np.repeat(w.reshape(kv_l, head_dim, k), rep,
                     axis=0).reshape(kv_u * head_dim, k)


class DeciLMForCausalLM(LlamaForCausalLM):

    def __init__(self, hf_config, quant=None, ctx=None, dtype="bfloat16"):
        self.kv_per_layer = list(
            getattr(hf_config, "num_key_value_heads_per_layer", None)
            or [getattr(hf_config, "num_key_value_heads",
                        hf_config.num_attention_heads)]
            * hf_config.num_hidden_layers)
        hf_config.num_key_value_heads = max(self.kv_per_layer)
        from vllm_quick_tpu.parallel.mesh import ParallelContext
        super().__init__(hf_config, quant=quant,
                         ctx=ctx or ParallelContext(), dtype=dtype)

    def load_params(self, weights: Dict[str, np.ndarray],
                    tp_rank: int = 0) -> Dict[str, Any]:
        kv_u = max(self.kv_per_layer)
        weights = dict(weights)
        for i, kv_l in enumerate(self.kv_per_layer):
            if kv_l == kv_u:
                continue
            for proj in ("k_proj", "v_proj"):
                name = f"model.layers.{i}.self_attn.{proj}.weight"
                weights[name] = _expand_kv(weights[name], kv_l, kv_u,
                                           self.head_dim)
        return super().load_params(weights, tp_rank=tp_rank)
