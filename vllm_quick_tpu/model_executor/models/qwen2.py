"""Qwen2 (reference parity: vllm/model_executor/models/qwen2.py).

Llama-family decoder with QKV biases and optional tied embeddings; the
shared Llama module already loads per-projection biases when present.
"""
from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM


class Qwen2ForCausalLM(LlamaForCausalLM):
    pass
