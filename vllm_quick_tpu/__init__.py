"""vllm-quick-tpu: TPU-native continuous-batching LLM serving engine with
QUICK-style INT4 quantized inference (JAX/XLA/Pallas).

Top-level surface mirrors the reference (vllm/__init__.py) so users can
switch imports 1:1.
"""
from vllm_quick_tpu.engine.arg_utils import AsyncEngineArgs, EngineArgs
from vllm_quick_tpu.engine.llm_engine import LLMEngine
from vllm_quick_tpu.entrypoints.llm import LLM
from vllm_quick_tpu.outputs import CompletionOutput, RequestOutput
from vllm_quick_tpu.sampling_params import SamplingParams

__version__ = "0.3.0"

__all__ = [
    "LLM",
    "SamplingParams",
    "RequestOutput",
    "CompletionOutput",
    "LLMEngine",
    "EngineArgs",
    "AsyncEngineArgs",
    "__version__",
]
