"""Model instantiation + weight loading entrypoint.

Reference parity: vllm/model_executor/model_loader.py:40-88 (arch
lookup, quant capability check, build + load_weights | dummy init).
"""
from typing import Any, Dict, Optional, Tuple

from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.model_executor.models import ModelRegistry
from vllm_quick_tpu.model_executor.weight_utils import (
    QuantCheckpointConfig, collect_weights)
from vllm_quick_tpu.parallel.mesh import ParallelContext

logger = init_logger(__name__)


def _get_model_cls(model_config: ModelConfig):
    architectures = getattr(model_config.hf_config, "architectures", [])
    for arch in architectures:
        cls = ModelRegistry.load_model_cls(arch)
        if cls is not None:
            return cls
    raise ValueError(
        f"Model architectures {architectures} are not supported. "
        f"Supported: {ModelRegistry.get_supported_archs()}")


def get_model(
    model_config: ModelConfig,
    ctx: ParallelContext = ParallelContext(),
    tp_rank: int = 0,
) -> Tuple[Any, Dict[str, Any]]:
    """Returns (model, params). ``model`` is the static module tree;
    ``params`` the weight pytree (host->device placed by the worker)."""
    cls = _get_model_cls(model_config)
    # Auto-detect checkpoint quantization even when not requested
    # (reference: config.py _verify_quantization + weight_utils.py:86).
    quant: Optional[QuantCheckpointConfig] = QuantCheckpointConfig.\
        from_model_dir(model_config.model, model_config.quantization)
    if quant is not None and model_config.quantization is not None \
            and quant.method != model_config.quantization:
        raise ValueError(
            f"Checkpoint quant method {quant.method} != requested "
            f"{model_config.quantization}")
    if quant is not None and not getattr(cls, "supports_quantization",
                                         False):
        raise ValueError(f"{cls.__name__} does not support quantized "
                         "checkpoints yet.")

    model = cls(model_config.hf_config, quant=quant, ctx=ctx,
                dtype=model_config.dtype)
    if model_config.load_format == "dummy":
        params = model.init_dummy_params(model_config.seed)
    else:
        weights = collect_weights(model_config.model,
                                  model_config.load_format)
        params = model.load_params(weights, tp_rank=tp_rank)
    return model, params
