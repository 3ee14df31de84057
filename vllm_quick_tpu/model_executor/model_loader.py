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
    mesh=None,
) -> Tuple[Any, Dict[str, Any]]:
    """Returns (model, params). ``model`` is the static module tree;
    ``params`` the weight pytree (host->device placed by the worker).

    With ``ctx.tp_size > 1`` and a mesh, per-rank shards are loaded the
    way the reference's weight_loader slices at load time
    (weight_utils.py:203-261) and assembled into mesh-sharded global
    arrays (parallel/sharding.py).
    """
    cls = _get_model_cls(model_config)
    # Auto-detect checkpoint quantization even when not requested
    # (reference: config.py _verify_quantization + weight_utils.py:86).
    quant: Optional[QuantCheckpointConfig] = QuantCheckpointConfig.\
        from_model_dir(model_config.model, model_config.quantization)
    # Quantized Mixtral routes to the per-expert-linear variant
    # (reference hack: model_loader.py:27-29 -> mixtral_quant).
    if quant is not None and cls.__name__ == "MixtralForCausalLM":
        from vllm_quick_tpu.model_executor.models.mixtral_quant import (
            MixtralQuantForCausalLM)
        cls = MixtralQuantForCausalLM
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
    dummy = model_config.load_format == "dummy"
    if not dummy:
        weights = collect_weights(model_config.model,
                                  model_config.load_format)

    if ctx.tp_size > 1:
        from vllm_quick_tpu.parallel.sharding import (
            assemble_global_params, param_pspecs)
        rank_params = []
        for r in range(ctx.tp_size):
            if dummy:
                rank_params.append(model.init_dummy_params(
                    model_config.seed))
            else:
                rank_params.append(model.load_params(weights, tp_rank=r))
        specs = param_pspecs(rank_params[0])
        params = assemble_global_params(rank_params, specs, mesh)
        return model, params

    if dummy:
        params = model.init_dummy_params(model_config.seed)
    else:
        params = model.load_params(weights, tp_rank=tp_rank)
    params = _maybe_quantize_lm_head(model_config, params)
    return model, params


def _maybe_quantize_lm_head(model_config, params):
    """lm_head_dtype=int8 (or VLLM_TPU_LMHEAD_I8=1): replace the bf16
    head with per-column int8 PTQ ({"wi8","s"}; consumed by
    layers/vocab_embedding.unembed). Single-chip only — under tp the
    head is mesh-sharded and the pspec machinery doesn't carry dicts."""
    import os

    want = (getattr(model_config, "lm_head_dtype", "auto") == "int8"
            or os.environ.get("VLLM_TPU_LMHEAD_I8"))
    if not want or not isinstance(params, dict):
        return params
    w = params.get("lm_head")
    if w is None or isinstance(w, dict):
        return params
    from vllm_quick_tpu.ops.dense_matmul import quantize_cols_i8
    wi8, s = quantize_cols_i8(w)
    params["lm_head"] = {"wi8": wi8, "s": s}
    return params
