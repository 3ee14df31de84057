"""Engine configuration objects.

Same six-config shape as the reference (vllm/config.py:18,274,352,413,460,466)
with TPU-native replacements: ``ParallelConfig`` describes a
``jax.sharding.Mesh`` (tp/dp/ep axes over ICI/DCN) instead of NCCL
process groups, and ``CacheConfig`` sizes paged KV blocks in sharded HBM.
"""
import os
from typing import Optional, Union

from transformers import AutoConfig, PretrainedConfig

from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.utils import get_cpu_memory

logger = init_logger(__name__)

_GB = 1 << 30


class ModelConfig:
    """Model + tokenizer + dtype + quantization configuration.

    Reference parity: vllm/config.py:18-272 (HF config introspection,
    max-len derivation, quantization verification).
    """

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        trust_remote_code: bool = False,
        download_dir: Optional[str] = None,
        load_format: str = "auto",
        dtype: Union[str, "object"] = "auto",
        seed: int = 0,
        revision: Optional[str] = None,
        tokenizer_revision: Optional[str] = None,
        max_model_len: Optional[int] = None,
        quantization: Optional[str] = None,
        enforce_eager: bool = False,
        max_context_len_to_capture: Optional[int] = None,
        hf_config: Optional[PretrainedConfig] = None,
        lm_head_dtype: str = "auto",
    ) -> None:
        self.model = model
        self.tokenizer = tokenizer or model
        self.tokenizer_mode = tokenizer_mode
        self.trust_remote_code = trust_remote_code
        self.download_dir = download_dir
        self.load_format = load_format
        self.seed = seed
        self.revision = revision
        self.tokenizer_revision = tokenizer_revision
        self.quantization = quantization
        self.enforce_eager = enforce_eager
        self.max_context_len_to_capture = max_context_len_to_capture
        # "auto" keeps the checkpoint head dtype; "int8" applies
        # per-column symmetric PTQ at load (ops/dense_matmul.py),
        # halving the lm_head HBM stream in the decode step.
        if lm_head_dtype not in ("auto", "int8"):
            raise ValueError(
                f"lm_head_dtype must be auto|int8, got {lm_head_dtype}")
        self.lm_head_dtype = lm_head_dtype

        self._verify_load_format()
        self._verify_tokenizer_mode()

        if hf_config is not None:
            self.hf_config = hf_config
        else:
            from vllm_quick_tpu.transformers_utils.config import get_config
            self.hf_config = get_config(model, trust_remote_code, revision)

        self.dtype = _get_and_verify_dtype(self.hf_config, dtype)
        self.max_model_len = _get_and_verify_max_len(self.hf_config,
                                                     max_model_len)
        self._verify_quantization()

    def _verify_load_format(self) -> None:
        load_format = self.load_format.lower()
        if load_format not in ("auto", "pt", "safetensors", "npcache",
                               "dummy"):
            raise ValueError(
                f"Unknown load format: {self.load_format}. Must be one of "
                "'auto', 'pt', 'safetensors', 'npcache', or 'dummy'.")
        self.load_format = load_format

    def _verify_tokenizer_mode(self) -> None:
        tokenizer_mode = self.tokenizer_mode.lower()
        if tokenizer_mode not in ("auto", "slow"):
            raise ValueError(
                f"Unknown tokenizer mode: {self.tokenizer_mode}. "
                "Must be 'auto' or 'slow'.")
        self.tokenizer_mode = tokenizer_mode

    def _verify_quantization(self) -> None:
        supported = ("awq", "gptq", "squeezellm")
        if self.quantization is not None:
            self.quantization = self.quantization.lower()
        hf_quant_config = getattr(self.hf_config, "quantization_config", None)
        if hf_quant_config is not None:
            hf_method = str(hf_quant_config.get("quant_method", "")).lower()
            if self.quantization is None:
                self.quantization = hf_method
            elif self.quantization != hf_method:
                raise ValueError(
                    "Quantization method in the model config "
                    f"({hf_method}) does not match the requested "
                    f"quantization ({self.quantization}).")
        if self.quantization is not None and \
                self.quantization not in supported:
            raise ValueError(
                f"Unknown quantization method: {self.quantization}. "
                f"Must be one of {supported}.")

    def verify_with_parallel_config(
            self, parallel_config: "ParallelConfig") -> None:
        total_num_attention_heads = self.hf_config.num_attention_heads
        tp = parallel_config.tensor_parallel_size
        if total_num_attention_heads % tp != 0:
            raise ValueError(
                f"Number of attention heads ({total_num_attention_heads}) "
                f"must be divisible by tensor parallel size ({tp}).")
        total_num_hidden_layers = self.hf_config.num_hidden_layers
        pp = parallel_config.pipeline_parallel_size
        if total_num_hidden_layers % pp != 0:
            raise ValueError(
                f"Number of hidden layers ({total_num_hidden_layers}) "
                f"must be divisible by pipeline parallel size ({pp}).")

    def get_hidden_size(self) -> int:
        return self.hf_config.hidden_size

    def get_head_size(self) -> int:
        if hasattr(self.hf_config, "head_dim") and \
                self.hf_config.head_dim is not None:
            return self.hf_config.head_dim
        return (self.hf_config.hidden_size //
                self.hf_config.num_attention_heads)

    def get_total_num_kv_heads(self) -> int:
        """Total KV heads before tensor-parallel sharding."""
        falcon_like = ["falcon", "RefinedWeb", "RefinedWebModel"]
        if self.hf_config.model_type in falcon_like:
            new_decoder_arch = getattr(self.hf_config,
                                       "new_decoder_architecture", False)
            if not new_decoder_arch and getattr(self.hf_config,
                                                "multi_query", False):
                return 1
        attributes = (
            "n_head_kv",
            "num_kv_heads",
            "num_key_value_heads",
            "multi_query_group_num",
        )
        for attr in attributes:
            num = getattr(self.hf_config, attr, None)
            if num is not None:
                return num
        return self.hf_config.num_attention_heads

    def get_num_kv_heads(self, parallel_config: "ParallelConfig") -> int:
        """KV heads per TP shard; heads are replicated when TP exceeds
        the head count (reference: vllm/config.py:259-267)."""
        total = self.get_total_num_kv_heads()
        return max(1, total // parallel_config.tensor_parallel_size)

    def get_num_attention_heads(
            self, parallel_config: "ParallelConfig") -> int:
        return (self.hf_config.num_attention_heads //
                parallel_config.tensor_parallel_size)

    def get_num_layers(self, parallel_config: "ParallelConfig") -> int:
        return (self.hf_config.num_hidden_layers //
                parallel_config.pipeline_parallel_size)

    def get_sliding_window(self) -> Optional[int]:
        return getattr(self.hf_config, "sliding_window", None)

    def get_vocab_size(self) -> int:
        return self.hf_config.vocab_size


class CacheConfig:
    """Paged KV cache sizing (reference: vllm/config.py:274-350).

    ``cache_dtype``: 'auto' follows the model dtype; 'fp8_e5m2' stores KV
    in 8 bits (native on TPU v5e+); 'int8' stores KV with per-head scales.
    """

    def __init__(
        self,
        block_size: int = 16,
        gpu_memory_utilization: float = 0.90,
        swap_space: int = 4,
        cache_dtype: str = "auto",
        sliding_window: Optional[int] = None,
        num_tpu_blocks_override: Optional[int] = None,
    ) -> None:
        self.block_size = block_size
        # Kept under the reference flag name for CLI compatibility; on TPU
        # this is the fraction of per-chip HBM the engine may use.
        self.gpu_memory_utilization = gpu_memory_utilization
        self.swap_space_bytes = swap_space * _GB
        self.cache_dtype = cache_dtype
        self.sliding_window = sliding_window
        self.num_tpu_blocks_override = num_tpu_blocks_override
        self._verify_args()
        self._verify_cache_dtype()

        # Populated after memory profiling.
        self.num_gpu_blocks: Optional[int] = None  # TPU HBM blocks
        self.num_cpu_blocks: Optional[int] = None  # host swap blocks

    def _verify_args(self) -> None:
        if self.gpu_memory_utilization > 1.0:
            raise ValueError(
                "HBM memory utilization must be at most 1.0, got "
                f"{self.gpu_memory_utilization}.")
        if self.block_size < 1:
            raise ValueError(f"block_size must be >= 1, got {self.block_size}")

    def _verify_cache_dtype(self) -> None:
        if self.cache_dtype not in ("auto", "fp8_e5m2", "int8"):
            raise ValueError(f"Unknown kv cache dtype: {self.cache_dtype}")
        if self.cache_dtype == "fp8_e5m2":
            logger.info("Using fp8_e5m2 KV cache: it halves KV HBM "
                        "footprint at a small accuracy cost.")

    def verify_with_parallel_config(
            self, parallel_config: "ParallelConfig") -> None:
        total_cpu_memory = get_cpu_memory()
        num_hosts = parallel_config.num_hosts
        cpu_memory_usage = self.swap_space_bytes * num_hosts
        msg = (f"{cpu_memory_usage / _GB:.2f} GiB out of "
               f"{total_cpu_memory / _GB:.2f} GiB host memory reserved "
               "for KV swap.")
        if cpu_memory_usage > 0.7 * total_cpu_memory:
            raise ValueError("Too large swap space. " + msg)
        elif cpu_memory_usage > 0.4 * total_cpu_memory:
            logger.warning("Possibly too large swap space. %s", msg)


class ParallelConfig:
    """Device-mesh description: TPU-native replacement of the reference's
    NCCL/Ray parallel config (vllm/config.py:352-411).

    The mesh axes are (dp, ep?, tp); collectives ride ICI within a host
    and DCN across hosts. Pipeline parallelism is accepted in the data
    model (axis reserved) but not yet wired into execution, mirroring the
    reference which rejects it outright.
    """

    def __init__(
        self,
        pipeline_parallel_size: int = 1,
        tensor_parallel_size: int = 1,
        data_parallel_size: int = 1,
        expert_parallel_size: int = 1,
        sequence_parallel_size: int = 1,
        worker_use_ray: bool = False,  # accepted for CLI parity; unused
        max_parallel_loading_workers: Optional[int] = None,
        disable_custom_all_reduce: bool = False,  # CLI parity; ICI is native
        num_hosts: int = 1,
    ) -> None:
        self.pipeline_parallel_size = pipeline_parallel_size
        self.tensor_parallel_size = tensor_parallel_size
        self.data_parallel_size = data_parallel_size
        self.expert_parallel_size = expert_parallel_size
        self.sequence_parallel_size = sequence_parallel_size
        self.worker_use_ray = worker_use_ray
        self.max_parallel_loading_workers = max_parallel_loading_workers
        self.disable_custom_all_reduce = disable_custom_all_reduce
        self.num_hosts = num_hosts

        self.world_size = (pipeline_parallel_size * tensor_parallel_size *
                           data_parallel_size * expert_parallel_size *
                           sequence_parallel_size)
        self._verify_args()

    def _verify_args(self) -> None:
        if self.pipeline_parallel_size > 1:
            # (The reference rejects pp entirely, config.py:388-390.)
            pp = self.pipeline_parallel_size
            if pp & (pp - 1):
                raise ValueError(
                    "pipeline_parallel_size must be a power of two "
                    "(batch buckets split into pp microbatches)")
            if (self.data_parallel_size > 1
                    or self.expert_parallel_size > 1
                    or self.sequence_parallel_size > 1):
                raise NotImplementedError(
                    "pipeline parallelism currently composes with tp "
                    "only")
        if self.sequence_parallel_size > 1 and (
                self.data_parallel_size > 1
                or self.expert_parallel_size > 1):
            raise NotImplementedError(
                "sequence parallelism currently composes with tp only")

    @property
    def mesh_shape(self):
        return (self.data_parallel_size, self.pipeline_parallel_size,
                self.expert_parallel_size, self.sequence_parallel_size,
                self.tensor_parallel_size)

    @property
    def mesh_axis_names(self):
        return ("dp", "pp", "ep", "sp", "tp")


class SchedulerConfig:
    """Continuous-batching budgets (reference: vllm/config.py:413-458)."""

    def __init__(
        self,
        max_num_batched_tokens: Optional[int],
        max_num_seqs: int,
        max_model_len: int,
        max_paddings: int = 256,
        speculative_model: Optional[str] = None,
        num_speculative_tokens: int = 4,
        num_decode_steps: int = 1,
        enable_chunked_prefill: bool = False,
    ) -> None:
        if max_num_batched_tokens is not None:
            self.max_num_batched_tokens = max_num_batched_tokens
        else:
            self.max_num_batched_tokens = max(max_model_len, 2048)
        self.max_num_seqs = max_num_seqs
        self.max_model_len = max_model_len
        self.max_paddings = max_paddings
        # Speculative decoding: a draft model proposes
        # num_speculative_tokens per step; the target model scores them
        # in one forward and rejection sampling keeps the exact target
        # distribution. The scheduler reserves the lookahead KV slots.
        self.speculative_model = speculative_model
        self.num_speculative_tokens = num_speculative_tokens
        # Multi-step decode: run num_decode_steps decode iterations
        # (step + in-graph sampling) in ONE device dispatch, emitting
        # that many tokens per sequence per engine step. Cuts the
        # per-step host round-trip cost by the same factor — decisive
        # on remote-attached accelerators. The scheduler reserves the
        # extra KV slots exactly like speculative lookahead.
        self.num_decode_steps = num_decode_steps
        # Chunked prefill: prompts longer than the per-step token
        # budget are processed block-aligned-chunk by chunk through the
        # prefix-attention path, so max_model_len is no longer capped
        # by max_num_batched_tokens and one giant prompt cannot
        # monopolize the step loop. (The reference rejects such
        # prompts outright: core/scheduler.py:193-202.)
        self.enable_chunked_prefill = enable_chunked_prefill
        self._verify_args()

    def _verify_args(self) -> None:
        if (self.max_num_batched_tokens < self.max_model_len
                and not self.enable_chunked_prefill):
            raise ValueError(
                f"max_num_batched_tokens ({self.max_num_batched_tokens}) is "
                f"smaller than max_model_len ({self.max_model_len}). "
                "This effectively limits the maximum sequence length to "
                "max_num_batched_tokens and makes the engine reject longer "
                "sequences.")
        if self.max_num_batched_tokens < self.max_num_seqs:
            raise ValueError(
                f"max_num_batched_tokens ({self.max_num_batched_tokens}) "
                f"must be >= max_num_seqs ({self.max_num_seqs}).")
        if self.num_decode_steps < 1:
            raise ValueError("num_decode_steps must be >= 1, got "
                             f"{self.num_decode_steps}")
        if self.num_decode_steps > 1 and self.speculative_model:
            raise ValueError(
                "multi-step decode (num_decode_steps > 1) and "
                "speculative decoding are mutually exclusive")
        if self.enable_chunked_prefill and self.speculative_model:
            raise ValueError(
                "chunked prefill and speculative decoding are "
                "mutually exclusive")


class DeviceConfig:
    """Target platform: 'tpu' (or 'cpu' for tests/virtual meshes)."""

    def __init__(self, device: str = "auto") -> None:
        if device == "auto":
            import jax
            try:
                device = jax.devices()[0].platform
            except RuntimeError:
                device = "cpu"
            if device not in ("tpu", "cpu"):
                # axon / plugin platforms report their own name but are TPU.
                device = "tpu"
        self.device = device


class LoRAConfig:
    """Multi-LoRA serving limits (reference: vllm/config.py:460-?)."""

    def __init__(
        self,
        max_lora_rank: int = 16,
        max_loras: int = 1,
        max_cpu_loras: Optional[int] = None,
        lora_dtype: Optional[str] = None,
        lora_extra_vocab_size: int = 256,
    ) -> None:
        self.max_lora_rank = max_lora_rank
        self.max_loras = max_loras
        self.max_cpu_loras = max_cpu_loras
        self.lora_dtype = lora_dtype
        self.lora_extra_vocab_size = lora_extra_vocab_size
        self._verify_args()

    def _verify_args(self) -> None:
        possible_ranks = (8, 16, 32, 64, 128, 256)
        if self.max_lora_rank not in possible_ranks:
            raise ValueError(
                f"max_lora_rank ({self.max_lora_rank}) must be one of "
                f"{possible_ranks}.")
        if self.max_loras < 1:
            raise ValueError(f"max_loras ({self.max_loras}) must be >= 1.")
        if self.max_cpu_loras is None:
            self.max_cpu_loras = self.max_loras
        elif self.max_cpu_loras < self.max_loras:
            raise ValueError(
                f"max_cpu_loras ({self.max_cpu_loras}) must be >= "
                f"max_loras ({self.max_loras}).")

    def verify_with_model_config(self, model_config: ModelConfig) -> None:
        if self.lora_dtype in (None, "auto"):
            self.lora_dtype = model_config.dtype

    def verify_with_scheduler_config(
            self, scheduler_config: SchedulerConfig) -> None:
        if scheduler_config.max_num_batched_tokens > 65528:
            raise ValueError(
                "Due to limitations of the LoRA gather kernel, "
                "max_num_batched_tokens must be <= 65528 when "
                "LoRA is enabled.")


_STR_DTYPE_TO_JNP_DTYPE = {
    "half": "float16",
    "float16": "float16",
    "float": "float32",
    "float32": "float32",
    "bfloat16": "bfloat16",
}


def _get_and_verify_dtype(config: PretrainedConfig,
                          dtype: Union[str, "object"]) -> str:
    """Resolve the compute dtype. On TPU we default everything to
    bfloat16 — fp16 has no hardware advantage on the MXU and bf16 is the
    native accumulate-feed type."""
    config_dtype = getattr(config, "torch_dtype", None)
    if config_dtype is not None and not isinstance(config_dtype, str):
        config_dtype = str(config_dtype).replace("torch.", "")
    if config_dtype is None:
        config_dtype = "float32"

    if isinstance(dtype, str):
        dtype = dtype.lower()
        if dtype == "auto":
            if config_dtype in ("float32", "float"):
                resolved = "float32"
            else:
                # fp16 checkpoints run in bf16 on TPU.
                resolved = "bfloat16"
        else:
            if dtype not in _STR_DTYPE_TO_JNP_DTYPE:
                raise ValueError(f"Unknown dtype: {dtype}")
            resolved = _STR_DTYPE_TO_JNP_DTYPE[dtype]
    else:
        resolved = str(dtype)

    if resolved == "float16":
        logger.warning("float16 requested; using bfloat16 on TPU (fp16 has "
                       "no MXU advantage and narrower exponent range).")
        resolved = "bfloat16"
    return resolved


def _get_and_verify_max_len(
    hf_config: PretrainedConfig,
    max_model_len: Optional[int],
) -> int:
    """Derive max context length from the HF config, honoring RoPE scaling
    (reference: vllm/config.py:576-631)."""
    derived_max_model_len = float("inf")
    possible_keys = (
        "max_position_embeddings",
        "n_positions",
        "max_seq_len",
        "seq_length",
        "max_sequence_length",
        "max_seq_length",
        "seq_len",
    )
    for key in possible_keys:
        max_len = getattr(hf_config, key, None)
        if max_len is not None:
            derived_max_model_len = min(derived_max_model_len, max_len)
    if derived_max_model_len == float("inf"):
        if max_model_len is not None:
            return max_model_len
        default_max_len = 2048
        logger.warning(
            "The model's config.json does not contain any of %s. "
            "Assuming the model's maximum length is %d.", possible_keys,
            default_max_len)
        derived_max_model_len = default_max_len

    rope_scaling = getattr(hf_config, "rope_scaling", None)
    if rope_scaling is not None:
        scaling_type = rope_scaling.get("type") or rope_scaling.get(
            "rope_type")
        if scaling_type != "yarn":
            derived_max_model_len *= rope_scaling.get("factor", 1.0)
        else:
            derived_max_model_len = rope_scaling[
                "original_max_position_embeddings"] * rope_scaling["factor"]

    if max_model_len is None:
        return int(derived_max_model_len)
    if max_model_len > derived_max_model_len:
        raise ValueError(
            f"User-specified max_model_len ({max_model_len}) is greater "
            f"than the derived max_model_len ({int(derived_max_model_len)}). "
            "Make sure the value is correct and within the model context "
            "size.")
    return max_model_len
