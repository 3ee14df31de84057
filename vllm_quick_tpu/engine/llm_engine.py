"""LLMEngine: the central orchestrator.

Reference parity: vllm/engine/llm_engine.py:40-1044 — owns tokenizer,
scheduler and worker; request lifecycle (add/abort/step); incremental
detokenization; stop handling; parallel-sampling forks and full beam
search bookkeeping. TPU-native deltas (SURVEY.md §7): no Ray actors and
no driver/follower broadcast — one SPMD process per host drives all
local chips through jitted steps.
"""
import copy
import os
import time
from collections import defaultdict
from typing import Any, Iterable, List, Optional, Tuple, Union

from vllm_quick_tpu.config import (CacheConfig, DeviceConfig, LoRAConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
from vllm_quick_tpu.core.scheduler import Scheduler, SchedulerOutputs
from vllm_quick_tpu.engine.arg_utils import EngineArgs
from vllm_quick_tpu.engine.metrics import StatLogger, Stats
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.outputs import RequestOutput
from vllm_quick_tpu.parallel.mesh import ParallelContext, make_mesh
from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.sequence import (SamplerOutput, Sequence, SequenceGroup,
                                     SequenceGroupOutput, SequenceStatus)
from vllm_quick_tpu.transformers_utils.tokenizer import (
    TokenizerGroup, detokenize_incrementally)
from vllm_quick_tpu.utils import Counter
from vllm_quick_tpu.worker.worker import Worker

logger = init_logger(__name__)

_LOCAL_LOGGING_INTERVAL_SEC = 5.0


class LLMEngine:

    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        device_config: DeviceConfig,
        lora_config: Optional[LoRAConfig],
        log_stats: bool = True,
    ) -> None:
        logger.info(
            "Initializing a TPU LLM engine: model=%r, tokenizer=%r, "
            "dtype=%s, quantization=%s, tp=%d, max_seq_len=%d, "
            "kv_cache_dtype=%s, seed=%d",
            model_config.model, model_config.tokenizer, model_config.dtype,
            model_config.quantization, parallel_config.tensor_parallel_size,
            model_config.max_model_len, cache_config.cache_dtype,
            model_config.seed)
        # Persistent XLA compilation cache: restarted servers and
        # benchmarks replay previously-compiled buckets instead of
        # paying multi-minute tunnel compiles (utils docstring).
        from vllm_quick_tpu.utils import enable_persistent_compilation_cache
        enable_persistent_compilation_cache()
        # Optional jax.profiler endpoint (SURVEY §5: trace/profiling):
        # point TensorBoard/xprof at this port for live device traces.
        port = os.environ.get("VLLM_TPU_PROFILER_PORT")
        if port:
            import jax
            jax.profiler.start_server(int(port))
            logger.info("jax.profiler server listening on port %s", port)
        if (cache_config.cache_dtype == "fp8_e5m2"
                and scheduler_config.max_num_seqs < 8):
            # Measured on v5e (BREAKDOWN.md): at batch 1 the in-kernel
            # fp8->bf16 load-convert costs more than the halved KV reads
            # save (~12% slower); fp8 KV pays off from batch ~8.
            logger.warning(
                "kv_cache_dtype=fp8_e5m2 with max_num_seqs=%d: fp8 KV is "
                "slower than bf16 below ~8 concurrent sequences; it pays "
                "off only at larger batch sizes.",
                scheduler_config.max_num_seqs)
        self.model_config = model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.device_config = device_config
        self.lora_config = lora_config
        self.log_stats = log_stats

        self.seq_counter = Counter()
        self._init_tokenizer()

        sp = getattr(parallel_config, "sequence_parallel_size", 1)
        if sp > 1:
            if getattr(scheduler_config, "speculative_model", None):
                raise ValueError("speculative decoding + sequence "
                                 "parallelism is unsupported")
            if getattr(scheduler_config, "enable_chunked_prefill",
                       False):
                raise ValueError("chunked prefill + sequence "
                                 "parallelism is unsupported (sp "
                                 "already splits the prompt across "
                                 "chips)")
        pp = getattr(parallel_config, "pipeline_parallel_size", 1)
        # Multi-LoRA + multihost: the driver's per-step payload carries
        # its slot assignments and followers replay them from their own
        # filesystem copies (worker_manager.sync_slots), keeping every
        # host's adapter stacks identical — adapter checkpoints must be
        # present at the same path on all hosts (same contract as model
        # weights). Proven token-identical by
        # tests/distributed/test_multihost_lora_2proc.py.
        ctx = ParallelContext(
            tp_size=parallel_config.tensor_parallel_size,
            dp_size=parallel_config.data_parallel_size,
            ep_size=parallel_config.expert_parallel_size,
            sp_size=sp,
            pp_size=pp,
        )
        mesh = None
        if parallel_config.world_size > 1:
            mesh = make_mesh(
                tensor_parallel_size=parallel_config.tensor_parallel_size,
                data_parallel_size=parallel_config.data_parallel_size,
                expert_parallel_size=parallel_config.expert_parallel_size,
                sequence_parallel_size=getattr(
                    parallel_config, "sequence_parallel_size", 1),
                pipeline_parallel_size=pp)
        if getattr(scheduler_config, "speculative_model", None):
            from vllm_quick_tpu.worker.spec_decode.spec_worker import (
                SpecDecodeWorker)
            draft_config = ModelConfig(
                model=scheduler_config.speculative_model,
                tokenizer=model_config.tokenizer,
                dtype=model_config.dtype,
                seed=model_config.seed,
                max_model_len=model_config.max_model_len,
                trust_remote_code=model_config.trust_remote_code,
            )
            self.worker = SpecDecodeWorker(
                model_config, parallel_config, scheduler_config,
                device_config, cache_config, lora_config, ctx=ctx,
                mesh=mesh, draft_model_config=draft_config,
                num_speculative_tokens=scheduler_config
                .num_speculative_tokens)
        else:
            self.worker = Worker(model_config, parallel_config,
                                 scheduler_config, device_config,
                                 cache_config, lora_config, ctx=ctx,
                                 mesh=mesh)
        self.worker.init_model()
        self.worker.load_model()
        self._init_cache()

        if (scheduler_config.num_decode_steps > 1
                and getattr(self.worker.model_runner, "_fused_step",
                            None) is None):
            # Multi-step decode rides the single-host fused
            # step+sampler dispatch; on multi-device/multi-host
            # deployments it would silently no-op while still
            # reserving k-1 lookahead KV slots per sequence — downgrade
            # loudly instead.
            logger.warning(
                "num_decode_steps=%d requires the single-host fused "
                "decode dispatch (world size 1); falling back to "
                "single-step decode.", scheduler_config.num_decode_steps)
            scheduler_config.num_decode_steps = 1

        self.scheduler = Scheduler(
            scheduler_config, cache_config, lora_config,
            sp_size=getattr(parallel_config, "sequence_parallel_size",
                            1))
        self.stat_logger = StatLogger(
            local_interval=_LOCAL_LOGGING_INTERVAL_SEC,
            labels=dict(model_name=model_config.model)) \
            if log_stats else None

    # -- init ------------------------------------------------------------

    def _init_tokenizer(self, **kwargs: Any) -> None:
        init_kwargs = dict(
            enable_lora=bool(self.lora_config),
            max_input_length=None,
            tokenizer_mode=self.model_config.tokenizer_mode,
            trust_remote_code=self.model_config.trust_remote_code,
            tokenizer_revision=self.model_config.tokenizer_revision,
        )
        init_kwargs.update(kwargs)
        self.tokenizer = TokenizerGroup(self.model_config.tokenizer,
                                        **init_kwargs)

    def _init_cache(self) -> None:
        """Profile memory and allocate the paged KV cache
        (reference: llm_engine.py:301-361)."""
        if self.cache_config.num_tpu_blocks_override is not None:
            num_tpu_blocks = self.cache_config.num_tpu_blocks_override
            from vllm_quick_tpu.worker.cache_engine import CacheEngine
            block_bytes = CacheEngine.get_cache_block_size(
                self.cache_config.block_size, self.cache_config.cache_dtype,
                self.model_config, self.parallel_config)
            num_cpu_blocks = int(
                self.cache_config.swap_space_bytes // block_bytes)
        else:
            num_tpu_blocks, num_cpu_blocks = \
                self.worker.profile_num_available_blocks(
                    self.cache_config.block_size,
                    self.cache_config.gpu_memory_utilization,
                    self.cache_config.swap_space_bytes,
                    self.cache_config.cache_dtype)
        logger.info("# TPU blocks: %d, # CPU blocks: %d", num_tpu_blocks,
                    num_cpu_blocks)
        if num_tpu_blocks <= 0:
            raise ValueError(
                "No available memory for the KV cache. Try increasing "
                "gpu_memory_utilization.")
        max_seq_len = self.cache_config.block_size * num_tpu_blocks
        if self.model_config.max_model_len > max_seq_len:
            raise ValueError(
                f"The model's max seq len ({self.model_config.max_model_len}"
                ") is larger than the maximum number of tokens that can be "
                f"stored in the KV cache ({max_seq_len}). Increase "
                "gpu_memory_utilization or decrease max_model_len.")
        sp = getattr(self.parallel_config, "sequence_parallel_size", 1)
        if sp > 1:
            # The sp-sharded pool is shard-major with a per-shard null
            # block; round the total down to an sp multiple.
            num_tpu_blocks -= num_tpu_blocks % sp
        self.cache_config.num_gpu_blocks = num_tpu_blocks
        self.cache_config.num_cpu_blocks = num_cpu_blocks
        self.worker.init_cache_engine(self.cache_config)
        self.worker.warm_up_model()

    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs) -> "LLMEngine":
        engine_configs = engine_args.create_engine_configs()
        return cls(*engine_configs,
                   log_stats=not engine_args.disable_log_stats)

    # -- multi-host -------------------------------------------------------

    @property
    def is_driver(self) -> bool:
        from vllm_quick_tpu.parallel.multihost import is_driver
        return is_driver()

    def run_follower_loop(self) -> None:
        """Block serving the driver's per-step broadcasts; call on every
        non-zero host after engine construction. Returns when the driver
        sends the shutdown sentinel."""
        self.worker.run_follower_loop()

    def shutdown(self) -> None:
        """Release followers (no-op on single host)."""
        self.worker.shutdown_followers()

    # -- requests ----------------------------------------------------------

    def add_request(
        self,
        request_id: str,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request=None,
        prefix_pos: Optional[int] = None,
    ) -> None:
        if arrival_time is None:
            arrival_time = time.time()
        if prompt_token_ids is None:
            prompt_token_ids = self.tokenizer.encode(prompt, request_id,
                                                     lora_request)
        block_size = self.cache_config.block_size
        seq_id = next(self.seq_counter)
        seq = Sequence(seq_id, prompt, prompt_token_ids, block_size,
                       lora_request)
        prefix = None
        if sampling_params.prompt_logprobs is not None:
            if getattr(self.parallel_config,
                       "sequence_parallel_size", 1) > 1:
                raise ValueError("prompt_logprobs (echo) is unsupported "
                                 "under sequence parallelism")
        if prefix_pos is not None:
            if getattr(self.parallel_config, "sequence_parallel_size",
                       1) > 1:
                raise ValueError(
                    "prefix caching is unsupported under sequence "
                    "parallelism")
            prefix = self.scheduler.prefix_pool.add_or_get_prefix(
                prompt_token_ids[:prefix_pos])
        seq_group = SequenceGroup(request_id, [seq], sampling_params,
                                  arrival_time, lora_request, prefix)
        self.scheduler.add_seq_group(seq_group)

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        self.scheduler.abort_seq_group(request_id)

    def get_model_config(self) -> ModelConfig:
        return self.model_config

    # -- multi-LoRA management (reference: llm_engine.py:956-971) ----------

    def add_lora(self, lora_request) -> bool:
        assert lora_request.lora_int_id > 0, "lora_int_id must be > 0"
        return self.worker.model_runner.lora_manager.add_lora(lora_request)

    def remove_lora(self, lora_id: int) -> bool:
        assert lora_id > 0, "lora_id must be > 0"
        return self.worker.model_runner.lora_manager.remove_lora(lora_id)

    def list_loras(self) -> List[int]:
        return self.worker.model_runner.lora_manager.list_loras()

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_seq_groups()

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_seqs()

    # -- stepping ------------------------------------------------------------

    def step(self) -> List[RequestOutput]:
        """One engine iteration: schedule -> execute -> process
        (reference: llm_engine.py:757-833)."""
        seq_group_metadata_list, scheduler_outputs = self.scheduler.schedule()

        if not scheduler_outputs.is_empty():
            output = self.worker.execute_model(
                seq_group_metadata_list,
                scheduler_outputs.blocks_to_swap_in,
                scheduler_outputs.blocks_to_swap_out,
                scheduler_outputs.blocks_to_copy)
        else:
            output = []

        return self._process_model_outputs(output, scheduler_outputs)

    def _process_model_outputs(
            self, output: Optional[SamplerOutput],
            scheduler_outputs: SchedulerOutputs) -> List[RequestOutput]:
        scheduled_seq_groups = scheduler_outputs.scheduled_seq_groups
        now = time.time()
        if output:
            chunked = scheduler_outputs.chunked_ids
            for seq_group, outputs in zip(scheduled_seq_groups, output):
                if (scheduler_outputs.prompt_run
                        and seq_group.request_id in chunked):
                    # Non-final prefill chunk: KV was written; the
                    # sampled token is meaningless until the last
                    # chunk. TTFT clock keeps running.
                    continue
                self._process_sequence_group_outputs(seq_group, outputs)
                if seq_group.first_token_time is None:
                    seq_group.first_token_time = now

        self.scheduler.free_finished_seq_groups()

        request_outputs: List[RequestOutput] = []
        for seq_group in scheduled_seq_groups:
            request_outputs.append(RequestOutput.from_seq_group(seq_group))
        for seq_group in scheduler_outputs.ignored_seq_groups:
            request_outputs.append(RequestOutput.from_seq_group(seq_group))

        # Mark freshly computed prefixes reusable (llm_engine.py:745-749).
        if scheduler_outputs.prompt_run:
            for seq_group in scheduled_seq_groups:
                if seq_group.prefix is not None:
                    seq_group.prefix.computed = True

        if self.log_stats and self.stat_logger is not None:
            self.stat_logger.log(self._get_stats(scheduler_outputs))
        return request_outputs

    # -- per-group output processing (incl. beam search) ---------------------

    def _process_sequence_group_outputs(
            self, seq_group: SequenceGroup,
            outputs: SequenceGroupOutput) -> None:
        # Prompt logprobs.
        if outputs.prompt_logprobs is not None:
            seq_group.prompt_logprobs = outputs.prompt_logprobs

        if getattr(outputs, "chained", False):
            # Speculative decoding: the samples are sequential tokens
            # for the single candidate; append until a stop triggers.
            seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
            assert len(seqs) == 1, "chained outputs need one candidate"
            seq = seqs[0]
            for sample in outputs.samples:
                seq.append_token_id(sample.output_token, sample.logprobs)
                self._decode_sequence(seq, seq_group.sampling_params)
                self._check_stop(seq, seq_group.sampling_params)
                if seq.is_finished():
                    break
            if seq.is_finished():
                self.scheduler.free_seq(seq)
            return

        samples = outputs.samples
        parent_seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        existing_finished_seqs = seq_group.get_finished_seqs()
        parent_child_dict = {s.seq_id: [] for s in parent_seqs}
        for sample in samples:
            parent_child_dict[sample.parent_seq_id].append(sample)

        child_seqs: List[Tuple[Sequence, Sequence]] = []
        for parent in parent_seqs:
            child_samples = parent_child_dict[parent.seq_id]
            if not child_samples:
                # Beam search dropped this parent.
                parent.status = SequenceStatus.FINISHED_ABORTED
                seq_group.remove(parent.seq_id)
                self.scheduler.free_seq(parent)
                continue
            for child_sample in child_samples[:-1]:
                new_child_seq_id = next(self.seq_counter)
                child = parent.fork(new_child_seq_id)
                child.append_token_id(child_sample.output_token,
                                      child_sample.logprobs)
                child_seqs.append((child, parent))
            last_child_sample = child_samples[-1]
            parent.append_token_id(last_child_sample.output_token,
                                   last_child_sample.logprobs)
            child_seqs.append((parent, parent))

        for seq, _ in child_seqs:
            self._decode_sequence(seq, seq_group.sampling_params)
            self._check_stop(seq, seq_group.sampling_params)

        if not seq_group.sampling_params.use_beam_search:
            # Non-beam: register forks, free finished.
            for seq, parent in child_seqs:
                if seq is not parent:
                    seq_group.add(seq)
                    self.scheduler.fork_seq(parent, seq)
            for seq, parent in child_seqs:
                if seq is parent and seq.is_finished():
                    self.scheduler.free_seq(seq)
            return

        # ---- Beam search selection (llm_engine.py:553-720 semantics) ----
        sp = seq_group.sampling_params
        beam_width = sp.best_of
        length_penalty = sp.length_penalty
        eos = self._eos_token_id(seq_group)

        existing_finished = [(seq, None, False)
                             for seq in existing_finished_seqs]
        new_finished = [(seq, parent, True) for seq, parent in child_seqs
                        if seq.is_finished()]
        all_finished = existing_finished + new_finished
        all_finished.sort(key=lambda x: x[0].get_beam_search_score(
            length_penalty=length_penalty, eos_token_id=eos), reverse=True)

        selected: List[Tuple[Sequence, Sequence]] = []
        unselected: List[Tuple[Sequence, Sequence]] = []
        for seq, parent, is_new in all_finished[:beam_width]:
            if is_new:
                selected.append((seq, parent))
            # existing finished seq stays in the group as-is
        for seq, parent, is_new in all_finished[beam_width:]:
            if is_new:
                unselected.append((seq, parent))
            else:
                seq_group.remove(seq.seq_id)

        running = [(seq, parent) for seq, parent in child_seqs
                   if not seq.is_finished()]
        running.sort(key=lambda x: x[0].get_beam_search_score(
            length_penalty=length_penalty, eos_token_id=eos), reverse=True)

        num_finished = len(seq_group.get_finished_seqs()) + len(
            [s for s, p in selected if s.is_finished()])
        stop = False
        if num_finished >= beam_width and running:
            best_running = running[0][0].get_beam_search_score(
                length_penalty=length_penalty, eos_token_id=eos)
            stop = self._beam_search_early_stopping(
                sp, best_running, seq_group, length_penalty, eos)
        if stop:
            unselected.extend(running)
        else:
            selected.extend(running[:beam_width])
            unselected.extend(running[beam_width:])

        for seq, parent in selected:
            if seq is not parent:
                seq_group.add(seq)
                self.scheduler.fork_seq(parent, seq)
        for seq, parent in selected:
            if seq is parent and seq.is_finished():
                self.scheduler.free_seq(seq)
        for seq, parent in unselected:
            if seq is parent:
                # Parent beam dropped: remove and free.
                seq_group.remove(seq.seq_id)
                self.scheduler.free_seq(seq)
            # forked children that were never registered just vanish

        if stop:
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq.status = SequenceStatus.FINISHED_STOPPED
                self.scheduler.free_seq(seq)

    def _beam_search_early_stopping(self, sp: SamplingParams,
                                    best_running_score: float,
                                    seq_group: SequenceGroup,
                                    length_penalty: float,
                                    eos: Optional[int]) -> bool:
        """Can any running beam still beat the worst kept finished beam?
        (reference: llm_engine.py:516-551)."""
        finished = seq_group.get_finished_seqs()
        if len(finished) < sp.best_of:
            return False
        worst_finished = min(
            s.get_beam_search_score(length_penalty=length_penalty,
                                    eos_token_id=eos) for s in finished)
        if sp.early_stopping is True:
            return True
        if sp.early_stopping == "never":
            if length_penalty > 0.0:
                # With lp > 0 a longer continuation can only improve the
                # score: bound by the best achievable at max length (the
                # canonical HF bound the reference uses).
                seq = max(
                    seq_group.get_seqs(status=SequenceStatus.RUNNING),
                    key=lambda s: s.get_cumulative_logprob())
                max_possible = seq.get_cumulative_logprob() / (
                    self.model_config.max_model_len**length_penalty)
            else:
                max_possible = best_running_score
            return worst_finished >= max_possible
        # early_stopping is False: heuristic — compare current scores.
        return worst_finished >= best_running_score

    def _eos_token_id(self, seq_group: SequenceGroup) -> Optional[int]:
        tok = self.tokenizer.get_lora_tokenizer(seq_group.lora_request)
        return tok.eos_token_id

    # -- detokenize + stop -----------------------------------------------

    def _decode_sequence(self, seq: Sequence,
                         sampling_params: SamplingParams) -> None:
        tokenizer = self.tokenizer.get_lora_tokenizer(seq.lora_request)
        (new_tokens, new_output_text, prefix_offset,
         read_offset) = detokenize_incrementally(
             tokenizer,
             all_input_ids=seq.get_token_ids(),
             prev_tokens=seq.tokens,
             prefix_offset=seq.prefix_offset,
             read_offset=seq.read_offset,
             skip_special_tokens=sampling_params.skip_special_tokens,
             spaces_between_special_tokens=sampling_params.
             spaces_between_special_tokens,
         )
        if seq.tokens is None:
            seq.tokens = new_tokens
        else:
            seq.tokens.extend(new_tokens)
        seq.prefix_offset = prefix_offset
        seq.read_offset = read_offset
        seq.output_text += new_output_text

    def _check_stop(self, seq: Sequence,
                    sampling_params: SamplingParams) -> None:
        """(reference: llm_engine.py:917-971)."""
        for stop_str in sampling_params.stop:
            if seq.output_text.endswith(stop_str):
                if not sampling_params.include_stop_str_in_output:
                    seq.output_text = seq.output_text[:-len(stop_str)]
                seq.status = SequenceStatus.FINISHED_STOPPED
                return
        if seq.get_last_token_id() in sampling_params.stop_token_ids:
            seq.status = SequenceStatus.FINISHED_STOPPED
            return
        if seq.get_len() > self.model_config.max_model_len:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return
        if seq.get_output_len() == sampling_params.max_tokens:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return
        if (not sampling_params.ignore_eos and seq.get_last_token_id()
                == self.tokenizer.get_lora_tokenizer(
                    seq.lora_request).eos_token_id):
            seq.status = SequenceStatus.FINISHED_STOPPED
            return

    # -- stats ---------------------------------------------------------------

    def _get_stats(self, scheduler_outputs: SchedulerOutputs) -> Stats:
        now = time.time()
        num_total_gpu_blocks = self.cache_config.num_gpu_blocks
        num_free_gpu = self.scheduler.block_manager.get_num_free_gpu_blocks()
        gpu_cache_usage = 1.0 - num_free_gpu / max(num_total_gpu_blocks, 1)
        num_total_cpu = self.cache_config.num_cpu_blocks
        if num_total_cpu > 0:
            free_cpu = self.scheduler.block_manager.get_num_free_cpu_blocks()
            cpu_cache_usage = 1.0 - free_cpu / num_total_cpu
        else:
            cpu_cache_usage = 0.0

        prompt_run = scheduler_outputs.prompt_run
        num_prompt_tokens = (scheduler_outputs.num_batched_tokens
                             if prompt_run else 0)
        num_generation_tokens = (0 if prompt_run else
                                 scheduler_outputs.num_batched_tokens)

        time_to_first_tokens = []
        time_per_output_tokens = []
        time_e2e_requests = []
        for g in scheduler_outputs.scheduled_seq_groups:
            if prompt_run and g.first_scheduled_time is not None:
                time_to_first_tokens.append(now - g.arrival_time)
            elif not prompt_run:
                # Inter-token latency (TPOT): gap since this group's
                # previous emitted token.
                prev = getattr(g, "last_token_time", None)
                if prev is not None:
                    time_per_output_tokens.append(now - prev)
            g.last_token_time = now
            if g.is_finished():
                time_e2e_requests.append(now - g.arrival_time)

        return Stats(
            now=now,
            num_running=len(self.scheduler.running),
            num_swapped=len(self.scheduler.swapped),
            num_waiting=len(self.scheduler.waiting),
            gpu_cache_usage=gpu_cache_usage,
            cpu_cache_usage=cpu_cache_usage,
            num_prompt_tokens=num_prompt_tokens,
            num_generation_tokens=num_generation_tokens,
            time_to_first_tokens=time_to_first_tokens,
            time_per_output_tokens=time_per_output_tokens,
            time_e2e_requests=time_e2e_requests,
        )
