"""Iteration-level continuous-batching scheduler.

Capability parity with the reference scheduler (vllm/core/scheduler.py):
prompt-first admission under token/seq/padding budgets, decode slot
reservation with preemption (RECOMPUTE for lone sequences, SWAP for
multi-candidate groups), resumption of swapped groups, copy-on-write
collection, and per-batch LoRA adapter budgeting — restructured here as
three explicit planning phases over a shared ``_BatchBudget``.

One behavioral improvement over the reference: when the LoRA adapter
budget blocks a group, the planner *skips* it and keeps considering the
rest of the queue (the reference's swap-in loop head-of-line-blocks
every other adapter; its waiting loop skips — we skip in both places,
matching vllm/core/scheduler.py:219-227 and fixing the swap side).
"""
import enum
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, Iterable, List, Optional, Set, Tuple, Union

from vllm_quick_tpu.config import CacheConfig, LoRAConfig, SchedulerConfig
from vllm_quick_tpu.core.block_manager import AllocStatus, BlockSpaceManager
from vllm_quick_tpu.core.policy import PolicyFactory
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.prefix import PrefixPool
from vllm_quick_tpu.sequence import (SequenceGroup, SequenceGroupMetadata,
                                     SequenceStatus, TokenLog)

logger = init_logger(__name__)


class PreemptionMode(enum.Enum):
    SWAP = enum.auto()
    RECOMPUTE = enum.auto()


@dataclass
class SchedulerOutputs:
    """One step's plan: what to run plus the cache moves that must
    happen before the forward pass."""

    scheduled_seq_groups: List[SequenceGroup]
    prompt_run: bool
    num_batched_tokens: int
    blocks_to_swap_in: Dict[int, int]
    blocks_to_swap_out: Dict[int, int]
    blocks_to_copy: Dict[int, List[int]]
    ignored_seq_groups: List[SequenceGroup]
    # Chunked prefill: request ids scheduled as a NON-final prompt
    # chunk this step — the engine must not consume their sampled
    # token.
    chunked_ids: Set[str] = field(default_factory=set)

    def __post_init__(self) -> None:
        # A step never swaps both directions.
        assert not (self.blocks_to_swap_in and self.blocks_to_swap_out)

    def is_empty(self) -> bool:
        return not (self.scheduled_seq_groups or self.blocks_to_swap_in
                    or self.blocks_to_swap_out or self.blocks_to_copy)

    @property
    def lora_requests(self) -> Set:
        return {
            g.lora_request
            for g in self.scheduled_seq_groups
            if g.lora_request is not None
        }


@dataclass
class _BatchBudget:
    """Admission accounting shared by the prompt and swap-in phases."""

    max_seqs: int
    max_batched_tokens: int
    max_paddings: int
    max_loras: Optional[int]
    n_seqs: int = 0
    prompt_lens: List[int] = field(default_factory=list)
    loras: Set[int] = field(default_factory=set)

    @classmethod
    def for_running(cls, scheduler: "Scheduler") -> "_BatchBudget":
        cfg = scheduler.scheduler_config
        budget = cls(
            max_seqs=cfg.max_num_seqs,
            max_batched_tokens=cfg.max_num_batched_tokens,
            max_paddings=cfg.max_paddings,
            max_loras=(scheduler.lora_config.max_loras
                       if scheduler.lora_config else None),
        )
        for g in scheduler.running:
            budget.n_seqs += g.get_max_num_running_seqs()
            if g.lora_int_id > 0:
                budget.loras.add(g.lora_int_id)
        for g in scheduler.prefilling:
            budget.n_seqs += g.get_max_num_running_seqs()
            if g.lora_int_id > 0:
                budget.loras.add(g.lora_int_id)
        return budget

    def lora_blocked(self, lora_id: int) -> bool:
        return (self.max_loras is not None and lora_id > 0
                and lora_id not in self.loras
                and len(self.loras) >= self.max_loras)

    def seqs_fit(self, n_new: int) -> bool:
        return self.n_seqs + n_new <= self.max_seqs

    def prompt_tokens_fit(self, prompt_len: int) -> bool:
        """Prompts are padded to the batch max; both the padded total
        and the padding waste are capped.

        The total is counted over the RUNNER's bucket-padded shape
        (batch bucket x length bucket, utils.py tables) — that is the
        shape that compiles and allocates. Counting raw ``len * max``
        admitted 17 ~120-token prompts under a 2048 budget that then
        compiled as a (32, 128) = 4096-token bucket and OOM'd a 7B
        engine mid-serving (round 4). The budget itself is rounded up
        to a length bucket so a single max-length prompt (which the
        per-prompt check caps at max_batched_tokens real tokens)
        always remains admissible. The padding-waste cap keeps its
        reference semantics (per-seq padding to the batch max, not to
        the bucket)."""
        from vllm_quick_tpu.utils import (LEN_BUCKETS,
                                          PREFILL_BATCH_BUCKETS,
                                          pad_to_bucket)
        lens = self.prompt_lens + [prompt_len]
        bucket_padded = (pad_to_bucket(len(lens), PREFILL_BATCH_BUCKETS)
                         * pad_to_bucket(max(lens), LEN_BUCKETS))
        budget = pad_to_bucket(self.max_batched_tokens, LEN_BUCKETS)
        padded = len(lens) * max(lens)
        return (bucket_padded <= budget
                and padded - sum(lens) <= self.max_paddings)

    def admit(self, group: SequenceGroup,
              prompt_len: Optional[int] = None) -> None:
        self.n_seqs += group.get_max_num_running_seqs()
        if group.lora_int_id > 0:
            self.loras.add(group.lora_int_id)
        if prompt_len is not None:
            self.prompt_lens.append(prompt_len)

    @property
    def padded_prompt_tokens(self) -> int:
        if not self.prompt_lens:
            return 0
        return len(self.prompt_lens) * max(self.prompt_lens)


class Scheduler:
    """Owns the three request queues and plans each engine step."""

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        lora_config: Optional[LoRAConfig] = None,
        sp_size: int = 1,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.lora_config = lora_config

        self._chunked = getattr(scheduler_config,
                                "enable_chunked_prefill", False)
        if self._chunked:
            # Chunked prefill lifts the reference's hard cap
            # (core/scheduler.py:193-202): prompts are bounded by the
            # model length only, not the per-step token budget.
            self.prompt_limit = scheduler_config.max_model_len
        else:
            self.prompt_limit = min(
                scheduler_config.max_model_len,
                scheduler_config.max_num_batched_tokens)
        self.policy = PolicyFactory.get_policy("fcfs")
        self.block_manager = BlockSpaceManager(
            block_size=cache_config.block_size,
            num_gpu_blocks=cache_config.num_gpu_blocks,
            num_cpu_blocks=cache_config.num_cpu_blocks,
            sliding_window=cache_config.sliding_window,
            sp_size=sp_size,
        )
        self.prefix_pool = PrefixPool(cache_config.block_size)

        self.waiting: Deque[SequenceGroup] = deque()
        self.running: Deque[SequenceGroup] = deque()
        self.swapped: Deque[SequenceGroup] = deque()
        # Chunked prefill: groups whose prompt is partially computed.
        # They hold all their blocks (allocated up front) but are not
        # decode candidates until the final chunk lands.
        self.prefilling: Deque[SequenceGroup] = deque()
        self._chunk_plan: Dict[str, Tuple[int, int]] = {}
        self._chunk_streak = False

        # Speculative decoding reserves k extra KV slots per decode
        # step so the draft+score pass never outruns the block tables;
        # multi-step decode reserves k-1 the same way (each engine step
        # writes up to num_decode_steps tokens of KV before the host
        # sees any of them).
        if getattr(scheduler_config, "speculative_model", None):
            self.lookahead_slots = scheduler_config.num_speculative_tokens
        else:
            self.lookahead_slots = (
                getattr(scheduler_config, "num_decode_steps", 1) - 1)

    @property
    def lora_enabled(self) -> bool:
        return self.lora_config is not None

    # ---- queue management ------------------------------------------------

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)

    def abort_seq_group(
            self, request_id: Union[str, Iterable[str]]) -> None:
        targets = {request_id} if isinstance(request_id, str) \
            else set(request_id)
        for queue in (self.waiting, self.running, self.swapped,
                      self.prefilling):
            if not targets:
                break
            hits = [g for g in queue if g.request_id in targets]
            for group in hits:
                queue.remove(group)
                targets.discard(group.request_id)
                for seq in group.get_seqs():
                    if not seq.is_finished():
                        seq.status = SequenceStatus.FINISHED_ABORTED
                        self.free_seq(seq)

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped
                    or self.prefilling)

    def get_num_unfinished_seq_groups(self) -> int:
        return (len(self.waiting) + len(self.running) + len(self.swapped)
                + len(self.prefilling))

    # ---- step planning ---------------------------------------------------

    def _reject_prompt(self, group: SequenceGroup, why: str,
                       ignored: List[SequenceGroup]) -> None:
        logger.warning("Rejecting prompt of request %s: %s",
                       group.request_id, why)
        for seq in group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.FINISHED_IGNORED
        ignored.append(group)

    def _admit_prompts(self) -> Optional[SchedulerOutputs]:
        """Phase 1: drain the waiting queue while budgets hold. A step
        is either all-prompts or all-decodes; returns None when nothing
        was admitted so the decode phases run instead."""
        ignored: List[SequenceGroup] = []
        admitted: List[SequenceGroup] = []
        deferred: List[SequenceGroup] = []
        budget = _BatchBudget.for_running(self)
        self._chunk_plan = {}
        chunked_ids: Set[str] = set()
        bs = self.cache_config.block_size

        def chunk_cap() -> int:
            """Largest admissible chunk under the padded-token budget
            (chunks pad to the batch max like any prompt)."""
            n = len(budget.prompt_lens) + 1
            return self.scheduler_config.max_num_batched_tokens // n

        # Phase 0 (chunked prefill): continue in-flight prefills FCFS.
        still: List[SequenceGroup] = []
        while self.prefilling:
            group = self.prefilling[0]
            seq = group.get_seqs(status=SequenceStatus.RUNNING)[0]
            total = seq.get_len()
            start = group.prefill_progress
            chunk = min(total - start, chunk_cap())
            if start + chunk < total:
                # Non-final chunks end block-aligned so prefill KV
                # writes stay whole-block (ops/cache_ops.py invariant).
                chunk = chunk // bs * bs
            if chunk <= 0 or not budget.prompt_tokens_fit(chunk):
                break
            self.prefilling.popleft()
            budget.prompt_lens.append(chunk)
            end = start + chunk
            self._chunk_plan[group.request_id] = (start, end)
            group.prefill_progress = end
            admitted.append(group)
            if end < total:
                chunked_ids.add(group.request_id)
                still.append(group)
            else:
                self.running.append(group)
        self.prefilling.extendleft(reversed(still))

        while self.waiting:
            group = self.waiting[0]
            prompt_len = group.get_seqs(
                status=SequenceStatus.WAITING)[0].get_len()

            if prompt_len > self.prompt_limit:
                self.waiting.popleft()
                self._reject_prompt(
                    group, f"{prompt_len} tokens > limit "
                    f"{self.prompt_limit}", ignored)
                continue
            if (self._chunked
                    and group.sampling_params.prompt_logprobs is not None
                    and prompt_len
                    > self.scheduler_config.max_num_batched_tokens):
                # Echo requests need the whole prompt in one step, so
                # under chunked prefill's relaxed prompt_limit they can
                # exceed what any step can ever hold — reject rather
                # than head-of-line-block the queue forever.
                self.waiting.popleft()
                self._reject_prompt(
                    group, f"prompt_logprobs prompt of {prompt_len} "
                    "tokens exceeds max_num_batched_tokens "
                    f"({self.scheduler_config.max_num_batched_tokens})"
                    " and cannot be chunked", ignored)
                continue
            fit = self.block_manager.can_allocate(group)
            if fit == AllocStatus.NEVER:
                self.waiting.popleft()
                self._reject_prompt(
                    group, f"{prompt_len} tokens cannot fit in an empty "
                    "KV pool", ignored)
                continue
            if fit == AllocStatus.LATER:
                break
            if budget.lora_blocked(group.lora_int_id):
                # Skip — other adapters behind it may still fit.
                deferred.append(self.waiting.popleft())
                continue
            if not budget.seqs_fit(group.get_max_num_running_seqs()):
                break
            first_chunk = None
            if not budget.prompt_tokens_fit(prompt_len):
                # Chunked prefill: admit the first block-aligned chunk
                # instead of waiting for a step with full-budget room.
                # Prompt-logprobs (echo) requests need the whole prompt
                # in one step, so they keep the legacy behavior.
                if (not self._chunked
                        or group.sampling_params.prompt_logprobs
                        is not None):
                    break
                first_chunk = min(prompt_len, chunk_cap()) // bs * bs
                if (first_chunk <= 0 or first_chunk >= prompt_len
                        or not budget.prompt_tokens_fit(first_chunk)):
                    break

            self.waiting.popleft()
            budget.admit(group,
                         prompt_len=first_chunk or prompt_len)
            self.block_manager.allocate(group)
            for seq in group.get_seqs(status=SequenceStatus.WAITING):
                seq.status = SequenceStatus.RUNNING
            if first_chunk is not None:
                group.prefill_progress = first_chunk
                self._chunk_plan[group.request_id] = (0, first_chunk)
                chunked_ids.add(group.request_id)
                self.prefilling.append(group)
            else:
                self.running.append(group)
            admitted.append(group)

        # LoRA-deferred groups keep their queue position.
        self.waiting.extendleft(reversed(deferred))

        if not admitted and not ignored:
            return None
        return SchedulerOutputs(
            scheduled_seq_groups=admitted,
            prompt_run=True,
            num_batched_tokens=budget.padded_prompt_tokens,
            blocks_to_swap_in={},
            blocks_to_swap_out={},
            blocks_to_copy={},
            ignored_seq_groups=ignored,
            chunked_ids=chunked_ids,
        )

    def _plan_decode(
        self,
        swap_out: Dict[int, int],
        copies: Dict[int, List[int]],
    ) -> List[SequenceGroup]:
        """Phase 2: guarantee a KV slot for every running candidate,
        preempting from the back of the priority order when the pool
        runs dry. Returns the groups preempted this step."""
        now = time.monotonic()
        queue = deque(self.policy.sort_by_priority(now, self.running))
        kept: Deque[SequenceGroup] = deque()
        preempted: List[SequenceGroup] = []

        while queue:
            group = queue.popleft()
            evicted_self = False
            while not self.block_manager.can_append_slot(
                    group, self.lookahead_slots):
                victim = queue.pop() if queue else group
                self._preempt(victim, swap_out)
                preempted.append(victim)
                if victim is group:
                    evicted_self = True
                    break
            if not evicted_self:
                self._grow_tables(group, copies)
                kept.append(group)
        self.running = kept
        return preempted

    def _resume_swapped(self, swap_in: Dict[int, int],
                        copies: Dict[int, List[int]]) -> None:
        """Phase 3: bring swapped groups back while room remains."""
        now = time.monotonic()
        self.swapped = deque(
            self.policy.sort_by_priority(now, self.swapped))
        budget = _BatchBudget.for_running(self)
        deferred: List[SequenceGroup] = []

        while self.swapped:
            group = self.swapped[0]
            if not self.block_manager.can_swap_in(group):
                break
            if budget.lora_blocked(group.lora_int_id):
                # Skip-not-break: don't head-of-line-block other
                # adapters (improves on reference scheduler.py:313-321).
                deferred.append(self.swapped.popleft())
                continue
            if not budget.seqs_fit(group.get_max_num_running_seqs()):
                break
            self.swapped.popleft()
            budget.admit(group)
            swap_in.update(self.block_manager.swap_in(group))
            for seq in group.get_seqs(status=SequenceStatus.SWAPPED):
                seq.status = SequenceStatus.RUNNING
            self._grow_tables(group, copies)
            self.running.append(group)

        self.swapped.extendleft(reversed(deferred))

    def _schedule(self) -> SchedulerOutputs:
        # Swapped groups have strictly older arrival times than waiting
        # ones, so no prompt admission happens while any are parked.
        if not self.swapped:
            # Fairness under chunked prefill: after a chunk-bearing
            # prompt step, run one decode step (if any sequences are
            # decoding) before the next chunk, so a giant prompt can't
            # starve running sequences' TPOT.
            if self._chunk_streak and self.running:
                self._chunk_streak = False
            else:
                prompt_plan = self._admit_prompts()
                if prompt_plan is not None:
                    self._chunk_streak = bool(prompt_plan.chunked_ids)
                    return prompt_plan

        swap_in: Dict[int, int] = {}
        swap_out: Dict[int, int] = {}
        copies: Dict[int, List[int]] = {}

        preempted = self._plan_decode(swap_out, copies)
        if not preempted:
            self._resume_swapped(swap_in, copies)

        return SchedulerOutputs(
            scheduled_seq_groups=list(self.running),
            prompt_run=False,
            num_batched_tokens=sum(
                g.num_seqs(status=SequenceStatus.RUNNING)
                for g in self.running),
            blocks_to_swap_in=swap_in,
            blocks_to_swap_out=swap_out,
            blocks_to_copy=copies,
            ignored_seq_groups=[],
        )

    def schedule(
            self) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        plan = self._schedule()
        now = time.time()
        metadata: List[SequenceGroupMetadata] = []
        for group in plan.scheduled_seq_groups:
            if group.first_scheduled_time is None:
                group.first_scheduled_time = now
            seq_data: Dict[int, TokenLog] = {}
            tables: Dict[int, List[int]] = {}
            for seq in group.get_seqs(status=SequenceStatus.RUNNING):
                seq_data[seq.seq_id] = seq.data
                tables[seq.seq_id] = self.block_manager.get_block_table(seq)
            metadata.append(
                SequenceGroupMetadata(
                    request_id=group.request_id,
                    is_prompt=plan.prompt_run,
                    seq_data=seq_data,
                    sampling_params=group.sampling_params,
                    block_tables=tables,
                    lora_request=group.lora_request,
                    prefix=group.prefix,
                    chunk=(self._chunk_plan.get(group.request_id)
                           if plan.prompt_run else None),
                ))
        return metadata, plan

    # ---- per-sequence hooks used by the engine ---------------------------

    def fork_seq(self, parent_seq, child_seq) -> None:
        self.block_manager.fork(parent_seq, child_seq)

    def free_seq(self, seq) -> None:
        self.block_manager.free(seq)

    def free_finished_seq_groups(self) -> None:
        self.running = deque(g for g in self.running if not g.is_finished())

    # ---- internals -------------------------------------------------------

    def _grow_tables(self, group: SequenceGroup,
                     copies: Dict[int, List[int]]) -> None:
        lookahead = (self.lookahead_slots
                     if group.get_max_num_running_seqs() == 1 else 0)
        for seq in group.get_seqs(status=SequenceStatus.RUNNING):
            cow = self.block_manager.append_slot(seq, lookahead)
            if cow is not None:
                copies.setdefault(cow[0], []).append(cow[1])

    def _preempt(self, group: SequenceGroup,
                 swap_out: Dict[int, int],
                 mode: Optional[PreemptionMode] = None) -> None:
        # Lone-candidate groups are cheaper to recompute than to swap;
        # multi-candidate groups would lose their shared-block structure
        # on recompute, so they swap.
        if mode is None:
            mode = (PreemptionMode.RECOMPUTE
                    if group.get_max_num_running_seqs() == 1
                    else PreemptionMode.SWAP)
        if mode == PreemptionMode.RECOMPUTE:
            seqs = group.get_seqs(status=SequenceStatus.RUNNING)
            assert len(seqs) == 1, "RECOMPUTE preemption needs 1 candidate"
            seqs[0].status = SequenceStatus.WAITING
            self.block_manager.free(seqs[0])
            self.waiting.appendleft(group)
        else:
            if not self.block_manager.can_swap_out(group):
                # Fail fast, like the reference: nothing recoverable
                # can happen once host swap space is exhausted.
                if self.block_manager.sp_size > 1:
                    raise RuntimeError(
                        "Multi-candidate preemption requires swap, "
                        "which the sp-sharded KV pool does not "
                        "support; lower concurrency or use best_of=1 "
                        "under --sequence-parallel-size > 1.")
                raise RuntimeError(
                    "Host swap space exhausted while preempting; "
                    "increase --swap-space.")
            swap_out.update(self.block_manager.swap_out(group))
            for seq in group.get_seqs(status=SequenceStatus.RUNNING):
                seq.status = SequenceStatus.SWAPPED
            self.swapped.append(group)
