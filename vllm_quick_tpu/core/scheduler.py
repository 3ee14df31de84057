"""Iteration-level continuous-batching scheduler.

Reference parity: vllm/core/scheduler.py:18-494 — prompt-first admission
under token/seq/padding budgets, decode slot reservation with
preemption (RECOMPUTE for single-sequence groups, SWAP for multi),
swap-in of previously swapped groups, COW copy collection, LoRA batch
budgeting hooks.
"""
import enum
import time
from collections import deque
from typing import Deque, Dict, Iterable, List, Optional, Set, Tuple, Union

from vllm_quick_tpu.config import CacheConfig, LoRAConfig, SchedulerConfig
from vllm_quick_tpu.core.block_manager import AllocStatus, BlockSpaceManager
from vllm_quick_tpu.core.policy import PolicyFactory
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.prefix import PrefixPool
from vllm_quick_tpu.sequence import (Sequence, SequenceData, SequenceGroup,
                                     SequenceGroupMetadata, SequenceStatus)

logger = init_logger(__name__)


class PreemptionMode(enum.Enum):
    SWAP = enum.auto()
    RECOMPUTE = enum.auto()


class SchedulerOutputs:

    def __init__(
        self,
        scheduled_seq_groups: List[SequenceGroup],
        prompt_run: bool,
        num_batched_tokens: int,
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        ignored_seq_groups: List[SequenceGroup],
    ) -> None:
        self.scheduled_seq_groups = scheduled_seq_groups
        self.prompt_run = prompt_run
        self.num_batched_tokens = num_batched_tokens
        self.blocks_to_swap_in = blocks_to_swap_in
        self.blocks_to_swap_out = blocks_to_swap_out
        self.blocks_to_copy = blocks_to_copy
        self.ignored_seq_groups = ignored_seq_groups
        assert not (blocks_to_swap_in and blocks_to_swap_out)

    def is_empty(self) -> bool:
        return (not self.scheduled_seq_groups and not self.blocks_to_swap_in
                and not self.blocks_to_swap_out and not self.blocks_to_copy)

    @property
    def lora_requests(self) -> Set:
        return {
            g.lora_request
            for g in self.scheduled_seq_groups if g.lora_request is not None
        }


class Scheduler:

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        lora_config: Optional[LoRAConfig] = None,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.lora_config = lora_config

        self.prompt_limit = min(scheduler_config.max_model_len,
                                scheduler_config.max_num_batched_tokens)
        self.policy = PolicyFactory.get_policy("fcfs")
        self.block_manager = BlockSpaceManager(
            block_size=cache_config.block_size,
            num_gpu_blocks=cache_config.num_gpu_blocks,
            num_cpu_blocks=cache_config.num_cpu_blocks,
            sliding_window=cache_config.sliding_window,
        )
        self.prefix_pool = PrefixPool(cache_config.block_size)

        self.waiting: Deque[SequenceGroup] = deque()
        self.running: Deque[SequenceGroup] = deque()
        self.swapped: Deque[SequenceGroup] = deque()

    @property
    def lora_enabled(self) -> bool:
        return self.lora_config is not None

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)

    def abort_seq_group(self, request_id: Union[str, Iterable[str]]) -> None:
        if isinstance(request_id, str):
            request_id = (request_id, )
        request_ids = set(request_id)
        for state_queue in (self.waiting, self.running, self.swapped):
            aborted: List[SequenceGroup] = []
            for seq_group in state_queue:
                if not request_ids:
                    break
                if seq_group.request_id in request_ids:
                    aborted.append(seq_group)
                    request_ids.remove(seq_group.request_id)
            for seq_group in aborted:
                state_queue.remove(seq_group)
                for seq in seq_group.get_seqs():
                    if seq.is_finished():
                        continue
                    seq.status = SequenceStatus.FINISHED_ABORTED
                    self.free_seq(seq)

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_seq_groups(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    def _schedule(self) -> SchedulerOutputs:
        blocks_to_swap_in: Dict[int, int] = {}
        blocks_to_swap_out: Dict[int, int] = {}
        blocks_to_copy: Dict[int, List[int]] = {}

        now = time.monotonic()

        # ---- Prompt phase: admit waiting groups while budgets hold
        # (scheduler.py:186-256). Prompts are not mixed with decodes.
        if not self.swapped:
            ignored_seq_groups: List[SequenceGroup] = []
            scheduled: List[SequenceGroup] = []
            num_curr_seqs = sum(g.get_max_num_running_seqs()
                                for g in self.running)
            curr_loras = {g.lora_int_id
                          for g in self.running
                          if g.lora_int_id > 0} if self.lora_enabled else None
            seq_lens: List[int] = []

            while self.waiting:
                seq_group = self.waiting[0]
                waiting_seqs = seq_group.get_seqs(
                    status=SequenceStatus.WAITING)
                assert len(waiting_seqs) == 1, (
                    "Waiting sequence group should have only one prompt "
                    "sequence.")
                num_prompt_tokens = waiting_seqs[0].get_len()
                if num_prompt_tokens > self.prompt_limit:
                    logger.warning(
                        "Input prompt (%d tokens) is too long and exceeds "
                        "limit of %d", num_prompt_tokens, self.prompt_limit)
                    for seq in waiting_seqs:
                        seq.status = SequenceStatus.FINISHED_IGNORED
                    ignored_seq_groups.append(seq_group)
                    self.waiting.popleft()
                    continue

                can_allocate = self.block_manager.can_allocate(seq_group)
                if can_allocate == AllocStatus.LATER:
                    break
                if can_allocate == AllocStatus.NEVER:
                    logger.warning(
                        "Input prompt (%d tokens) cannot be allocated even "
                        "with an empty cache; ignoring.", num_prompt_tokens)
                    for seq in waiting_seqs:
                        seq.status = SequenceStatus.FINISHED_IGNORED
                    ignored_seq_groups.append(seq_group)
                    self.waiting.popleft()
                    continue

                # LoRA slot budget (scheduler.py:218-227).
                if self.lora_enabled and curr_loras is not None:
                    lora_id = seq_group.lora_int_id
                    if (lora_id > 0 and lora_id not in curr_loras
                            and len(curr_loras) >=
                            self.lora_config.max_loras):
                        break

                # Token budget incl. padding to the batch max
                # (scheduler.py:228-243).
                new_seq_lens = seq_lens + [num_prompt_tokens]
                num_batched_tokens = len(new_seq_lens) * max(new_seq_lens)
                if (num_batched_tokens >
                        self.scheduler_config.max_num_batched_tokens):
                    break
                num_paddings = num_batched_tokens - sum(new_seq_lens)
                if num_paddings > self.scheduler_config.max_paddings:
                    break

                num_new_seqs = seq_group.get_max_num_running_seqs()
                if (num_curr_seqs + num_new_seqs >
                        self.scheduler_config.max_num_seqs):
                    break

                seq_lens = new_seq_lens
                if self.lora_enabled and seq_group.lora_int_id > 0:
                    curr_loras.add(seq_group.lora_int_id)
                self.waiting.popleft()
                self._allocate(seq_group)
                self.running.append(seq_group)
                num_curr_seqs += num_new_seqs
                scheduled.append(seq_group)

            if scheduled or ignored_seq_groups:
                return SchedulerOutputs(
                    scheduled_seq_groups=scheduled,
                    prompt_run=True,
                    num_batched_tokens=len(seq_lens) *
                    max(seq_lens) if seq_lens else 0,
                    blocks_to_swap_in=blocks_to_swap_in,
                    blocks_to_swap_out=blocks_to_swap_out,
                    blocks_to_copy=blocks_to_copy,
                    ignored_seq_groups=ignored_seq_groups,
                )

        # ---- Decode phase: reserve a slot per running sequence, preempting
        # the lowest-priority groups when HBM runs out (scheduler.py:280-298).
        self.running = deque(self.policy.sort_by_priority(now, self.running))

        running: Deque[SequenceGroup] = deque()
        preempted: List[SequenceGroup] = []
        while self.running:
            seq_group = self.running.popleft()
            while not self.block_manager.can_append_slot(seq_group):
                if self.running:
                    victim = self.running.pop()  # lowest priority
                    self._preempt(victim, blocks_to_swap_out)
                    preempted.append(victim)
                else:
                    self._preempt(seq_group, blocks_to_swap_out)
                    preempted.append(seq_group)
                    break
            else:
                self._append_slot(seq_group, blocks_to_copy)
                running.append(seq_group)
        self.running = running

        # ---- Swap-in phase (scheduler.py:311-343).
        if not preempted:
            self.swapped = deque(
                self.policy.sort_by_priority(now, self.swapped))
            num_curr_seqs = sum(g.get_max_num_running_seqs()
                                for g in self.running)
            curr_loras = {g.lora_int_id
                          for g in self.running
                          if g.lora_int_id > 0} if self.lora_enabled else None
            while self.swapped:
                seq_group = self.swapped[0]
                if not self.block_manager.can_swap_in(seq_group):
                    break
                if self.lora_enabled and curr_loras is not None:
                    lora_id = seq_group.lora_int_id
                    if (lora_id > 0 and lora_id not in curr_loras
                            and len(curr_loras) >=
                            self.lora_config.max_loras):
                        break
                num_new_seqs = seq_group.get_max_num_running_seqs()
                if (num_curr_seqs + num_new_seqs >
                        self.scheduler_config.max_num_seqs):
                    break
                if self.lora_enabled and seq_group.lora_int_id > 0:
                    curr_loras.add(seq_group.lora_int_id)
                self.swapped.popleft()
                self._swap_in(seq_group, blocks_to_swap_in)
                self._append_slot(seq_group, blocks_to_copy)
                num_curr_seqs += num_new_seqs
                self.running.append(seq_group)

        num_batched_tokens = sum(
            g.num_seqs(status=SequenceStatus.RUNNING) for g in self.running)

        return SchedulerOutputs(
            scheduled_seq_groups=list(self.running),
            prompt_run=False,
            num_batched_tokens=num_batched_tokens,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            ignored_seq_groups=[],
        )

    def schedule(
            self) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        scheduler_outputs = self._schedule()
        now = time.time()

        seq_group_metadata_list: List[SequenceGroupMetadata] = []
        for seq_group in scheduler_outputs.scheduled_seq_groups:
            if seq_group.first_scheduled_time is None:
                seq_group.first_scheduled_time = now
            seq_data: Dict[int, SequenceData] = {}
            block_tables: Dict[int, List[int]] = {}
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq_data[seq.seq_id] = seq.data
                block_tables[seq.seq_id] = \
                    self.block_manager.get_block_table(seq)
            seq_group_metadata_list.append(
                SequenceGroupMetadata(
                    request_id=seq_group.request_id,
                    is_prompt=scheduler_outputs.prompt_run,
                    seq_data=seq_data,
                    sampling_params=seq_group.sampling_params,
                    block_tables=block_tables,
                    lora_request=seq_group.lora_request,
                    prefix=seq_group.prefix,
                ))
        return seq_group_metadata_list, scheduler_outputs

    def fork_seq(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        self.block_manager.fork(parent_seq, child_seq)

    def free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)

    def free_finished_seq_groups(self) -> None:
        self.running = deque(g for g in self.running if not g.is_finished())

    # -- internal ------------------------------------------------------------

    def _allocate(self, seq_group: SequenceGroup) -> None:
        self.block_manager.allocate(seq_group)
        for seq in seq_group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.RUNNING

    def _append_slot(self, seq_group: SequenceGroup,
                     blocks_to_copy: Dict[int, List[int]]) -> None:
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            ret = self.block_manager.append_slot(seq)
            if ret is not None:
                src_block, dst_block = ret
                blocks_to_copy.setdefault(src_block, []).append(dst_block)

    def _preempt(
        self,
        seq_group: SequenceGroup,
        blocks_to_swap_out: Dict[int, int],
        preemption_mode: Optional[PreemptionMode] = None,
    ) -> None:
        # RECOMPUTE for single-sequence groups (cheaper), SWAP otherwise
        # (scheduler.py:437-447).
        if preemption_mode is None:
            if seq_group.get_max_num_running_seqs() == 1:
                preemption_mode = PreemptionMode.RECOMPUTE
            else:
                preemption_mode = PreemptionMode.SWAP
        if preemption_mode == PreemptionMode.RECOMPUTE:
            self._preempt_by_recompute(seq_group)
        else:
            self._preempt_by_swap(seq_group, blocks_to_swap_out)

    def _preempt_by_recompute(self, seq_group: SequenceGroup) -> None:
        seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        assert len(seqs) == 1
        for seq in seqs:
            seq.status = SequenceStatus.WAITING
            self.block_manager.free(seq)
        # Back to the head of the waiting queue.
        self.waiting.appendleft(seq_group)

    def _preempt_by_swap(self, seq_group: SequenceGroup,
                         blocks_to_swap_out: Dict[int, int]) -> None:
        self._swap_out(seq_group, blocks_to_swap_out)
        self.swapped.append(seq_group)

    def _swap_in(self, seq_group: SequenceGroup,
                 blocks_to_swap_in: Dict[int, int]) -> None:
        mapping = self.block_manager.swap_in(seq_group)
        blocks_to_swap_in.update(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            seq.status = SequenceStatus.RUNNING

    def _swap_out(self, seq_group: SequenceGroup,
                  blocks_to_swap_out: Dict[int, int]) -> None:
        if not self.block_manager.can_swap_out(seq_group):
            # Matches the reference's fail-fast contract
            # (core/scheduler.py:485-490).
            raise RuntimeError(
                "Aborted due to the lack of CPU swap space. Please increase "
                "the swap space to avoid this error.")
        mapping = self.block_manager.swap_out(seq_group)
        blocks_to_swap_out.update(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            seq.status = SequenceStatus.SWAPPED
