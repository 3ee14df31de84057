"""Draft-model multi-step execution for speculative decoding.

Reference parity: vllm/worker/spec_decode/multi_step_worker.py:10-60 —
run the (draft) model k decode steps, appending each sampled token to
shallow-copied sequence metadata in place; scoring/acceptance
orchestration lives above (rejection_sampler.py provides the math,
mirroring the reference's partial state).
"""
import copy
from typing import Dict, List, Optional, Tuple

from vllm_quick_tpu.sequence import (SamplerOutput, SequenceData,
                                     SequenceGroupMetadata)
from vllm_quick_tpu.worker.worker import Worker


class MultiStepWorker(Worker):
    """A Worker that can run k autoregressive steps per scheduler call
    (the draft side of speculative decoding)."""

    def execute_model_multi_step(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        num_steps: int,
    ) -> List[SamplerOutput]:
        """Run the model ``num_steps`` decode iterations. The caller
        must have reserved KV slots for all appended tokens
        (reference :23-60 assertions)."""
        self._assert_enough_kv_space(seq_group_metadata_list, num_steps)
        # Shallow-copy metadata so in-place appends don't leak to the
        # scheduler's view (reference _shallow_copy_inputs).
        copied = self._shallow_copy_inputs(seq_group_metadata_list)

        outputs: List[SamplerOutput] = []
        for _ in range(num_steps):
            step_out = self.execute_model(copied, blocks_to_swap_in,
                                          blocks_to_swap_out,
                                          blocks_to_copy)
            blocks_to_swap_in = {}
            blocks_to_swap_out = {}
            blocks_to_copy = {}
            outputs.append(step_out)
            self._append_new_tokens(step_out, copied)
        return outputs

    @staticmethod
    def _shallow_copy_inputs(
        metas: List[SequenceGroupMetadata]
    ) -> List[SequenceGroupMetadata]:
        copied = []
        for m in metas:
            new_m = copy.copy(m)
            new_m.seq_data = {
                sid: SequenceData(
                    list(d.prompt_token_ids),
                    list(d.output_token_ids))
                for sid, d in m.seq_data.items()
            }
            copied.append(new_m)
        return copied

    def _assert_enough_kv_space(
            self, metas: List[SequenceGroupMetadata],
            num_steps: int) -> None:
        block_size = self.cache_config.block_size
        for m in metas:
            assert not m.is_prompt, \
                "multi-step execution is decode-only"
            for sid, data in m.seq_data.items():
                needed = -(-(data.get_len() + num_steps) // block_size)
                have = len(m.block_tables[sid])
                assert have >= needed, (
                    f"seq {sid} has {have} blocks, needs {needed} for "
                    f"{num_steps} speculative steps")

    @staticmethod
    def _append_new_tokens(
            step_out: SamplerOutput,
            metas: List[SequenceGroupMetadata]) -> None:
        for group_out, m in zip(step_out, metas):
            for sample in group_out.samples:
                data = m.seq_data[sample.parent_seq_id]
                token = sample.output_token
                data.append_token_id(token,
                                     sample.logprobs.get(token, 0.0))
