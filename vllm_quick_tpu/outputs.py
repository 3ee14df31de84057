"""User-facing request outputs (reference parity: vllm/outputs.py)."""
import time
from typing import List, Optional

from vllm_quick_tpu.sequence import (PromptLogprobs, SampleLogprobs,
                                     SequenceGroup, SequenceStatus)


class CompletionOutput:
    """One generated completion of a request."""

    def __init__(
        self,
        index: int,
        text: str,
        token_ids: List[int],
        cumulative_logprob: float,
        logprobs: Optional[SampleLogprobs],
        finish_reason: Optional[str] = None,
        lora_request=None,
    ) -> None:
        self.index = index
        self.text = text
        self.token_ids = token_ids
        self.cumulative_logprob = cumulative_logprob
        self.logprobs = logprobs
        self.finish_reason = finish_reason
        self.lora_request = lora_request

    def finished(self) -> bool:
        return self.finish_reason is not None

    def __repr__(self) -> str:
        return (f"CompletionOutput(index={self.index}, text={self.text!r}, "
                f"token_ids={self.token_ids}, "
                f"cumulative_logprob={self.cumulative_logprob}, "
                f"finish_reason={self.finish_reason})")


class RequestOutput:
    """Aggregated view of one request's sequence group, emitted each step."""

    def __init__(
        self,
        request_id: str,
        prompt: str,
        prompt_token_ids: List[int],
        prompt_logprobs: Optional[PromptLogprobs],
        outputs: List[CompletionOutput],
        finished: bool,
        arrival_time: Optional[float] = None,
        first_token_time: Optional[float] = None,
        finished_time: Optional[float] = None,
        lora_request=None,
    ) -> None:
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = prompt_token_ids
        self.prompt_logprobs = prompt_logprobs
        self.outputs = outputs
        self.finished = finished
        self.arrival_time = arrival_time
        self.first_token_time = first_token_time
        self.finished_time = finished_time
        self.lora_request = lora_request

    @classmethod
    def from_seq_group(cls, seq_group: SequenceGroup) -> "RequestOutput":
        seqs = seq_group.get_seqs()
        params = seq_group.sampling_params
        if params.n == len(seqs):
            top_n_seqs = seqs
        else:
            # Pick the n best finished/running candidates.
            if params.use_beam_search:
                key = lambda seq: seq.get_beam_search_score(
                    params.length_penalty)
            else:
                key = lambda seq: seq.get_cumulative_logprob()
            top_n_seqs = sorted(seqs, key=key, reverse=True)[:params.n]

        include_logprobs = params.logprobs is not None
        outputs = [
            CompletionOutput(
                index=top_n_seqs.index(seq),
                text=seq.output_text,
                token_ids=seq.get_output_token_ids(),
                cumulative_logprob=seq.get_cumulative_logprob(),
                logprobs=seq.output_logprobs if include_logprobs else None,
                finish_reason=SequenceStatus.get_finished_reason(seq.status),
            ) for seq in top_n_seqs
        ]

        finished = seq_group.is_finished()
        return cls(
            request_id=seq_group.request_id,
            prompt=seq_group.prompt,
            prompt_token_ids=seq_group.prompt_token_ids,
            prompt_logprobs=seq_group.prompt_logprobs,
            outputs=outputs,
            finished=finished,
            arrival_time=seq_group.arrival_time,
            first_token_time=seq_group.first_token_time,
            finished_time=time.time() if finished else None,
            lora_request=seq_group.lora_request,
        )

    def __repr__(self) -> str:
        return (f"RequestOutput(request_id={self.request_id}, "
                f"prompt={self.prompt!r}, "
                f"outputs={self.outputs}, finished={self.finished})")
