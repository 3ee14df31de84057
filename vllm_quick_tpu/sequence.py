"""Request/sequence data model for the TPU engine.

Capability parity with the reference data model (vllm/sequence.py) but
built around this engine's host-numpy control plane:

* Token ids live in ONE growable numpy buffer per sequence
  (``TokenLog``) so the per-step batch builders can slice arrays
  instead of concatenating Python lists.
* There are no per-block logical-token objects: a sequence's logical
  block layout is pure arithmetic over its length (the tokens
  themselves are already in the log), so the block manager only needs
  ``Sequence.num_logical_blocks()``.
* A ``SequenceGroup`` stores its candidates in an ordered list; id
  lookup is an index kept alongside.
"""
import enum
from typing import Dict, List, Optional

import numpy as np

from vllm_quick_tpu.sampling_params import SamplingParams

# token id -> logprob (float). Shape shared with the OpenAI layer.
Logprobs = Dict[int, float]
PromptLogprobs = List[Optional[Logprobs]]
SampleLogprobs = List[Logprobs]


class SequenceStatus(enum.IntEnum):
    """Lifecycle states. Members >= FINISHED_STOPPED are terminal."""

    WAITING = 0
    RUNNING = 1
    SWAPPED = 2
    FINISHED_STOPPED = 3
    FINISHED_LENGTH_CAPPED = 4
    FINISHED_ABORTED = 5
    FINISHED_IGNORED = 6

    @property
    def finished(self) -> bool:
        return self >= SequenceStatus.FINISHED_STOPPED

    @property
    def finish_reason(self) -> Optional[str]:
        # FINISHED_IGNORED (prompt over the model limit) reports
        # "length", matching the reference's API behavior.
        return _FINISH_REASONS.get(self)

    # Compat shims for call sites written against the reference API.
    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status.finished

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        return status.finish_reason


_FINISH_REASONS = {
    SequenceStatus.FINISHED_STOPPED: "stop",
    SequenceStatus.FINISHED_LENGTH_CAPPED: "length",
    SequenceStatus.FINISHED_ABORTED: "abort",
    SequenceStatus.FINISHED_IGNORED: "length",
}


class TokenLog:
    """Append-only token storage: one int32 numpy buffer holding
    prompt tokens followed by generated tokens, with amortized-doubling
    growth. Also accumulates the running sum of sampled logprobs."""

    __slots__ = ("_buf", "_n_prompt", "_n", "cumulative_logprob")

    def __init__(self, prompt_token_ids: List[int],
                 output_token_ids: Optional[List[int]] = None) -> None:
        out = output_token_ids or []
        n = len(prompt_token_ids) + len(out)
        cap = max(16, n * 2)
        self._buf = np.empty(cap, dtype=np.int32)
        self._buf[:len(prompt_token_ids)] = prompt_token_ids
        self._buf[len(prompt_token_ids):n] = out
        self._n_prompt = len(prompt_token_ids)
        self._n = n
        self.cumulative_logprob = 0.0

    def append_token_id(self, token_id: int, logprob: float) -> None:
        if self._n == len(self._buf):
            grown = np.empty(len(self._buf) * 2, dtype=np.int32)
            grown[:self._n] = self._buf
            self._buf = grown
        self._buf[self._n] = token_id
        self._n += 1
        self.cumulative_logprob += logprob

    # Array views (no copy) — preferred by the batch builders.
    @property
    def token_ids_array(self) -> np.ndarray:
        return self._buf[:self._n]

    @property
    def prompt_ids_array(self) -> np.ndarray:
        return self._buf[:self._n_prompt]

    @property
    def output_ids_array(self) -> np.ndarray:
        return self._buf[self._n_prompt:self._n]

    # List-typed accessors kept for the serving layer / reference API.
    @property
    def prompt_token_ids(self) -> List[int]:
        return self.prompt_ids_array.tolist()

    @property
    def output_token_ids(self) -> List[int]:
        return self.output_ids_array.tolist()

    def get_len(self) -> int:
        return self._n

    def get_prompt_len(self) -> int:
        return self._n_prompt

    def get_output_len(self) -> int:
        return self._n - self._n_prompt

    def get_token_ids(self) -> List[int]:
        return self._buf[:self._n].tolist()

    def get_last_token_id(self) -> int:
        return int(self._buf[self._n - 1])

    def clone(self) -> "TokenLog":
        dup = TokenLog.__new__(TokenLog)
        dup._buf = self._buf[:self._n].copy()
        dup._n_prompt = self._n_prompt
        dup._n = self._n
        dup.cumulative_logprob = self.cumulative_logprob
        return dup

    def __repr__(self) -> str:
        return (f"TokenLog({self._n_prompt}+{self._n - self._n_prompt} "
                f"tokens, logp={self.cumulative_logprob:.3f})")


# Name used by the reference-shaped API surface.
SequenceData = TokenLog


class Sequence:
    """One decoding candidate: a token log plus engine-side cursors
    (detokenization state, status). Logical KV blocks are arithmetic:
    ``num_logical_blocks()`` == ceil(len / block_size)."""

    def __init__(
        self,
        seq_id: int,
        prompt: str,
        prompt_token_ids: List[int],
        block_size: int,
        lora_request=None,
    ) -> None:
        self.seq_id = seq_id
        self.prompt = prompt
        self.block_size = block_size
        self.lora_request = lora_request
        self.log = TokenLog(prompt_token_ids)
        self.status = SequenceStatus.WAITING

        self.output_text = ""
        self.output_logprobs: SampleLogprobs = []

        # Incremental detokenizer cursors (transformers_utils/tokenizer).
        self.prefix_offset = 0
        self.read_offset = 0
        self.tokens: Optional[List[str]] = None

    @property
    def data(self) -> TokenLog:
        # Reference-API alias for the token log.
        return self.log

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    def num_logical_blocks(self) -> int:
        return -(-self.data.get_len() // self.block_size)

    def last_block_free_slots(self) -> int:
        """Unwritten KV slots in the final logical block."""
        rem = self.data.get_len() % self.block_size
        return 0 if rem == 0 else self.block_size - rem

    def append_token_id(self, token_id: int, logprobs: Logprobs) -> None:
        self.output_logprobs.append(logprobs)
        self.log.append_token_id(token_id, logprobs[token_id])

    # Pass-throughs to the token log.
    def get_len(self) -> int:
        return self.log.get_len()

    def get_prompt_len(self) -> int:
        return self.log.get_prompt_len()

    def get_output_len(self) -> int:
        return self.log.get_output_len()

    def get_token_ids(self) -> List[int]:
        return self.log.get_token_ids()

    def get_last_token_id(self) -> int:
        return self.log.get_last_token_id()

    def get_output_token_ids(self) -> List[int]:
        return self.log.output_token_ids

    def get_cumulative_logprob(self) -> float:
        return self.log.cumulative_logprob

    def get_beam_search_score(
        self,
        length_penalty: float = 1.0,
        seq_len: Optional[int] = None,
        eos_token_id: Optional[int] = None,
    ) -> float:
        """GNMT-style length-normalized score; an EOS tail token does
        not count toward the normalization length."""
        if seq_len is None:
            seq_len = self.get_len()
            if (eos_token_id is not None
                    and self.get_last_token_id() == eos_token_id):
                seq_len -= 1
        return self.get_cumulative_logprob() / (seq_len**length_penalty)

    def is_finished(self) -> bool:
        return self.status.finished

    def fork(self, new_seq_id: int) -> "Sequence":
        """Explicit-copy fork (no deepcopy): duplicates the token log
        and detokenizer cursors; shares the immutable prompt string."""
        child = Sequence.__new__(Sequence)
        child.seq_id = new_seq_id
        child.prompt = self.prompt
        child.block_size = self.block_size
        child.lora_request = self.lora_request
        child.log = self.log.clone()
        child.status = self.status
        child.output_text = self.output_text
        child.output_logprobs = list(self.output_logprobs)
        child.prefix_offset = self.prefix_offset
        child.read_offset = self.read_offset
        child.tokens = None if self.tokens is None else list(self.tokens)
        return child

    def __repr__(self) -> str:
        return (f"Sequence(id={self.seq_id}, {self.status.name}, "
                f"len={self.get_len()})")


class SequenceGroup:
    """The candidate set spawned by one request (n / best_of / beam)."""

    def __init__(
        self,
        request_id: str,
        seqs: List[Sequence],
        sampling_params: SamplingParams,
        arrival_time: float,
        lora_request=None,
        prefix=None,
    ) -> None:
        self.request_id = request_id
        self._candidates: List[Sequence] = list(seqs)
        self._index: Dict[int, Sequence] = {s.seq_id: s for s in seqs}
        self.sampling_params = sampling_params
        self.arrival_time = arrival_time
        self.lora_request = lora_request
        self.prefix = prefix
        self.prompt_logprobs: Optional[PromptLogprobs] = None
        # Serving-metric timestamps (TTFT / TPOT bookkeeping).
        self.first_scheduled_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.last_token_time: Optional[float] = None
        # Chunked prefill: prompt tokens already computed into KV.
        self.prefill_progress: int = 0

    @property
    def prompt(self) -> str:
        return self._candidates[0].prompt

    @property
    def prompt_token_ids(self) -> List[int]:
        return self._candidates[0].log.prompt_token_ids

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    def get_max_num_running_seqs(self) -> int:
        """Peak number of concurrently live candidates this group can
        reach — the scheduler's slot-reservation bound."""
        sp = self.sampling_params
        if sp.use_beam_search:
            return sp.best_of
        if sp.best_of > self.num_seqs():
            # Still in the prompt stage; candidates fork post-prefill.
            return sp.best_of
        return self.num_unfinished_seqs()

    def get_seqs(self, status: Optional[SequenceStatus] = None
                 ) -> List[Sequence]:
        if status is None:
            return list(self._candidates)
        return [s for s in self._candidates if s.status == status]

    def get_unfinished_seqs(self) -> List[Sequence]:
        return [s for s in self._candidates if not s.status.finished]

    def get_finished_seqs(self) -> List[Sequence]:
        return [s for s in self._candidates if s.status.finished]

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        if status is None:
            return len(self._candidates)
        return sum(1 for s in self._candidates if s.status == status)

    def num_unfinished_seqs(self) -> int:
        return sum(1 for s in self._candidates if not s.status.finished)

    def num_finished_seqs(self) -> int:
        return sum(1 for s in self._candidates if s.status.finished)

    def find(self, seq_id: int) -> Sequence:
        try:
            return self._index[seq_id]
        except KeyError:
            raise ValueError(
                f"No candidate sequence {seq_id} in request "
                f"{self.request_id}") from None

    def add(self, seq: Sequence) -> None:
        if seq.seq_id in self._index:
            raise ValueError(
                f"Candidate sequence {seq.seq_id} added twice to request "
                f"{self.request_id}")
        self._index[seq.seq_id] = seq
        self._candidates.append(seq)

    def remove(self, seq_id: int) -> None:
        seq = self.find(seq_id)
        del self._index[seq_id]
        self._candidates.remove(seq)

    def is_finished(self) -> bool:
        return all(s.status.finished for s in self._candidates)

    def __repr__(self) -> str:
        return (f"SequenceGroup(request={self.request_id}, "
                f"candidates={len(self._candidates)})")


class SequenceGroupMetadata:
    """The slice of a group the scheduler hands to the model runner for
    one step: token logs + physical block tables, keyed by seq_id."""

    __slots__ = ("request_id", "is_prompt", "seq_data", "sampling_params",
                 "block_tables", "lora_request", "prefix", "chunk")

    def __init__(
        self,
        request_id: str,
        is_prompt: bool,
        seq_data: Dict[int, TokenLog],
        sampling_params: SamplingParams,
        block_tables: Dict[int, List[int]],
        lora_request=None,
        prefix=None,
        chunk=None,
    ) -> None:
        self.request_id = request_id
        self.is_prompt = is_prompt
        self.seq_data = seq_data
        self.sampling_params = sampling_params
        self.block_tables = block_tables
        self.lora_request = lora_request
        self.prefix = prefix
        # Chunked prefill: (start, end) token range of the prompt this
        # step covers; None = the whole (remaining) prompt. When
        # end < prompt length no token is sampled for this group.
        self.chunk = chunk

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0


class SequenceOutput:
    """One sampled token attributed to one parent candidate."""

    __slots__ = ("parent_seq_id", "output_token", "logprobs")

    def __init__(self, parent_seq_id: int, output_token: int,
                 logprobs: Logprobs) -> None:
        self.parent_seq_id = parent_seq_id
        self.output_token = output_token
        self.logprobs = logprobs

    def __repr__(self) -> str:
        return (f"SequenceOutput(parent={self.parent_seq_id}, "
                f"token={self.output_token})")

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, SequenceOutput):
            return NotImplemented
        return (self.parent_seq_id, self.output_token, self.logprobs) == \
            (other.parent_seq_id, other.output_token, other.logprobs)


class SequenceGroupOutput:
    """Sampler results for one group in one step.

    ``chained=True`` marks a speculative-decoding result: the samples
    are SEQUENTIAL tokens for one parent (append in order), not
    per-candidate alternatives.
    """

    __slots__ = ("samples", "prompt_logprobs", "chained")

    def __init__(self, samples: List[SequenceOutput],
                 prompt_logprobs: Optional[PromptLogprobs],
                 chained: bool = False) -> None:
        self.samples = samples
        self.prompt_logprobs = prompt_logprobs
        self.chained = chained

    def __repr__(self) -> str:
        return (f"SequenceGroupOutput({self.samples}, "
                f"prompt_logprobs={self.prompt_logprobs})")

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, SequenceGroupOutput):
            return NotImplemented
        return (self.samples, self.prompt_logprobs) == \
            (other.samples, other.prompt_logprobs)


# One SequenceGroupOutput per scheduled group, in schedule order.
SamplerOutput = List[SequenceGroupOutput]
