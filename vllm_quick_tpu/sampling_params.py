"""Per-request sampling parameters.

Capability parity with the reference surface (vllm/sampling_params.py):
n/best_of, the three penalty families, temperature/top-p/top-k/min-p,
beam-search knobs, stop strings/ids, logprobs, seeded sampling, and
user logits processors — implemented as a dataclass with a declarative
range table driving validation.
"""
from dataclasses import dataclass, field, fields
from enum import IntEnum
from typing import Any, Callable, List, Optional, Union

_EPS = 1e-5

# A logits processor maps (generated_token_ids, logits) -> logits.
# Logits arrive as a 1-D float32 numpy array on the driver host.
LogitsProcessor = Callable[[List[int], Any], Any]


class SamplingType(IntEnum):
    GREEDY = 0
    RANDOM = 1
    BEAM = 2


# field -> (low, high, low_open, high_open); None bound = unbounded.
_NUMERIC_RANGES = {
    "presence_penalty": (-2.0, 2.0, False, False),
    "frequency_penalty": (-2.0, 2.0, False, False),
    "repetition_penalty": (0.0, 2.0, True, False),
    "temperature": (0.0, None, False, False),
    "top_p": (0.0, 1.0, True, False),
    "min_p": (0.0, 1.0, False, False),
    "max_tokens": (1, None, False, False),
}


@dataclass
class SamplingParams:
    """Sampling knobs for one request (OpenAI semantics plus beam
    search, min_p and repetition penalty)."""

    n: int = 1
    best_of: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    seed: Optional[int] = None
    use_beam_search: bool = False
    length_penalty: float = 1.0
    early_stopping: Union[bool, str] = False
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    include_stop_str_in_output: bool = False
    ignore_eos: bool = False
    max_tokens: int = 16
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    logits_processors: Optional[List[LogitsProcessor]] = None

    def __post_init__(self) -> None:
        if self.best_of is None:
            self.best_of = self.n
        if self.stop is None:
            self.stop = []
        elif isinstance(self.stop, str):
            self.stop = [self.stop]
        else:
            self.stop = list(self.stop)
        self.stop_token_ids = list(self.stop_token_ids or [])
        self.logits_processors = self.logits_processors or []

        self._check_ranges()
        self._check_counts()
        if self.use_beam_search:
            self._check_beam_mode()
        else:
            self._check_sampling_mode()

    # ---- validation ------------------------------------------------------

    def _check_ranges(self) -> None:
        for name, (lo, hi, lo_open, hi_open) in _NUMERIC_RANGES.items():
            v = getattr(self, name)
            bad = ((lo is not None and (v < lo or (lo_open and v == lo)))
                   or (hi is not None and (v > hi or (hi_open and v == hi))))
            if bad:
                lob = "(" if lo_open else "["
                hib = ")" if hi_open else "]"
                lo_s = "-inf" if lo is None else lo
                hi_s = "inf" if hi is None else hi
                raise ValueError(
                    f"{name}={v} outside {lob}{lo_s}, {hi_s}{hib}")
        if self.top_k == 0 or self.top_k < -1:
            raise ValueError(
                f"top_k={self.top_k}; use -1 to disable or a value >= 1")
        for name in ("logprobs", "prompt_logprobs"):
            v = getattr(self, name)
            if v is not None and v < 0:
                raise ValueError(f"{name}={v} must be >= 0")

    def _check_counts(self) -> None:
        if self.n < 1:
            raise ValueError(f"n={self.n} must be >= 1")
        if self.best_of < self.n:
            raise ValueError(
                f"best_of={self.best_of} must be >= n={self.n}")

    def _check_beam_mode(self) -> None:
        problems = []
        if self.best_of == 1:
            problems.append("best_of must be > 1")
        if self.temperature > _EPS:
            problems.append("temperature must be 0")
        if self.top_p < 1.0 - _EPS:
            problems.append("top_p must be 1")
        if self.top_k != -1:
            problems.append("top_k must be -1")
        if self.early_stopping not in (True, False, "never"):
            problems.append(
                "early_stopping must be True, False or 'never'")
        if problems:
            raise ValueError(
                "invalid beam-search params: " + "; ".join(problems))

    def _check_sampling_mode(self) -> None:
        if self.early_stopping is not False:
            raise ValueError(
                "early_stopping only applies to beam search")
        if abs(self.length_penalty - 1.0) > _EPS:
            raise ValueError(
                "length_penalty only applies to beam search")
        greedy = self.temperature < _EPS
        if greedy and self.best_of > 1:
            raise ValueError(
                f"greedy sampling is deterministic; best_of="
                f"{self.best_of} > 1 is meaningless")
        if greedy:
            # top-p/top-k/min-p are no-ops at temperature 0; normalize
            # so the batched sampler buckets greedy rows together.
            self.top_p = 1.0
            self.top_k = -1
            self.min_p = 0.0

    # ---- views -----------------------------------------------------------

    @property
    def sampling_type(self) -> SamplingType:
        if self.use_beam_search:
            return SamplingType.BEAM
        if self.temperature < _EPS:
            return SamplingType.GREEDY
        return SamplingType.RANDOM

    def __repr__(self) -> str:
        parts = []
        for f in fields(self):
            v = getattr(self, f.name)
            if f.name == "logits_processors":
                v = f"<{len(v)} processors>" if v else None
            parts.append(f"{f.name}={v!r}")
        return f"SamplingParams({', '.join(parts)})"
