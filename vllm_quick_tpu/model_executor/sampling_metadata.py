"""Device-side packed sampling parameters.

Reference parity: vllm/model_executor/sampling_metadata.py:71
(SamplingTensors.from_sampling_metadata) — per-sequence sampling knobs
vectorized into padded arrays with static bucketed shapes so the jitted
sampler never recompiles on batch composition.
"""
import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.sampling_params import SamplingParams, SamplingType
from vllm_quick_tpu.sequence import SequenceData
from vllm_quick_tpu.utils import pad_to_bucket

_LEN_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
                32768)
_SIZE_BUCKETS = (8, 16, 32, 64, 128, 256, 512)

_M64 = (1 << 64) - 1


def _mix_seed(base: int, row: int, length: int) -> np.uint32:
    """splitmix64-style avalanche of (seed, row, seq_len) — stable
    across processes (Python's hash() is salted by PYTHONHASHSEED)."""
    x = (base * 0x9E3779B97F4A7C15 + row * 0xBF58476D1CE4E5B9
         + length * 0x94D049BB133111EB) & _M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M64
    x ^= x >> 31
    return np.uint32(x & 0xFFFFFFFF)


@dataclasses.dataclass
class SamplingFlags:
    """Static switches — part of the jit cache key."""
    do_penalties: bool = False
    do_top_k: bool = False
    do_top_p: bool = False
    do_min_p: bool = False
    max_best_of: int = 1
    max_num_logprobs: int = 0

    def key(self) -> Tuple:
        return (self.do_penalties, self.do_top_k, self.do_top_p,
                self.do_min_p, self.max_best_of, self.max_num_logprobs)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingTensors:
    """All per-row sampling state, padded to [Sp, ...]."""
    temperatures: jax.Array        # [Sp] f32 (0 => greedy)
    top_ps: jax.Array              # [Sp] f32
    top_ks: jax.Array              # [Sp] i32 (vocab => off)
    min_ps: jax.Array              # [Sp] f32
    presence_penalties: jax.Array  # [Sp] f32
    frequency_penalties: jax.Array # [Sp] f32
    repetition_penalties: jax.Array# [Sp] f32
    is_greedy: jax.Array           # [Sp] bool
    seeds: jax.Array               # [Sp] u32 per-row RNG fold-in
    prompt_tokens: jax.Array       # [Sp, Lp] i32 (pad = -1)
    output_tokens: jax.Array       # [Sp, Lo] i32 (pad = -1)


def build_sampling_tensors(
    seq_data: List[SequenceData],
    params: List[SamplingParams],
    vocab_size: int,
    step_seed: int,
    reserve_out: int = 0,
) -> Tuple[SamplingTensors, SamplingFlags, int]:
    """Pack one row per sampling token. Returns (tensors, flags, n_real).

    ``reserve_out`` widens the output-token matrix by that many spare
    columns so multi-step decode can append its in-graph samples for
    exact penalty accounting across the chained steps."""
    n = len(seq_data)
    sp = pad_to_bucket(max(n, 1), _SIZE_BUCKETS)

    temps = np.zeros(sp, np.float32)
    top_ps = np.ones(sp, np.float32)
    top_ks = np.full(sp, vocab_size, np.int32)
    min_ps = np.zeros(sp, np.float32)
    pres = np.zeros(sp, np.float32)
    freq = np.zeros(sp, np.float32)
    rep = np.ones(sp, np.float32)
    greedy = np.ones(sp, bool)
    seeds = np.zeros(sp, np.uint32)

    flags = SamplingFlags()
    max_prompt = 1
    max_out = 1
    for i, (data, p) in enumerate(zip(seq_data, params)):
        if p.sampling_type == SamplingType.GREEDY:
            temps[i] = 0.0
            greedy[i] = True
        else:
            temps[i] = max(p.temperature, 1e-5)
            greedy[i] = False
        top_ps[i] = p.top_p
        top_ks[i] = p.top_k if 0 < p.top_k <= vocab_size else vocab_size
        min_ps[i] = p.min_p
        pres[i] = p.presence_penalty
        freq[i] = p.frequency_penalty
        rep[i] = p.repetition_penalty
        base = p.seed if p.seed is not None else step_seed
        # Explicit integer mix (splitmix64-style): deterministic across
        # processes/restarts, unlike Python's salted hash().
        seeds[i] = _mix_seed(base, i, data.get_len())
        if (abs(p.presence_penalty) > 1e-5 or abs(p.frequency_penalty) > 1e-5
                or abs(p.repetition_penalty - 1.0) > 1e-5):
            flags.do_penalties = True
        if top_ks[i] < vocab_size:
            flags.do_top_k = True
        if p.top_p < 1.0:
            flags.do_top_p = True
        if p.min_p > 0.0:
            flags.do_min_p = True
        if p.best_of > flags.max_best_of and len(
                data.output_token_ids) == 0 and not p.use_beam_search:
            # prompt phase of a best_of>1 request: sample best_of tokens
            flags.max_best_of = max(flags.max_best_of, p.best_of)
        n_lp = max(p.logprobs or 0, p.prompt_logprobs or 0)
        if p.use_beam_search:
            n_lp = max(n_lp, 2 * p.best_of)
        flags.max_num_logprobs = max(flags.max_num_logprobs, n_lp)
        max_prompt = max(max_prompt, len(data.prompt_token_ids))
        max_out = max(max_out, len(data.output_token_ids))

    if flags.do_penalties:
        lp = pad_to_bucket(max_prompt, _LEN_BUCKETS)
        lo = pad_to_bucket(max_out + reserve_out, _LEN_BUCKETS)
    else:
        lp = lo = 1
    prompt_tokens = np.full((sp, lp), -1, np.int32)
    output_tokens = np.full((sp, lo), -1, np.int32)
    if flags.do_penalties:
        for i, data in enumerate(seq_data):
            pt = data.prompt_token_ids
            ot = data.output_token_ids
            prompt_tokens[i, :len(pt)] = pt
            output_tokens[i, :len(ot)] = ot

    # Leaves stay host numpy: the jitted sampler's dispatch moves the
    # whole pytree in one device interaction (a standalone jnp.asarray
    # costs one full round trip EACH on remote-attached devices).
    tensors = SamplingTensors(
        temperatures=temps,
        top_ps=top_ps,
        top_ks=top_ks,
        min_ps=min_ps,
        presence_penalties=pres,
        frequency_penalties=freq,
        repetition_penalties=rep,
        is_greedy=greedy,
        seeds=seeds,
        prompt_tokens=prompt_tokens,
        output_tokens=output_tokens,
    )
    return tensors, flags, n
