"""Vectorized on-device sampler.

Reference parity: vllm/model_executor/layers/sampler.py:15-537 —
penalties, temperature, top-k/top-p/min-p, greedy/random sampling and
logprob extraction — restated as one fully-vectorized jitted function
(no per-token host sync; the reference needed categorized host loops).
Beam search scoring stays engine-side, fed by the top-logprobs output,
like the reference's beam bookkeeping in llm_engine.py:553.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_quick_tpu.model_executor.sampling_metadata import (SamplingFlags,
                                                             SamplingTensors)

NEG_INF = -float(2.0**30)


def _apply_penalties(logits: jax.Array, t: SamplingTensors) -> jax.Array:
    """Repetition (prompt+output), presence and frequency (output only)
    penalties — semantics of sampler.py:169-230."""
    s, v = logits.shape

    def counts(tokens):
        rows = jnp.repeat(jnp.arange(s), tokens.shape[1])
        cols = tokens.reshape(-1)
        c = jnp.zeros((s, v), jnp.float32)
        return c.at[rows, cols].add(jnp.where(cols >= 0, 1.0, 0.0),
                                    mode="drop")

    out_counts = counts(t.output_tokens)
    prompt_counts = counts(t.prompt_tokens)
    appeared = ((out_counts + prompt_counts) > 0)
    out_appeared = out_counts > 0

    rep = t.repetition_penalties[:, None]
    logits = jnp.where(
        appeared,
        jnp.where(logits > 0, logits / rep, logits * rep),
        logits)
    logits = logits - t.frequency_penalties[:, None] * out_counts
    logits = logits - t.presence_penalties[:, None] * out_appeared
    return logits


def _apply_top_k_top_p_min_p(logits, t: SamplingTensors,
                             flags: SamplingFlags):
    s, v = logits.shape
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]        # descending
    if flags.do_top_k:
        kth = jnp.take_along_axis(
            sorted_logits,
            jnp.clip(t.top_ks[:, None] - 1, 0, v - 1), axis=1)
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if flags.do_top_p:
        probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
        cumsum = jnp.cumsum(probs_sorted, axis=-1)
        # Smallest set with cumulative prob >= top_p; keep at least 1.
        keep_sorted = (cumsum - probs_sorted) < t.top_ps[:, None]
        # Threshold = lowest kept logit.
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
            keepdims=True)
        logits = jnp.where(logits < thresh, NEG_INF, logits)
    if flags.do_min_p:
        probs = jax.nn.softmax(logits, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        logits = jnp.where(probs < t.min_ps[:, None] * pmax, NEG_INF,
                           logits)
    return logits


def sample_logits(logits: jax.Array, t: SamplingTensors,
                  flags: SamplingFlags):
    """Traceable sampling body — also inlined into the fused
    step+sample jit (worker/model_runner.py) so decode needs one
    dispatch instead of two."""
    logits = logits.astype(jnp.float32)
    # Align the logits row count to the sampling-row bucket inside the
    # jit (an eager slice/pad would cost an extra device dispatch).
    sp = t.temperatures.shape[0]
    if logits.shape[0] < sp:
        logits = jnp.pad(logits, ((0, sp - logits.shape[0]), (0, 0)))
    elif logits.shape[0] > sp:
        logits = logits[:sp]
    s, v = logits.shape

    if flags.do_penalties:
        logits = _apply_penalties(logits, t)

    # Greedy rows (t=0) use 1.0: argmax is scale-invariant and their
    # reported logprobs stay meaningful (same trick as sampler.py:359).
    temps = jnp.where(t.temperatures[:, None] < 1e-5, 1.0,
                      t.temperatures[:, None])
    scaled = logits / temps
    if flags.do_top_k or flags.do_top_p or flags.do_min_p:
        scaled = _apply_top_k_top_p_min_p(scaled, t, flags)

    logprobs = jax.nn.log_softmax(scaled, axis=-1)

    # Greedy choice.
    greedy_ids = jnp.argmax(logits, axis=-1)

    # Random choice(s) via per-row folded keys (gumbel-max).
    base = jax.random.PRNGKey(0)
    def row_sample(seed, row_logprobs):
        key = jax.random.fold_in(base, seed)
        g = jax.random.gumbel(key, (flags.max_best_of, v))
        return jnp.argmax(row_logprobs[None, :] + g, axis=-1)
    random_ids = jax.vmap(row_sample)(t.seeds, logprobs)   # [S, max_best_of]

    chosen = jnp.where(t.is_greedy[:, None],
                       greedy_ids[:, None].repeat(flags.max_best_of, 1),
                       random_ids)                         # [S, max_best_of]

    # Logprobs of chosen tokens (+ raw-logits logprob for beam scoring).
    chosen_logprobs = jnp.take_along_axis(logprobs, chosen, axis=1)

    if flags.max_num_logprobs > 0:
        top_lp, top_ids = jax.lax.top_k(logprobs, flags.max_num_logprobs)
    else:
        top_lp = jnp.zeros((s, 1), jnp.float32)
        top_ids = jnp.zeros((s, 1), jnp.int32)
    return chosen, chosen_logprobs, top_lp, top_ids


@functools.partial(jax.jit, static_argnames=("flags_key",))
def _sample_jit(logits: jax.Array, t: SamplingTensors, flags_key: tuple):
    return sample_logits(logits, t, SamplingFlags(*flags_key))


class Sampler:
    """Thin host-side wrapper: jit dispatch + numpy conversion."""

    def __init__(self, vocab_size: int) -> None:
        self.vocab_size = vocab_size

    def __call__(
        self,
        logits: jax.Array,       # [Sp, V]
        tensors: SamplingTensors,
        flags: SamplingFlags,
    ):
        return _sample_jit(logits, tensors, flags_key=flags.key())
