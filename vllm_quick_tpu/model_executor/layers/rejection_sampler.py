"""Modified rejection sampling for speculative decoding.

Reference parity: vllm/model_executor/layers/rejection_sampler.py:47-246
— accept draft token x with prob min(1, p_target(x)/p_draft(x)); on
first rejection resample from the *recovered* distribution
norm(max(0, p_target - p_draft)); if every draft token is accepted,
append the bonus token sampled from the target's extra position. The
output distribution provably equals the target model's (speculative
decoding guarantee).

Functional jnp: everything is computed batched with static shapes; -1
marks positions after the first rejection.
"""
from typing import Tuple

import jax
import jax.numpy as jnp


def rejection_sample(
    key: jax.Array,
    draft_probs: jax.Array,     # [B, K, V]
    draft_token_ids: jax.Array,  # [B, K] int32
    target_probs: jax.Array,    # [B, K, V] target probs at draft posns
    bonus_token_ids: jax.Array,  # [B] int32 (target sample at K+1'th pos)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (output_token_ids [B, K+1], accepted_counts [B]).

    output[b, i] = accepted draft i, then (first-rejection) recovered
    token, then -1 padding; bonus token fills position K when all K
    drafts are accepted.
    """
    b, k, v = draft_probs.shape
    key_accept, key_recover = jax.random.split(key)

    bi = jnp.arange(b)[:, None]
    ki = jnp.arange(k)[None, :]
    p_d = draft_probs[bi, ki, draft_token_ids]     # [B, K]
    p_t = target_probs[bi, ki, draft_token_ids]    # [B, K]

    u = jax.random.uniform(key_accept, (b, k))
    accept = u < jnp.minimum(1.0, p_t / jnp.maximum(p_d, 1e-10))

    # First rejected index per row (k if none).
    rejected = jnp.logical_not(accept)
    first_rej = jnp.where(jnp.any(rejected, axis=1),
                          jnp.argmax(rejected, axis=1), k)     # [B]

    # Recovered distribution at the first rejected position.
    pos = jnp.minimum(first_rej, k - 1)
    residual = jnp.maximum(
        target_probs[jnp.arange(b), pos] - draft_probs[jnp.arange(b), pos],
        0.0)                                                    # [B, V]
    residual_sum = jnp.sum(residual, axis=-1, keepdims=True)
    # Degenerate residual (target == draft): fall back to target probs.
    residual = jnp.where(residual_sum > 0, residual,
                         target_probs[jnp.arange(b), pos])
    recovered = jax.random.categorical(
        key_recover, jnp.log(jnp.maximum(residual, 1e-20)))     # [B]

    # Assemble [B, K+1].
    cols = jnp.arange(k + 1)[None, :]
    out = jnp.where(cols < first_rej[:, None],
                    jnp.pad(draft_token_ids, ((0, 0), (0, 1))), -1)
    out = jnp.where(cols == first_rej[:, None],
                    jnp.where(first_rej[:, None] == k,
                              bonus_token_ids[:, None],
                              recovered[:, None]), out)
    num_emitted = first_rej + 1
    return out.astype(jnp.int32), num_emitted.astype(jnp.int32)
