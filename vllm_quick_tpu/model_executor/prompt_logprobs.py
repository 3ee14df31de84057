"""All-position prompt logprob extraction (the OpenAI ``echo`` /
``prompt_logprobs`` math), shared by the plain echo step
(worker/model_runner.py _get_echo_step) and the pipeline-parallel echo
variant (parallel/pipeline.py).

Reference: vllm/model_executor/layers/sampler.py:426-537.
"""
import jax
import jax.numpy as jnp


def echo_prompt_logprobs(model, params, hidden, input_ids, k):
    """Per-position target-token logprob + top-k over the full prompt.

    ``hidden`` [B, L, H] (all positions), ``input_ids`` [B, L].
    Returns (tgt [B, L], top_logprobs [B, L, k], top_ids [B, L, k]).
    Memory is bounded by mapping row-by-row over the batch.
    """

    def one_row(args):
        h, row_ids = args              # [L, H], [L]
        row_logits = model.compute_logits(params, h)
        lsm = jax.nn.log_softmax(row_logits.astype(jnp.float32),
                                 axis=-1)
        # Position i scores the *next* prompt token (i+1).
        nxt = jnp.roll(row_ids, -1)
        tgt = jnp.take_along_axis(lsm, nxt[:, None], axis=1)[:, 0]
        tl, ti = jax.lax.top_k(lsm, k)
        return tgt, tl, ti

    return jax.lax.map(one_row, (hidden, input_ids))
