"""Embedding / LM-head LoRA math (reference parity:
vllm/lora/layers.py:147-280 VocabParallelEmbeddingWithLoRA and
:783-944 SamplerWithLoRA, incl. `lora_extra_vocab_size` added tokens).

TPU-native design: no wrapper modules — the adapter stacks live in the
param pytree (params["embed_lora"], params["head_lora"]) and these
pure functions are called from the model's forward/compute_logits with
the per-row slot indices that already drive the linear-layer BGMV.
Shapes are static (capacity x padded extra vocab), so the jitted step
never retraces when adapters come and go.

Semantics matched to the reference:
- input ids in [org_vocab, org_vocab + extra) select the adapter's
  *input* new-token embeddings (new_embeddings.safetensors
  "input_embeddings"; reference layers.py:258-267).
- the embedding LoRA delta is A-lookup (over base + extra rows) @ B
  (reference layers.py:259-280).
- logits gain `extra` columns: hidden @ output_embeddings.T for the
  row's adapter, -inf when the row has no adapter or the adapter added
  no tokens (reference layers.py:902-927 fills with -inf), plus the
  lm_head A/B delta over the full extended width (reference
  layers.py:929-936).
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def embed_with_lora(
    base_weight: jax.Array,        # [V_local, E] (tp-sharded axis 0)
    input_ids: jax.Array,          # [B, L] prefill | [B] decode
    el: Dict[str, jax.Array],      # {"a" [Ls,V+X,R], "b" [Ls,R,E],
                                   #  "extra" [Ls,X,E]}
    lora_indices: jax.Array,       # same shape as input_ids; -1 = none
    ctx,
    org_vocab: int,
) -> jax.Array:
    """Token embedding with adapter-added tokens + LoRA delta."""
    from vllm_quick_tpu.model_executor.layers.vocab_embedding import embed

    n_extra = el["extra"].shape[1]
    idx = lora_indices
    has_lora = idx >= 0
    is_extra = (input_ids >= org_vocab) & has_lora
    safe_slot = jnp.maximum(idx, 0)

    # Base rows: added tokens clamp to row 0 and are overwritten below.
    base_ids = jnp.where(is_extra, 0, jnp.minimum(input_ids,
                                                  org_vocab - 1))
    h = embed(base_weight, base_ids, ctx)

    # Adapter-added token embeddings (input side).
    extra_ids = jnp.clip(input_ids - org_vocab, 0, n_extra - 1)
    extra_e = el["extra"][safe_slot, extra_ids]          # [..., E]
    h = jnp.where(is_extra[..., None], extra_e.astype(h.dtype), h)

    # LoRA delta: per-token A-row lookup over [V+X] rows, then @ B.
    a_rows = el["a"][safe_slot,
                     jnp.minimum(input_ids, org_vocab + n_extra - 1)]
    a_rows = jnp.where(has_lora[..., None], a_rows, 0)   # [..., R]
    delta = jnp.einsum("...r,...re->...e",
                       a_rows.astype(jnp.float32),
                       el["b"][safe_slot].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    return h + delta.astype(h.dtype)


def logits_with_lora(
    base_logits: jax.Array,        # [T, V] full-vocab (post tp-gather)
    hidden: jax.Array,             # [T, E]
    hl: Dict[str, jax.Array],      # {"a" [Ls,E,R], "b" [Ls,R,V+X],
                                   #  "extra" [Ls,X,E], "valid" [Ls]}
    lora_indices: Optional[jax.Array],  # [T] or None
) -> jax.Array:
    """Extend logits with adapter extra-vocab columns + lm_head LoRA."""
    t = hidden.shape[0]
    n_extra = hl["extra"].shape[1]
    if lora_indices is None:
        extra = jnp.full((t, n_extra), NEG_INF, base_logits.dtype)
        return jnp.concatenate([base_logits, extra], axis=-1)

    idx = lora_indices.reshape(t)
    has = idx >= 0
    safe = jnp.maximum(idx, 0)

    # Extra-vocab logits from the adapter's output embeddings. Columns
    # beyond the adapter's actual added-token count mask to -inf (the
    # reference's -inf fill of embeddings_tensors, layers.py:845-849).
    out_e = hl["extra"][safe]                            # [T, X, E]
    extra_logits = jnp.einsum(
        "te,txe->tx", hidden.astype(jnp.float32),
        out_e.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    col_ok = (jnp.arange(n_extra)[None, :]
              < hl["count"][safe][:, None])              # [T, X]
    extra_logits = jnp.where(col_ok & has[:, None], extra_logits,
                             NEG_INF)

    logits = jnp.concatenate(
        [base_logits.astype(jnp.float32), extra_logits], axis=-1)

    # lm_head LoRA delta over the extended width (masked BGMV — same
    # one-hot fold as ops/bgmv.py).
    from vllm_quick_tpu.ops.bgmv import bgmv
    delta = bgmv(hidden.astype(jnp.float32), hl["a"], hl["b"], idx)
    return (logits + delta).astype(base_logits.dtype)


def row_lora_indices(meta) -> Optional[jax.Array]:
    """Per-ROW slot index from InputMetadata.lora_indices (which is
    per-token [B, L] at prefill, per-seq [B] at decode)."""
    li = getattr(meta, "lora_indices", None)
    if li is None:
        return None
    return li[:, 0] if li.ndim == 2 else li


def make_embed_stacks(capacity: int, org_vocab: int, extra: int,
                      rank: int, embed_dim: int, dtype) -> Dict[str, Any]:
    return {
        "a": jnp.zeros((capacity, org_vocab + extra, rank), dtype),
        "b": jnp.zeros((capacity, rank, embed_dim), dtype),
        "extra": jnp.zeros((capacity, extra, embed_dim), dtype),
    }


def make_head_stacks(capacity: int, org_vocab: int, extra: int,
                     rank: int, embed_dim: int, dtype) -> Dict[str, Any]:
    return {
        "a": jnp.zeros((capacity, embed_dim, rank), dtype),
        "b": jnp.zeros((capacity, rank, org_vocab + extra), dtype),
        "extra": jnp.zeros((capacity, extra, embed_dim), dtype),
        "count": jnp.zeros((capacity,), jnp.int32),
    }
