"""Tokenizer loading + streaming detokenization.

Capability parity with the reference tokenizer layer
(vllm/transformers_utils/tokenizer.py): slow/fast loading, per-LoRA
adapter tokenizers, and incremental decode that never emits half of a
multi-byte character. The streaming algorithm is the standard
two-cursor window scheme: keep a ``prefix`` cursor marking text already
emitted and a ``read`` cursor marking tokens already *rendered*; each
step re-renders the tail window and emits only the stable suffix.
"""
import itertools
from typing import List, Optional, Sequence, Tuple, Union

from transformers import (AutoTokenizer, PreTrainedTokenizer,
                          PreTrainedTokenizerFast)

from vllm_quick_tpu.logger import init_logger

logger = init_logger(__name__)

AnyTokenizer = Union[PreTrainedTokenizer, PreTrainedTokenizerFast]

# How many trailing tokens get re-rendered on the first decode step;
# enough to absorb any BPE merge across the prompt/output boundary.
_TAIL_WINDOW = 5
INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET = _TAIL_WINDOW

# Unicode replacement char: a trailing one means the byte-level decoder
# stopped mid-codepoint, so the text is not yet stable.
_UNSTABLE_TAIL = "�"


def get_tokenizer(
    tokenizer_name: str,
    *args,
    tokenizer_mode: str = "auto",
    trust_remote_code: bool = False,
    tokenizer_revision: Optional[str] = None,
    **kwargs,
) -> AnyTokenizer:
    if tokenizer_mode == "slow":
        if kwargs.get("use_fast", False):
            raise ValueError(
                "tokenizer_mode='slow' conflicts with use_fast=True.")
        kwargs["use_fast"] = False
    tokenizer = AutoTokenizer.from_pretrained(
        tokenizer_name,
        *args,
        trust_remote_code=trust_remote_code,
        revision=tokenizer_revision,
        **kwargs,
    )
    if not isinstance(tokenizer, PreTrainedTokenizerFast):
        logger.warning(
            "Loaded a slow (Python) tokenizer for %s; detokenization "
            "will bottleneck the engine step loop.", tokenizer_name)
    return tokenizer


class TokenizerGroup:
    """The base tokenizer plus lazily-loaded per-adapter tokenizers."""

    def __init__(self, tokenizer_id: str, enable_lora: bool = False,
                 max_input_length: Optional[int] = None,
                 **tokenizer_config) -> None:
        self.tokenizer_id = tokenizer_id
        self.tokenizer_config = tokenizer_config
        self.enable_lora = enable_lora
        self.max_input_length = max_input_length
        self.tokenizer = get_tokenizer(tokenizer_id, **tokenizer_config)
        self._adapter_tokenizers = {}

    def encode(self, prompt: str, request_id: Optional[str] = None,
               lora_request=None) -> List[int]:
        return self.get_lora_tokenizer(lora_request).encode(prompt)

    async def encode_async(self, prompt: str,
                           request_id: Optional[str] = None,
                           lora_request=None) -> List[int]:
        return self.encode(prompt, request_id, lora_request)

    def get_lora_tokenizer(self, lora_request=None) -> AnyTokenizer:
        if not lora_request or not self.enable_lora:
            return self.tokenizer
        key = lora_request.lora_int_id
        tok = self._adapter_tokenizers.get(key)
        if tok is None:
            try:
                tok = get_tokenizer(lora_request.lora_local_path,
                                    **self.tokenizer_config)
            except Exception:
                # Adapter ships no tokenizer: fall back to the base.
                tok = self.tokenizer
            self._adapter_tokenizers[key] = tok
        return tok


def _ids_to_tokens(tokenizer: AnyTokenizer, ids: Sequence[int],
                   skip_special: bool) -> List[str]:
    toks = tokenizer.convert_ids_to_tokens(
        list(ids), skip_special_tokens=skip_special)
    # Ids past the tokenizer vocab (padded model vocab) come back None.
    return ["" if t is None else t for t in toks]


def _render(tokenizer: AnyTokenizer, tokens: List[str],
            skip_special: bool, spaces_between_special: bool) -> str:
    """Tokens -> text. Added-vocab tokens (chat markers etc.) are not
    part of the underlying BPE merge space, so they pass through
    verbatim while the runs between them go through the tokenizer's
    own string converter."""
    added = tokenizer.get_added_vocab()
    if not added:
        return tokenizer.convert_tokens_to_string(tokens)
    drop = set(tokenizer.all_special_tokens) if skip_special else ()
    pieces: List[str] = []
    kept = (t for t in tokens if t not in drop)
    for is_added, run in itertools.groupby(kept, key=added.__contains__):
        if is_added:
            pieces.extend(run)
        else:
            pieces.append(tokenizer.convert_tokens_to_string(list(run)))
    return (" " if spaces_between_special else "").join(pieces)


def detokenize_incrementally(
    tokenizer: AnyTokenizer,
    all_input_ids: List[int],
    prev_tokens: Optional[List[str]],
    prefix_offset: int,
    read_offset: int,
    skip_special_tokens: bool = False,
    spaces_between_special_tokens: bool = True,
) -> Tuple[List[str], str, int, int]:
    """Advance a streaming decode by the newest token id.

    Returns (appended_tokens, emitted_text, prefix_offset, read_offset).
    Emits nothing while the rendered tail ends in a replacement char
    (incomplete UTF-8 sequence spanning token boundaries).
    """
    newest = all_input_ids[-1]
    if skip_special_tokens and newest in getattr(
            tokenizer, "all_special_ids", ()):
        return [], "", prefix_offset, read_offset

    if prev_tokens is None:
        # First call for this sequence: render the whole history once
        # and place the cursors over the tail window.
        tokens = _ids_to_tokens(tokenizer, all_input_ids,
                                skip_special_tokens)
        appended = tokens
        prefix_offset = max(len(tokens) - _TAIL_WINDOW, 0)
        read_offset = max(len(tokens) - 1, 0)
    else:
        appended = _ids_to_tokens(tokenizer, [newest],
                                  skip_special_tokens)
        tokens = prev_tokens + appended

    settled = _render(tokenizer, tokens[prefix_offset:read_offset],
                      skip_special_tokens, spaces_between_special_tokens)
    candidate = _render(tokenizer, tokens[prefix_offset:],
                        skip_special_tokens, spaces_between_special_tokens)

    if (len(candidate) <= len(settled)
            or candidate.endswith(_UNSTABLE_TAIL)):
        # Hold: the tail may still change as more bytes arrive.
        return appended, "", prefix_offset, read_offset
    return (appended, candidate[len(settled):], read_offset, len(tokens))
