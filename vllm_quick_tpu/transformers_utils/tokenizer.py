"""Tokenizer management + incremental detokenization.

Reference parity: vllm/transformers_utils/tokenizer.py:91-245 —
get_tokenizer with slow/fast modes, TokenizerGroup with per-LoRA
tokenizers, and the prefix/read-offset incremental detokenizer.
"""
from typing import List, Optional, Tuple, Union

from transformers import (AutoTokenizer, PreTrainedTokenizer,
                          PreTrainedTokenizerFast)

from vllm_quick_tpu.logger import init_logger

logger = init_logger(__name__)

AnyTokenizer = Union[PreTrainedTokenizer, PreTrainedTokenizerFast]

INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET = 5


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
                "Cannot use the fast tokenizer in slow tokenizer mode.")
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
            "Using a slow tokenizer. This will likely slow down the "
            "engine; consider a fast-tokenizer model variant.")
    return tokenizer


class TokenizerGroup:
    """Holds the base tokenizer plus per-LoRA-adapter tokenizers."""

    def __init__(self, tokenizer_id: str, enable_lora: bool = False,
                 max_input_length: Optional[int] = None,
                 **tokenizer_config) -> None:
        self.tokenizer_id = tokenizer_id
        self.tokenizer_config = tokenizer_config
        self.enable_lora = enable_lora
        self.max_input_length = max_input_length
        self.tokenizer = get_tokenizer(tokenizer_id, **tokenizer_config)
        self.lora_tokenizers = {}

    def encode(self, prompt: str, request_id: Optional[str] = None,
               lora_request=None) -> List[int]:
        tokenizer = self.get_lora_tokenizer(lora_request)
        return tokenizer.encode(prompt)

    async def encode_async(self, prompt: str,
                           request_id: Optional[str] = None,
                           lora_request=None) -> List[int]:
        return self.encode(prompt, request_id, lora_request)

    def get_lora_tokenizer(self, lora_request=None) -> AnyTokenizer:
        if not lora_request or not self.enable_lora:
            return self.tokenizer
        key = lora_request.lora_int_id
        if key not in self.lora_tokenizers:
            try:
                tok = get_tokenizer(lora_request.lora_local_path,
                                    **self.tokenizer_config)
            except Exception:
                # No tokenizer shipped with the adapter: use the base
                # model's (reference tokenizer.py:121 fallback).
                tok = self.tokenizer
            self.lora_tokenizers[key] = tok
        return self.lora_tokenizers[key]


def _convert_tokens_to_string_with_added_encoders(
    tokenizer: AnyTokenizer,
    output_tokens: List[str],
    skip_special_tokens: bool,
    spaces_between_special_tokens: bool,
) -> str:
    sub_texts: List[str] = []
    current_sub_text: List[str] = []
    all_special_tokens = set(tokenizer.all_special_tokens)
    for token in output_tokens:
        if skip_special_tokens and token in all_special_tokens:
            continue
        if token in tokenizer.get_added_vocab():
            if current_sub_text:
                sub_texts.append(
                    tokenizer.convert_tokens_to_string(current_sub_text))
                current_sub_text = []
            sub_texts.append(token)
        else:
            current_sub_text.append(token)
    if current_sub_text:
        sub_texts.append(
            tokenizer.convert_tokens_to_string(current_sub_text))
    if spaces_between_special_tokens:
        return " ".join(sub_texts)
    return "".join(sub_texts)


def detokenize_incrementally(
    tokenizer: AnyTokenizer,
    all_input_ids: List[int],
    prev_tokens: Optional[List[str]],
    prefix_offset: int,
    read_offset: int,
    skip_special_tokens: bool = False,
    spaces_between_special_tokens: bool = True,
) -> Tuple[List[str], str, int, int]:
    """Streaming detokenization with replacement-char suppression.

    Returns (new_tokens, new_decoded_text, prefix_offset, read_offset);
    same contract as the reference (tokenizer.py:185+).
    """
    new_token_id = all_input_ids[-1]
    if skip_special_tokens and new_token_id in getattr(
            tokenizer, "all_special_ids", []):
        return [], "", prefix_offset, read_offset

    def _to_tokens(ids):
        toks = tokenizer.convert_ids_to_tokens(
            ids, skip_special_tokens=skip_special_tokens)
        # Ids beyond the tokenizer vocab (padded model vocabs) map to "".
        return [t if t is not None else "" for t in toks]

    if prev_tokens is None:
        new_tokens = _to_tokens(all_input_ids)
        output_tokens = new_tokens
        prefix_offset = max(
            len(output_tokens) - INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET,
            0)
        read_offset = max(len(output_tokens) - 1, 0)
    else:
        new_tokens = _to_tokens([new_token_id])
        output_tokens = prev_tokens + new_tokens

    # Try decoding the text window; only emit once it stops changing in a
    # way that indicates an incomplete multibyte sequence.
    has_added = bool(tokenizer.get_added_vocab())
    if has_added:
        prefix_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer, output_tokens[prefix_offset:read_offset],
            skip_special_tokens, spaces_between_special_tokens)
        new_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer, output_tokens[prefix_offset:],
            skip_special_tokens, spaces_between_special_tokens)
    else:
        prefix_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:read_offset])
        new_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:])

    if len(new_text) > len(prefix_text) and not new_text.endswith("�"):
        new_text = new_text[len(prefix_text):]
        return new_tokens, new_text, read_offset, len(output_tokens)
    return new_tokens, "", prefix_offset, read_offset
