"""Shared serving logic (reference parity:
vllm/entrypoints/openai/serving_engine.py:16-107 — model check, logprob
conversion, tokenize + length validation).
"""
from typing import Dict, List, Optional, Tuple, Union

from vllm_quick_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_quick_tpu.entrypoints.openai.protocol import (ErrorResponse,
                                                        ModelCard)
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.transformers_utils.tokenizer import get_tokenizer

logger = init_logger(__name__)


class OpenAIServing:

    def __init__(self, engine: AsyncLLMEngine, served_model: str) -> None:
        self.engine = engine
        self.served_model = served_model
        self.max_model_len = 0
        self.tokenizer = None

    async def _post_init(self):
        engine_model_config = await self.engine.get_model_config()
        self.max_model_len = engine_model_config.max_model_len
        # Separate tokenizer for preprocessing (same as the reference,
        # serving_engine.py:31-38).
        self.tokenizer = get_tokenizer(
            engine_model_config.tokenizer,
            tokenizer_mode=engine_model_config.tokenizer_mode,
            trust_remote_code=engine_model_config.trust_remote_code)

    async def ensure_ready(self):
        if self.tokenizer is None:
            await self._post_init()

    async def show_available_models(self) -> List[ModelCard]:
        return [ModelCard(id=self.served_model, root=self.served_model)]

    def create_error_response(self, message: str,
                              code: int = 400) -> ErrorResponse:
        return ErrorResponse(message=message, code=code)

    async def _check_model(self, model: str) -> Optional[ErrorResponse]:
        if model == self.served_model:
            return None
        return ErrorResponse(message=f"The model `{model}` does not exist.",
                             type="NotFoundError", code=404)

    def _create_logprobs(
        self,
        token_ids: List[int],
        top_logprobs: Optional[List[Optional[Dict[int, float]]]] = None,
        num_output_top_logprobs: Optional[int] = None,
        initial_text_offset: int = 0,
    ) -> Dict:
        """OpenAI-style logprobs block (serving_engine.py:60-100)."""
        out = {"text_offset": [], "token_logprobs": [], "tokens": [],
               "top_logprobs": [] if num_output_top_logprobs else None}
        last_token_len = 0

        def id_to_token(tid: int) -> str:
            t = self.tokenizer.convert_ids_to_tokens(tid)
            # Ids outside the tokenizer vocab (padded model vocab).
            return t if t is not None else f"<unk_{tid}>"

        for i, token_id in enumerate(token_ids):
            step_top = top_logprobs[i] if top_logprobs else None
            token = id_to_token(token_id)
            out["tokens"].append(token)
            lp = None if step_top is None else step_top.get(token_id)
            out["token_logprobs"].append(lp)
            if not out["text_offset"]:
                out["text_offset"].append(initial_text_offset)
            else:
                out["text_offset"].append(out["text_offset"][-1]
                                          + last_token_len)
            last_token_len = len(token)
            if num_output_top_logprobs and step_top is not None:
                out["top_logprobs"].append({
                    id_to_token(tid): p for tid, p in step_top.items()
                })
        return out

    def _validate_prompt_and_tokenize(
        self,
        max_tokens: int,
        prompt: Optional[str] = None,
        prompt_ids: Optional[List[int]] = None,
    ) -> List[int]:
        """(serving_engine.py:107)."""
        if (prompt is None) == (prompt_ids is None):
            raise ValueError(
                "Either prompt or prompt_ids should be provided.")
        input_ids = prompt_ids if prompt_ids is not None else \
            self.tokenizer(prompt).input_ids
        token_num = len(input_ids)
        if token_num + max_tokens > self.max_model_len:
            raise ValueError(
                f"This model's maximum context length is "
                f"{self.max_model_len} tokens. However, you requested "
                f"{token_num + max_tokens} tokens ({token_num} in the "
                f"messages, {max_tokens} in the completion). Please "
                f"reduce the length of the messages or completion.")
        return input_ids
