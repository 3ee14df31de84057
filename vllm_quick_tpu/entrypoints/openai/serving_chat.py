"""/v1/chat/completions serving (reference parity:
vllm/entrypoints/openai/serving_chat.py — chat-template application,
delta streaming).
"""
import json
import time
from typing import AsyncIterator, Dict, Optional, Union

from vllm_quick_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_quick_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, ErrorResponse, UsageInfo, chat_message,
    chat_response, chat_stream_chunk)
from vllm_quick_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.utils import random_uuid

logger = init_logger(__name__)

_FALLBACK_TEMPLATE = (
    "{% for message in messages %}"
    "{{ message['role'] }}: {{ message['content'] }}\n"
    "{% endfor %}"
    "{% if add_generation_prompt %}assistant: {% endif %}")


class OpenAIServingChat(OpenAIServing):

    def __init__(self, engine: AsyncLLMEngine, served_model: str,
                 response_role: str = "assistant",
                 chat_template: Optional[str] = None) -> None:
        super().__init__(engine, served_model)
        self.response_role = response_role
        self.chat_template = chat_template

    def _apply_chat_template(self, request: ChatCompletionRequest) -> str:
        template = request.chat_template or self.chat_template
        try:
            return self.tokenizer.apply_chat_template(
                conversation=request.messages,
                chat_template=template,
                tokenize=False,
                add_generation_prompt=request.add_generation_prompt)
        except ValueError:
            # Tokenizer has no template and none was provided: fall back
            # to a minimal role-prefixed rendering.
            return self.tokenizer.apply_chat_template(
                conversation=request.messages,
                chat_template=_FALLBACK_TEMPLATE,
                tokenize=False,
                add_generation_prompt=request.add_generation_prompt)

    async def create_chat_completion(self, request: ChatCompletionRequest,
                                     raw_body: Dict):
        await self.ensure_ready()
        error = await self._check_model(request.model)
        if error is not None:
            return error

        try:
            prompt = self._apply_chat_template(request)
        except Exception as e:
            logger.error("Error in applying chat template: %s", e)
            return self.create_error_response(str(e))

        request_id = f"chatcmpl-{random_uuid()}"
        created = int(time.time())
        try:
            input_ids = self._validate_prompt_and_tokenize(
                request.sampling.get("max_tokens") or 16, prompt=prompt)
            sampling_params = request.to_sampling_params(
                default_max_tokens=self.max_model_len - len(input_ids))
        except ValueError as e:
            return self.create_error_response(str(e))

        result_generator = self.engine.generate(prompt, sampling_params,
                                                request_id,
                                                prompt_token_ids=input_ids)
        if request.stream and not sampling_params.use_beam_search:
            return self._stream_generator(request, result_generator,
                                          request_id, created)
        return await self._full_generator(request, result_generator,
                                          request_id, created)

    async def _full_generator(self, request, result_generator, request_id,
                              created):
        final = None
        async for res in result_generator:
            final = res
        assert final is not None
        choices = []
        num_generated = 0
        for output in final.outputs:
            num_generated += len(output.token_ids)
            choices.append({
                "index": output.index,
                "message": chat_message(self.response_role, output.text),
                "finish_reason": output.finish_reason,
            })
        num_prompt = len(final.prompt_token_ids)
        usage = UsageInfo(prompt_tokens=num_prompt,
                          completion_tokens=num_generated,
                          total_tokens=num_prompt + num_generated)
        return chat_response(request.model, choices, usage, request_id)

    async def _stream_generator(self, request, result_generator, request_id,
                                created) -> AsyncIterator[str]:
        n = request.sampling.get("n") or 1
        first = chat_stream_chunk(
            request_id, request.model, created,
            [{"index": i,
              "delta": {"role": self.response_role},
              "finish_reason": None} for i in range(n)])
        yield f"data: {json.dumps(first)}\n\n"

        previous_texts = [""] * n
        finished = [False] * n
        try:
            async for res in result_generator:
                for output in res.outputs:
                    i = output.index
                    if finished[i]:
                        continue
                    delta_text = output.text[len(previous_texts[i]):]
                    previous_texts[i] = output.text
                    chunk = chat_stream_chunk(
                        request_id, request.model, created,
                        [{"index": i, "delta": {"content": delta_text},
                          "finish_reason": output.finish_reason}])
                    yield f"data: {json.dumps(chunk)}\n\n"
                    if output.finish_reason is not None:
                        finished[i] = True
        except ValueError as e:
            err = self.create_error_response(str(e))
            yield f"data: {json.dumps(err.to_dict())}\n\n"
        yield "data: [DONE]\n\n"
