"""/v1/completions serving (reference parity:
vllm/entrypoints/openai/serving_completion.py — batched prompts, n-way
stream merge, echo, logprobs).
"""
import json
import time
from typing import AsyncIterator, Dict, List, Optional, Tuple, Union

from vllm_quick_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_quick_tpu.entrypoints.openai.protocol import (
    CompletionRequest, ErrorResponse, UsageInfo, completion_choice,
    completion_response, completion_stream_chunk)
from vllm_quick_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_quick_tpu.outputs import RequestOutput
from vllm_quick_tpu.utils import merge_async_iterators, random_uuid


def parse_prompt_format(prompt) -> Tuple[bool, list]:
    """Returns (is_token_ids, list_of_prompts)
    (serving_completion.py parse_prompt_format)."""
    prompt_is_tokens = False
    prompts = [prompt]
    if isinstance(prompt, list):
        if len(prompt) == 0:
            raise ValueError("please provide at least one prompt")
        if isinstance(prompt[0], int):
            prompt_is_tokens = True
            prompts = [prompt]
        elif isinstance(prompt[0], str):
            prompts = prompt
        elif isinstance(prompt[0], list):
            prompt_is_tokens = True
            prompts = prompt
        else:
            raise ValueError(
                "prompt must be a string, array of strings, array of "
                "tokens, or array of token arrays")
    return prompt_is_tokens, prompts


class OpenAIServingCompletion(OpenAIServing):

    async def create_completion(self, request: CompletionRequest,
                                raw_body: Dict):
        """Returns a dict (non-streaming), an async generator of SSE
        strings (streaming), or ErrorResponse."""
        await self.ensure_ready()
        error = await self._check_model(request.model)
        if error is not None:
            return error

        request_id = f"cmpl-{random_uuid()}"
        created = int(time.time())
        try:
            sampling_params = request.to_sampling_params()
            prompt_is_tokens, prompts = parse_prompt_format(request.prompt)
            generators = []
            prompt_token_id_list: List[List[int]] = []
            for i, prompt in enumerate(prompts):
                if prompt_is_tokens:
                    input_ids = self._validate_prompt_and_tokenize(
                        sampling_params.max_tokens, prompt_ids=prompt)
                    text = self.tokenizer.decode(prompt)
                else:
                    input_ids = self._validate_prompt_and_tokenize(
                        sampling_params.max_tokens, prompt=prompt)
                    text = prompt
                prompt_token_id_list.append(input_ids)
                generators.append(self.engine.generate(
                    text, sampling_params, f"{request_id}-{i}",
                    prompt_token_ids=input_ids))
        except ValueError as e:
            return self.create_error_response(str(e))

        result_generator = merge_async_iterators(*generators)

        if request.stream and not sampling_params.use_beam_search:
            return self._stream_generator(request, result_generator,
                                          request_id, created,
                                          len(prompts))
        return await self._full_generator(request, result_generator,
                                          request_id, created, len(prompts))

    # -- non-streaming -----------------------------------------------------

    async def _full_generator(self, request, result_generator, request_id,
                              created, num_prompts):
        final: List[Optional[RequestOutput]] = [None] * num_prompts
        async for i, res in result_generator:
            final[i] = res
        choices = []
        num_prompt_tokens = 0
        num_generated_tokens = 0
        n = request.sampling.get("n") or 1
        for i, res in enumerate(final):
            assert res is not None
            num_prompt_tokens += len(res.prompt_token_ids)
            for output in res.outputs:
                num_generated_tokens += len(output.token_ids)
                if request.echo:
                    text = res.prompt + output.text
                    token_ids = res.prompt_token_ids + output.token_ids
                    top_lps = ((res.prompt_logprobs or []) +
                               (output.logprobs or [])) \
                        if request.logprobs is not None else None
                else:
                    text = output.text
                    token_ids = output.token_ids
                    top_lps = output.logprobs
                logprobs = None
                if request.logprobs is not None:
                    logprobs = self._create_logprobs(
                        token_ids, top_lps, request.logprobs)
                choices.append(completion_choice(
                    i * n + output.index, text, logprobs,
                    output.finish_reason))
        usage = UsageInfo(prompt_tokens=num_prompt_tokens,
                          completion_tokens=num_generated_tokens,
                          total_tokens=num_prompt_tokens
                          + num_generated_tokens)
        return completion_response(request.model, choices, usage,
                                   request_id)

    # -- streaming -----------------------------------------------------------

    async def _stream_generator(self, request, result_generator, request_id,
                                created,
                                num_prompts) -> AsyncIterator[str]:
        n = request.sampling.get("n") or 1
        previous_texts = [""] * (n * num_prompts)
        previous_num_tokens = [0] * (n * num_prompts)
        has_echoed = [False] * (n * num_prompts)

        try:
            async for prompt_idx, res in result_generator:
                for output in res.outputs:
                    i = output.index + prompt_idx * n
                    delta_text = output.text[len(previous_texts[i]):]
                    delta_token_ids = output.token_ids[
                        previous_num_tokens[i]:]
                    top_lps = output.logprobs[previous_num_tokens[i]:] \
                        if output.logprobs else None
                    if request.echo and not has_echoed[i]:
                        delta_text = res.prompt + delta_text
                        delta_token_ids = (res.prompt_token_ids
                                           + delta_token_ids)
                        has_echoed[i] = True
                    logprobs = None
                    if request.logprobs is not None:
                        logprobs = self._create_logprobs(
                            delta_token_ids, top_lps, request.logprobs,
                            initial_text_offset=len(previous_texts[i]))
                    previous_texts[i] = output.text
                    previous_num_tokens[i] = len(output.token_ids)
                    chunk = completion_stream_chunk(
                        request_id, request.model, created,
                        [completion_choice(i, delta_text, logprobs,
                                           output.finish_reason)])
                    yield f"data: {json.dumps(chunk)}\n\n"
                if res.finished:
                    usage = UsageInfo(
                        prompt_tokens=len(res.prompt_token_ids),
                        completion_tokens=previous_num_tokens[prompt_idx
                                                              * n],
                        total_tokens=len(res.prompt_token_ids)
                        + previous_num_tokens[prompt_idx * n])
        except ValueError as e:
            err = self.create_error_response(str(e))
            yield f"data: {json.dumps(err.to_dict())}\n\n"
        yield "data: [DONE]\n\n"
