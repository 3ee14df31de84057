"""Plain REST API server (reference: vllm/entrypoints/api_server.py).

NOTE: like the reference, this is a demo entrypoint; use the OpenAI
server (entrypoints/openai/api_server.py) for production serving.

POST /generate  {"prompt": str, "stream": bool, **sampling_params}
  -> non-stream: {"text": [prompt+completion, ...]}
  -> stream: newline-delimited JSON chunks ("\0"-terminated, matching
     the reference's wire format).
GET /health -> 200
"""
import argparse
import asyncio
import json
from typing import AsyncIterator

from aiohttp import web

from vllm_quick_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_quick_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.utils import random_uuid

TIMEOUT_KEEP_ALIVE = 5  # seconds
engine: AsyncLLMEngine = None


async def health(request: web.Request) -> web.Response:
    return web.Response(status=200)


async def generate(request: web.Request) -> web.StreamResponse:
    request_dict = await request.json()
    prompt = request_dict.pop("prompt")
    prefix_pos = request_dict.pop("prefix_pos", None)
    stream = request_dict.pop("stream", False)
    try:
        sampling_params = SamplingParams(**request_dict)
    except (ValueError, TypeError) as e:
        return web.json_response({"error": str(e)}, status=400)
    request_id = random_uuid()

    results_generator = engine.generate(prompt, sampling_params, request_id,
                                        prefix_pos=prefix_pos)

    if stream:
        response = web.StreamResponse(
            headers={"Content-Type": "application/json"})
        await response.prepare(request)
        async for request_output in results_generator:
            text_outputs = [
                request_output.prompt + output.text
                for output in request_output.outputs
            ]
            ret = {"text": text_outputs}
            await response.write((json.dumps(ret) + "\0").encode())
        await response.write_eof()
        return response

    final_output = None
    try:
        async for request_output in results_generator:
            final_output = request_output
    except asyncio.CancelledError:
        await engine.abort(request_id)
        return web.Response(status=499)

    assert final_output is not None
    text_outputs = [final_output.prompt + output.text
                    for output in final_output.outputs]
    return web.json_response({"text": text_outputs})


def build_app() -> web.Application:
    app = web.Application()
    app.router.add_get("/health", health)
    app.router.add_post("/generate", generate)
    return app


def main() -> None:
    global engine
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default=None)
    parser.add_argument("--port", type=int, default=8000)
    parser = AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()

    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)

    web.run_app(build_app(), host=args.host, port=args.port,
                keepalive_timeout=TIMEOUT_KEEP_ALIVE)


if __name__ == "__main__":
    main()
