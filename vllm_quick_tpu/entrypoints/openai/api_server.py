"""OpenAI-compatible API server (reference parity:
vllm/entrypoints/openai/api_server.py:146-233 — /v1/chat/completions,
/v1/completions, /v1/models, /health, /metrics, api-key middleware).
Built on aiohttp (fastapi is not part of the TPU image).
"""
import argparse
import asyncio
import json
import os
from typing import Optional

from aiohttp import web

from vllm_quick_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_quick_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_quick_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, ErrorResponse,
    ValidationError)
from vllm_quick_tpu.entrypoints.openai.serving_chat import OpenAIServingChat
from vllm_quick_tpu.entrypoints.openai.serving_completion import (
    OpenAIServingCompletion)
from vllm_quick_tpu.logger import init_logger

TIMEOUT_KEEP_ALIVE = 5  # seconds

logger = init_logger(__name__)

openai_serving_chat: OpenAIServingChat = None
openai_serving_completion: OpenAIServingCompletion = None


def _json_error(err: ErrorResponse) -> web.Response:
    return web.json_response({"error": err.to_dict()}, status=err.code)


async def health(request: web.Request) -> web.Response:
    return web.Response(status=200)


async def metrics(request: web.Request) -> web.Response:
    from prometheus_client import REGISTRY, generate_latest
    return web.Response(body=generate_latest(REGISTRY),
                        content_type="text/plain")


async def show_available_models(request: web.Request) -> web.Response:
    models = await openai_serving_completion.show_available_models()
    return web.json_response({"object": "list",
                              "data": [m.to_dict() for m in models]})


async def _sse(request: web.Request, generator) -> web.StreamResponse:
    response = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
        "Connection": "keep-alive",
    })
    await response.prepare(request)
    async for chunk in generator:
        await response.write(chunk.encode())
    await response.write_eof()
    return response


async def create_completion(request: web.Request) -> web.StreamResponse:
    try:
        body = await request.json()
        parsed = CompletionRequest.from_dict(body)
    except (ValidationError, ValueError, TypeError) as e:
        return _json_error(
            openai_serving_completion.create_error_response(str(e)))
    try:
        generator = await openai_serving_completion.create_completion(
            parsed, body)
    except ValidationError as e:
        return _json_error(
            openai_serving_completion.create_error_response(str(e)))
    if isinstance(generator, ErrorResponse):
        return _json_error(generator)
    if parsed.stream and not isinstance(generator, dict):
        return await _sse(request, generator)
    return web.json_response(generator)


async def create_chat_completion(request: web.Request) -> web.StreamResponse:
    try:
        body = await request.json()
        parsed = ChatCompletionRequest.from_dict(body)
    except (ValidationError, ValueError, TypeError) as e:
        return _json_error(
            openai_serving_chat.create_error_response(str(e)))
    generator = await openai_serving_chat.create_chat_completion(
        parsed, body)
    if isinstance(generator, ErrorResponse):
        return _json_error(generator)
    if parsed.stream and not isinstance(generator, dict):
        return await _sse(request, generator)
    return web.json_response(generator)


@web.middleware
async def api_key_middleware(request: web.Request, handler):
    token = request.app.get("api_key")
    if token and request.path.startswith("/v1"):
        auth = request.headers.get("Authorization")
        if auth != f"Bearer {token}":
            return web.json_response({"error": "Unauthorized"}, status=401)
    return await handler(request)


def build_app(api_key: Optional[str] = None) -> web.Application:
    app = web.Application(middlewares=[api_key_middleware])
    app["api_key"] = api_key or os.environ.get("VLLM_API_KEY")
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/v1/models", show_available_models)
    app.router.add_post("/v1/completions", create_completion)
    app.router.add_post("/v1/chat/completions", create_chat_completion)
    return app


def make_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="vLLM-quick-TPU OpenAI-compatible RESTful API server.")
    parser.add_argument("--host", type=str, default=None)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--api-key", type=str, default=None,
                        help="If provided, require this API key in the "
                        "Authorization header.")
    parser.add_argument("--served-model-name", type=str, default=None,
                        help="Model name used in the API; defaults to the "
                        "model path.")
    parser.add_argument("--chat-template", type=str, default=None,
                        help="Path to a jinja chat template, or the "
                        "template itself.")
    parser.add_argument("--response-role", type=str, default="assistant")
    return AsyncEngineArgs.add_cli_args(parser)


def init_serving(engine: AsyncLLMEngine, served_model: str,
                 response_role: str = "assistant",
                 chat_template: Optional[str] = None) -> None:
    global openai_serving_chat, openai_serving_completion
    template = chat_template
    if template and os.path.exists(template):
        with open(template) as f:
            template = f.read()
    openai_serving_chat = OpenAIServingChat(engine, served_model,
                                            response_role, template)
    openai_serving_completion = OpenAIServingCompletion(engine, served_model)


def main() -> None:
    args = make_arg_parser().parse_args()
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    served_model = args.served_model_name or args.model
    init_serving(engine, served_model, args.response_role,
                 args.chat_template)
    web.run_app(build_app(api_key=args.api_key), host=args.host,
                port=args.port, keepalive_timeout=TIMEOUT_KEEP_ALIVE)


if __name__ == "__main__":
    main()
