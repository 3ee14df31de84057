"""End-to-end OpenAI-compatible server tests (reference:
tests/entrypoints/test_openai_server.py — completion, chat, streaming,
models, auth), driven in-process with aiohttp's TestClient against a
real engine on a tiny CPU model.

The async engine's background loop must live in one event loop for the
whole module, so tests submit coroutines to a dedicated loop thread.
"""
import asyncio
import json
import threading

import pytest

from tests.utils import make_tiny_llama_dir

_TIMEOUT = 120


class LoopThread:

    def __init__(self):
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.run_forever()

    def run(self, coro):
        return asyncio.run_coroutine_threadsafe(
            coro, self.loop).result(timeout=_TIMEOUT)


@pytest.fixture(scope="module")
def ctx():
    from aiohttp.test_utils import TestClient, TestServer
    from vllm_quick_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_quick_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_quick_tpu.entrypoints.openai import api_server as srv

    model_dir = make_tiny_llama_dir()
    lt = LoopThread()

    async def setup():
        engine = AsyncLLMEngine.from_engine_args(AsyncEngineArgs(
            model=model_dir, dtype="float32", max_model_len=256,
            disable_log_requests=True, disable_log_stats=True))
        srv.init_serving(engine, served_model=model_dir)
        client = TestClient(TestServer(srv.build_app()))
        await client.start_server()
        auth_client = TestClient(TestServer(
            srv.build_app(api_key="sekrit")))
        await auth_client.start_server()
        return client, auth_client

    client, auth_client = lt.run(setup())
    yield lt, client, auth_client, model_dir
    lt.run(client.close())
    lt.run(auth_client.close())
    lt.loop.call_soon_threadsafe(lt.loop.stop)


def test_health_and_models(ctx):
    lt, client, _, model_dir = ctx

    async def run():
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        assert r.status == 200
        data = await r.json()
        assert data["data"][0]["id"] == model_dir
        r = await client.get("/metrics")
        assert r.status == 200

    lt.run(run())


def test_completion(ctx):
    lt, client, _, model_dir = ctx

    async def run():
        r = await client.post("/v1/completions", json={
            "model": model_dir,
            "prompt": "Hello, my name is",
            "max_tokens": 5,
            "temperature": 0.0,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "text_completion"
        assert len(data["choices"]) == 1
        assert data["usage"]["completion_tokens"] == 5
        assert data["choices"][0]["finish_reason"] == "length"

        r = await client.post("/v1/completions", json={
            "model": model_dir,
            "prompt": ["a b c", "d e f"],
            "max_tokens": 3,
            "temperature": 0.0,
        })
        data = await r.json()
        assert len(data["choices"]) == 2

        r = await client.post("/v1/completions", json={
            "model": model_dir,
            "prompt": "x",
            "max_tokens": 3,
            "temperature": 0.0,
            "logprobs": 2,
        })
        data = await r.json()
        lp = data["choices"][0]["logprobs"]
        assert len(lp["tokens"]) == 3
        assert len(lp["top_logprobs"]) == 3

        # echo + logprobs must return real prompt logprobs
        # (reference sampler.py:426-537).
        r = await client.post("/v1/completions", json={
            "model": model_dir,
            "prompt": "hello there friend",
            "max_tokens": 2,
            "temperature": 0.0,
            "echo": True,
            "logprobs": 1,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        choice = data["choices"][0]
        assert choice["text"].startswith("hello there friend")
        lp = choice["logprobs"]
        n_prompt = data["usage"]["prompt_tokens"]
        assert len(lp["token_logprobs"]) >= n_prompt + 2
        # First prompt position has no context to score it.
        assert lp["token_logprobs"][0] is None
        assert all(isinstance(v, float)
                   for v in lp["token_logprobs"][1:n_prompt])

        r = await client.post("/v1/completions", json={
            "model": "nonexistent", "prompt": "x", "max_tokens": 1})
        assert r.status == 404

        r = await client.post("/v1/completions", json={
            "model": model_dir, "prompt": "x", "temperature": -1.0})
        assert r.status == 400

    lt.run(run())


def test_completion_streaming(ctx):
    lt, client, _, model_dir = ctx

    async def run():
        r = await client.post("/v1/completions", json={
            "model": model_dir,
            "prompt": "streaming test",
            "max_tokens": 4,
            "temperature": 0.0,
            "stream": True,
        })
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        body = await r.text()
        chunks = [line[len("data: "):] for line in body.splitlines()
                  if line.startswith("data: ")]
        assert chunks[-1] == "[DONE]"
        texts = [json.loads(c)["choices"][0]["text"] for c in chunks[:-1]]
        assert len(texts) >= 1

        r = await client.post("/v1/completions", json={
            "model": model_dir, "prompt": "streaming test",
            "max_tokens": 4, "temperature": 0.0})
        full = (await r.json())["choices"][0]["text"]
        assert "".join(texts) == full

    lt.run(run())


def test_chat_completion(ctx):
    lt, client, _, model_dir = ctx

    async def run():
        messages = [{"role": "system", "content": "be brief"},
                    {"role": "user", "content": "hi"}]
        r = await client.post("/v1/chat/completions", json={
            "model": model_dir, "messages": messages,
            "max_tokens": 5, "temperature": 0.0})
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["object"] == "chat.completion"
        assert data["choices"][0]["message"]["role"] == "assistant"

        r = await client.post("/v1/chat/completions", json={
            "model": model_dir, "messages": messages,
            "max_tokens": 5, "temperature": 0.0, "stream": True})
        body = await r.text()
        chunks = [line[len("data: "):] for line in body.splitlines()
                  if line.startswith("data: ")]
        assert chunks[-1] == "[DONE]"
        first = json.loads(chunks[0])
        assert first["choices"][0]["delta"]["role"] == "assistant"
        deltas = [json.loads(c)["choices"][0]["delta"].get("content", "")
                  for c in chunks[1:-1]]
        non_stream = data["choices"][0]["message"]["content"]
        assert "".join(deltas) == non_stream

    lt.run(run())


def test_api_key(ctx):
    lt, _, auth_client, model_dir = ctx

    async def run():
        r = await auth_client.post("/v1/completions", json={
            "model": model_dir, "prompt": "x", "max_tokens": 1})
        assert r.status == 401
        r = await auth_client.post(
            "/v1/completions",
            json={"model": model_dir, "prompt": "x", "max_tokens": 1,
                  "temperature": 0.0},
            headers={"Authorization": "Bearer sekrit"})
        assert r.status == 200
        r = await auth_client.get("/health")
        assert r.status == 200

    lt.run(run())
