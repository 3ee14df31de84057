"""Asyncio front-end for online serving.

Capability parity with the reference async engine
(vllm/engine/async_llm_engine.py): one background task drives the
blocking engine step in a thread-pool executor while per-request
``AsyncStream``s fan results out to any number of concurrent
``generate`` callers; a crashed loop poisons every open stream with
``AsyncEngineDeadError``. TPU-native delta: there are no Ray actors —
a single in-process engine owns all chips via pjit, so the "tracker"
is just a pair of deques drained once per loop iteration (every
mutation happens on the event loop thread; no locks, no asyncio
queues).
"""
import asyncio
import time
from typing import (AsyncIterator, Dict, Iterable, List, Optional, Set,
                    Tuple, Type, Union)

from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_quick_tpu.engine.llm_engine import LLMEngine
from vllm_quick_tpu.logger import init_logger
from vllm_quick_tpu.outputs import RequestOutput
from vllm_quick_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)

# Queue sentinel closing an AsyncStream.
_STREAM_END = object()


class AsyncEngineDeadError(RuntimeError):
    """The background engine loop is no longer running."""


class AsyncStream:
    """Async iterator over one request's incremental outputs."""

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._items: asyncio.Queue = asyncio.Queue()
        self._closed = False

    def put(self, item: Union[RequestOutput, Exception]) -> None:
        if not self._closed:
            self._items.put_nowait(item)

    def finish(self) -> None:
        if not self._closed:
            self._items.put_nowait(_STREAM_END)
            self._closed = True

    @property
    def finished(self) -> bool:
        return self._closed

    def __aiter__(self) -> "AsyncStream":
        return self

    async def __anext__(self) -> RequestOutput:
        item = await self._items.get()
        if item is _STREAM_END:
            raise StopAsyncIteration
        if isinstance(item, Exception):
            raise item
        return item


class RequestTracker:
    """Hand-off point between serving coroutines and the engine loop.

    Arrivals and aborts accumulate between loop iterations; the loop
    drains both atomically with ``get_new_and_finished_requests``.
    """

    def __init__(self) -> None:
        self._streams: Dict[str, AsyncStream] = {}
        self._arrivals: List[Tuple[AsyncStream, dict]] = []
        self._cancellations: List[str] = []
        self.new_requests_event: Optional[asyncio.Event] = None

    def __contains__(self, request_id) -> bool:
        return request_id in self._streams

    def init_event(self) -> None:
        self.new_requests_event = asyncio.Event()

    def add_request(self, request_id: str, **engine_kwargs) -> AsyncStream:
        if request_id in self._streams or any(
                s.request_id == request_id for s, _ in self._arrivals):
            raise KeyError(f"Duplicate request id {request_id}")
        stream = AsyncStream(request_id)
        self._arrivals.append(
            (stream, {"request_id": request_id, **engine_kwargs}))
        if self.new_requests_event is not None:
            self.new_requests_event.set()
        return stream

    def abort_request(self, request_id: str, *,
                      verbose: bool = False) -> None:
        if verbose:
            logger.info("Aborted request %s.", request_id)
        self._cancellations.append(request_id)
        stream = self._streams.pop(request_id, None)
        if stream is not None:
            stream.finish()

    def process_request_output(self, output: RequestOutput, *,
                               verbose: bool = False) -> None:
        stream = self._streams.get(output.request_id)
        if stream is None:
            return  # aborted while the step ran
        stream.put(output)
        if output.finished:
            if verbose:
                logger.info("Finished request %s.", output.request_id)
            self.abort_request(output.request_id)

    def propagate_exception(self, exc: Exception,
                            request_id: Optional[str] = None) -> None:
        targets = ([self._streams[request_id]] if request_id is not None
                   else list(self._streams.values()))
        for stream in targets:
            stream.put(exc)

    def get_new_and_finished_requests(self) -> Tuple[List[dict], Set[str]]:
        cancelled = set(self._cancellations)
        self._cancellations.clear()
        for rid in cancelled:
            self._streams.pop(rid, None)

        fresh: List[dict] = []
        for stream, kwargs in self._arrivals:
            if stream.request_id in cancelled:
                # Aborted before the engine ever saw it.
                stream.finish()
                continue
            self._streams[stream.request_id] = stream
            fresh.append(kwargs)
        self._arrivals.clear()

        if self.new_requests_event is not None:
            self.new_requests_event.clear()
        return fresh, cancelled

    async def wait_for_new_requests(self) -> None:
        await self.new_requests_event.wait()


class _AsyncLLMEngine(LLMEngine):
    """LLMEngine whose blocking step runs off the event loop."""

    async def step_async(self) -> List[RequestOutput]:
        return await asyncio.get_event_loop().run_in_executor(
            None, self.step)

    async def add_request_async(self, *args, **kwargs) -> None:
        return self.add_request(*args, **kwargs)


class AsyncLLMEngine:
    """Multiplexes concurrent ``generate`` calls onto one engine loop."""

    _engine_class: Type[_AsyncLLMEngine] = _AsyncLLMEngine

    def __init__(self, *args, log_requests: bool = True,
                 max_log_len: Optional[int] = None,
                 start_engine_loop: bool = True, **kwargs) -> None:
        self.log_requests = log_requests
        self.max_log_len = max_log_len
        self.engine = self._init_engine(*args, **kwargs)
        self.start_engine_loop = start_engine_loop
        self.background_loop: Optional[asyncio.Future] = None
        self._loop_task: Optional[asyncio.Task] = None
        self._request_tracker = RequestTracker()
        self._errored_with: Optional[BaseException] = None

    def _init_engine(self, *args, **kwargs) -> _AsyncLLMEngine:
        return self._engine_class(*args, **kwargs)

    # ---- loop lifecycle --------------------------------------------------

    @property
    def is_running(self) -> bool:
        return (self.background_loop is not None
                and not self.background_loop.done())

    @property
    def errored(self) -> bool:
        return self._errored_with is not None

    def start_background_loop(self) -> None:
        if self.errored:
            raise AsyncEngineDeadError(
                "Engine loop already crashed.") from self._errored_with
        if self.is_running:
            raise RuntimeError("Engine loop already running.")
        self._request_tracker.init_event()
        self._loop_task = asyncio.get_event_loop().create_task(
            self.run_engine_loop())
        self._loop_task.add_done_callback(self._on_loop_done)
        # Shielded so a caller cancelling `generate` can't kill the loop.
        self.background_loop = asyncio.shield(self._loop_task)

    def _on_loop_done(self, task: asyncio.Task) -> None:
        """Record the crash and poison every open stream."""
        if task.cancelled():
            return
        exc = task.exception()
        if exc is None:
            exc = AsyncEngineDeadError(
                "Engine loop stopped without an exception — this is a "
                "bug; please report it.")
        self._errored_with = exc
        wrapped = AsyncEngineDeadError(
            f"Engine loop died: {exc!r}")
        wrapped.__cause__ = exc
        self._request_tracker.propagate_exception(wrapped)
        logger.error("Engine loop died", exc_info=exc)

    async def engine_step(self) -> bool:
        """One iteration: feed arrivals/aborts, step, fan out results.
        Returns whether any request is still in flight."""
        arrivals, cancelled = (
            self._request_tracker.get_new_and_finished_requests())

        for kwargs in arrivals:
            try:
                await self.engine.add_request_async(**kwargs)
            except ValueError as e:
                # Invalid request (e.g. over the model limit): fail only
                # its own stream.
                rid = kwargs["request_id"]
                self._request_tracker.propagate_exception(e, rid)
                self._request_tracker.abort_request(rid)

        if cancelled:
            self.engine.abort_request(cancelled)

        outputs = await self.engine.step_async()
        for output in outputs:
            self._request_tracker.process_request_output(
                output, verbose=self.log_requests)
        return bool(outputs)

    async def run_engine_loop(self) -> None:
        busy = False
        while True:
            if not busy:
                await self._request_tracker.wait_for_new_requests()
            busy = await self.engine_step()
            await asyncio.sleep(0)

    # ---- request API -----------------------------------------------------

    async def add_request(
        self,
        request_id: str,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request=None,
        prefix_pos: Optional[int] = None,
    ) -> AsyncStream:
        if self.log_requests:
            preview = prompt if self.max_log_len is None else \
                (prompt or "")[:self.max_log_len]
            logger.info("Received request %s: prompt=%r params=%s",
                        request_id, preview, sampling_params)
        if not self.is_running:
            if not self.start_engine_loop:
                raise AsyncEngineDeadError(
                    "Engine loop is not running; call "
                    "start_background_loop() or pass "
                    "start_engine_loop=True.")
            self.start_background_loop()
        return self._request_tracker.add_request(
            request_id,
            prompt=prompt,
            sampling_params=sampling_params,
            prompt_token_ids=prompt_token_ids,
            arrival_time=arrival_time or time.time(),
            lora_request=lora_request,
            prefix_pos=prefix_pos,
        )

    async def generate(
        self,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        request_id: str,
        prompt_token_ids: Optional[List[int]] = None,
        lora_request=None,
        prefix_pos: Optional[int] = None,
    ) -> AsyncIterator[RequestOutput]:
        """Stream a request's outputs; aborts it on caller cancel."""
        try:
            stream = await self.add_request(
                request_id, prompt, sampling_params,
                prompt_token_ids=prompt_token_ids,
                lora_request=lora_request, prefix_pos=prefix_pos)
            async for output in stream:
                yield output
        except (Exception, asyncio.CancelledError):
            self._abort(request_id)
            raise

    async def abort(self, request_id: str) -> None:
        if not self.is_running:
            raise AsyncEngineDeadError("Engine loop is not running.")
        self._abort(request_id)

    def _abort(self, request_id: str) -> None:
        self._request_tracker.abort_request(request_id,
                                            verbose=self.log_requests)

    async def get_model_config(self) -> ModelConfig:
        return self.engine.get_model_config()

    @classmethod
    def from_engine_args(cls,
                         engine_args: AsyncEngineArgs) -> "AsyncLLMEngine":
        configs = engine_args.create_engine_configs()
        return cls(*configs,
                   log_requests=not engine_args.disable_log_requests,
                   log_stats=not engine_args.disable_log_stats,
                   max_log_len=engine_args.max_log_len,
                   start_engine_loop=True)
