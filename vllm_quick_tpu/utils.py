"""Small shared utilities (reference parity: vllm/utils.py)."""
import enum
import os
import socket
import uuid
from functools import lru_cache
from typing import List, Sequence, TypeVar

import numpy as np
import psutil

T = TypeVar("T")

_GB = 1 << 30


class Device(enum.Enum):
    """Where a physical KV block lives (reference: vllm/utils.py Device)."""
    TPU = enum.auto()
    CPU = enum.auto()


class Counter:
    """Monotonic id generator for requests / sequences."""

    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        value = self.counter
        self.counter += 1
        return value

    def reset(self) -> None:
        self.counter = 0


def random_uuid() -> str:
    return str(uuid.uuid4().hex)


def get_open_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, multiple: int) -> int:
    return cdiv(x, multiple) * multiple


def pad_to_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; bounds jit recompilation (the TPU analogue of
    the reference's CUDA-graph padded batch sizes, model_runner.py:32)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_list(x: List[T], size: int, pad: T) -> List[T]:
    assert len(x) <= size
    return x + [pad] * (size - len(x))


def in_wsl() -> bool:
    return "microsoft" in " ".join(os.uname()).lower()


@lru_cache(maxsize=None)
def get_cpu_memory() -> int:
    """Total host memory in bytes."""
    return psutil.virtual_memory().total


def make_ndarray_with_pad(
    x: List[List[int]],
    pad: int,
    dtype,
    max_len: int | None = None,
) -> np.ndarray:
    """Pack ragged int lists into a padded 2D numpy array."""
    if max_len is None:
        max_len = max((len(row) for row in x), default=0)
    out = np.full((len(x), max_len), pad, dtype=dtype)
    for i, row in enumerate(x):
        out[i, : len(row)] = row
    return out


STR_DTYPE_TO_JNP = {
    "half": "float16",
    "float16": "float16",
    "bfloat16": "bfloat16",
    "float": "float32",
    "float32": "float32",
    "fp8_e5m2": "float8_e5m2",
    "int8": "int8",
}


async def merge_async_iterators(*iterators):
    """Merge several async iterators into one, yielding
    (origin_index, item) in arrival order (the reference's n-way stream
    merge, serving_completion.py:220-250)."""
    import asyncio

    queue: "asyncio.Queue" = asyncio.Queue()
    _DONE = object()

    async def producer(i, iterator):
        try:
            async for item in iterator:
                await queue.put((i, item))
        except Exception as e:
            await queue.put(e)
        await queue.put(_DONE)

    tasks = [asyncio.get_event_loop().create_task(producer(i, it))
             for i, it in enumerate(iterators)]

    remaining = len(iterators)
    try:
        while remaining:
            item = await queue.get()
            if item is _DONE:
                remaining -= 1
                continue
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        for task in tasks:
            if not task.done():
                task.cancel()


# Static-shape buckets shared by the model runner (which pads batches
# to them before jit dispatch) and the scheduler (whose admission
# budget must count the PADDED shapes that actually compile — counting
# raw `len * max` let a 17-prompt batch of ~120-token prompts pass a
# 2048-token budget and then compile as a (32, 128) = 4096-token
# bucket, OOMing a 7B engine mid-serving in round 4).
DECODE_BATCH_BUCKETS = (8, 16, 32, 64, 128, 256, 512)
PREFILL_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)
LEN_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
               32768)
BLOCK_TABLE_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


_COMPILE_CACHE_ENABLED = False


def enable_persistent_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at an on-disk directory.

    The TPU analogue of the reference's CUDA-graph warmup persistence
    (vllm/worker/model_runner.py:658-737 captures graphs per process;
    we instead cache compiled XLA executables ACROSS processes): cold
    bucket compiles through the tunnel take minutes and killed two
    rounds of serving sweeps; with the cache a restarted server or
    benchmark replays every previously-seen bucket in milliseconds.

    Directory: $VLLM_TPU_COMPILE_CACHE (set to empty string to
    disable), default ~/.cache/vllm_quick_tpu/xla. Verified working
    over the axon remote-compile tunnel (round 5 probe: 2.06 s cold,
    0.22 s warm for a 24-matmul jit).
    """
    global _COMPILE_CACHE_ENABLED
    if _COMPILE_CACHE_ENABLED:
        return
    cache_dir = os.environ.get(
        "VLLM_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/vllm_quick_tpu/xla"))
    if not cache_dir:
        return
    try:
        import jax
        if jax.default_backend() == "cpu":
            # XLA:CPU AOT cache entries are machine-feature-pinned and
            # reloading them across toolchain settings risks SIGILL
            # (observed "+prefer-no-scatter not supported on the host"
            # loading a cached CPU executable); the cache only pays on
            # the tunneled TPU anyway.
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: even sub-second entries matter when each
        # serving bucket otherwise recompiles per process.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        _COMPILE_CACHE_ENABLED = True
    except Exception as e:  # pragma: no cover - best effort
        from vllm_quick_tpu.logger import init_logger
        init_logger(__name__).warning(
            "persistent compilation cache unavailable: %s", e)


def call_step_with_compile_retry(fn, *args, **kwargs):
    """Invoke a jitted step, retrying transient REMOTE-COMPILE failures.

    On remote-attached TPU rigs (axon tunnel) the out-of-process compile
    helper occasionally 500s under load; the failure surfaces as a
    JaxRuntimeError on the first dispatch of a new bucket shape and
    killed a round-4 serving sweep mid-run. Compilation is idempotent
    and donation only consumes inputs at *execution*, so retrying the
    identical call is safe. Persistent failures re-raise on the third
    attempt."""
    import time as _time

    import jax

    for attempt in range(3):
        try:
            return fn(*args, **kwargs)
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover
            msg = str(e)
            transient = ("remote_compile" in msg
                         or "tpu_compile_helper" in msg)
            if not transient or attempt == 2:
                raise
            from vllm_quick_tpu.logger import init_logger
            init_logger(__name__).warning(
                "Transient remote-compile failure (attempt %d); "
                "retrying: %s", attempt + 1, msg.splitlines()[0])
            _time.sleep(2.0 * (attempt + 1))
