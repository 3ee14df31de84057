"""Multi-host serving coordination.

The reference drives TP followers with Ray RPC + NCCL
``broadcast_tensor_dict`` (vllm/model_executor/parallel_utils/
communication_op.py:143-203, worker.py:191-226). The TPU-native
equivalent (SURVEY §2.6/§7): JAX is SPMD — every host runs the same
engine loop over its slice of the global mesh, host 0 owns the
scheduler, and the per-step batch metadata (token ids, positions, slot
mappings, block tables) is broadcast host-0 -> all with
``multihost_utils.broadcast_one_to_all`` before every jitted step. The
data plane needs no plumbing at all: the step is jitted over the global
mesh and XLA routes collectives over ICI within a slice and DCN across
slices.

Single-process (tests, one host) every call here is a no-op, so the
engine code path is identical from 1 chip to a pod slice.
"""
from typing import Any, Dict, Optional

import jax
import numpy as np

from vllm_quick_tpu.logger import init_logger

logger = init_logger(__name__)


def is_multihost() -> bool:
    return jax.process_count() > 1


def is_driver() -> bool:
    """Host 0 owns the tokenizer, scheduler and detokenization —
    the analogue of the reference's driver worker."""
    return jax.process_index() == 0


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (call once per host
    before any jax op; the analogue of init_distributed_environment,
    worker.py:238)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("Multihost initialized: process %d / %d",
                jax.process_index(), jax.process_count())


# Broadcast buffers are padded to these byte sizes so each distinct
# payload size does not recompile the underlying collective.
_BYTE_BUCKETS = tuple(1 << p for p in range(10, 27))


def _byte_bucket(n: int) -> int:
    for b in _BYTE_BUCKETS:
        if n <= b:
            return b
    return -(-n // _BYTE_BUCKETS[-1]) * _BYTE_BUCKETS[-1]


class HostDeadError(RuntimeError):
    """A peer host stopped participating in the per-step broadcast.

    The fail-fast contract (SURVEY §5 failure detection; reference
    AsyncEngineDeadError, async_llm_engine.py:19-38): a dead
    follower/driver must surface as an engine-killing error, never a
    silent hang. Gloo collectives block FOREVER on a dead peer (the
    coordination service notices the heartbeat loss but the op does
    not), so the broadcast runs under a watchdog."""


# Deadline monitor state: [deadline_epoch_s or None]. One daemon
# thread per process wakes every 2 s and hard-exits (os._exit) if a
# broadcast has been blocked past its deadline — the backstop for the
# (rare) case where gloo neither errors nor returns. The collective
# itself MUST run on the caller thread: issuing collectives from a
# helper thread while jitted-step collectives dispatch from the main
# thread desyncs gloo's transfer matching ("op.preamble.length <=
# op.nbytes. 2048 vs 4" — the r5 regression from the first watchdog,
# reproduced with both per-call threads and a dedicated executor).
_MON_STATE: list = [None]
_MON_THREAD = None
_HANG_EXIT_CODE = 70


def _ensure_monitor():
    global _MON_THREAD
    if _MON_THREAD is not None:
        return
    import threading
    import time as _time

    def run():
        import os as _osm
        while True:
            _time.sleep(2.0)
            dl = _MON_STATE[0]
            if dl is not None and _time.monotonic() > dl:
                logger.critical(
                    "per-step broadcast blocked past its deadline — a "
                    "peer host is dead or wedged; exiting (fail-fast)")
                _osm._exit(_HANG_EXIT_CODE)

    _MON_THREAD = threading.Thread(target=run, daemon=True,
                                   name="bcast-hang-monitor")
    _MON_THREAD.start()


def _bcast_with_watchdog(fn):
    """Run a blocking collective on the CALLER thread under a deadline
    monitor. Peer-death almost always surfaces as a gloo/coordination
    error on the blocked call ("Connection closed/reset by peer",
    heartbeat timeout) and is re-raised as :class:`HostDeadError`; if
    the call truly hangs past $VLLM_TPU_BROADCAST_TIMEOUT_S (default
    600 — first-bucket XLA compiles on a peer legitimately delay its
    arrival by minutes), the monitor thread hard-exits the process
    (fail-fast: a wedged driver must die, not hang the cluster)."""
    import os
    import time as _time

    timeout = float(os.environ.get("VLLM_TPU_BROADCAST_TIMEOUT_S",
                                   "600"))
    _ensure_monitor()
    _MON_STATE[0] = _time.monotonic() + timeout
    try:
        return fn()
    except HostDeadError:
        raise
    except BaseException as e:  # noqa: BLE001 - classified below
        # A failed step broadcast is always fatal to the engine;
        # surface peer-death signatures (gloo "Connection closed by
        # peer", coordination-service heartbeat timeouts) as the
        # typed error the engine's fail-fast path expects.
        msg = str(e)
        if any(s in msg for s in ("Connection closed by peer",
                                  "Connection reset by peer",
                                  "heartbeat timeout", "Gloo", "gloo",
                                  "UNAVAILABLE")):
            raise HostDeadError(msg) from e
        raise
    finally:
        _MON_STATE[0] = None


def broadcast_payload(payload: Optional[Any]) -> Any:
    """Broadcast an arbitrary picklable object host-0 -> all hosts.
    Followers pass ``None`` and receive the driver's object.

    ``multihost_utils.broadcast_one_to_all`` needs a structure-matching
    pytree on every host, which followers cannot know ahead of time, so
    the payload travels as pickled bytes: one fixed-shape length
    broadcast, then one bucket-padded uint8 broadcast. This is the
    TPU-native analogue of the reference's metadata-then-tensors
    broadcast_tensor_dict (communication_op.py:143-203).
    """
    if not is_multihost():
        assert payload is not None
        return payload
    import pickle

    from jax.experimental import multihost_utils
    src = is_driver()
    blob = b""
    if src:
        blob = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
    n = int(_bcast_with_watchdog(lambda: multihost_utils
                                 .broadcast_one_to_all(
                                     np.int64(len(blob)), is_source=src)))
    buf = np.zeros(_byte_bucket(n), np.uint8)
    if src:
        buf[:n] = np.frombuffer(blob, np.uint8)
    # block_until_ready INSIDE the watchdog call: the source side
    # otherwise discards the result, leaving the collective in flight
    # when the caller dispatches the next jitted step from another
    # thread — two uncompleted collective programs racing into the
    # backend out of order is the r5 "op.preamble.length 2048 vs 4"
    # gloo desync.
    buf = _bcast_with_watchdog(
        lambda: jax.block_until_ready(
            multihost_utils.broadcast_one_to_all(buf, is_source=src)))
    if src:
        return payload
    return pickle.loads(buf[:n].tobytes())


def broadcast_step_inputs(inputs: Optional[Dict[str, Any]]
                          ) -> Dict[str, Any]:
    """Back-compat alias for step-input dicts (see broadcast_payload)."""
    return broadcast_payload(inputs)


def sync_global_devices(tag: str) -> None:
    """Barrier across hosts (used at init boundaries, e.g. after cache
    profiling so every host sizes the same block pool)."""
    if not is_multihost():
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def agree_num_blocks(local_num_blocks: int) -> int:
    """Minimum across hosts — every host must size the identical pool
    (the analogue of llm_engine.py:334 min over workers)."""
    if not is_multihost():
        return local_num_blocks
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(
        np.asarray([local_num_blocks]))
    return int(np.min(vals))
