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


def _bcast_with_watchdog(fn):
    """Run a blocking collective in a daemon thread; raise
    :class:`HostDeadError` if it has not completed within
    $VLLM_TPU_BROADCAST_TIMEOUT_S (default 600 — first-bucket XLA
    compiles on a peer legitimately delay its arrival by minutes)."""
    import os
    import threading

    timeout = float(os.environ.get("VLLM_TPU_BROADCAST_TIMEOUT_S",
                                   "600"))
    result: list = []
    err: list = []

    def run():
        try:
            result.append(fn())
        except BaseException as e:  # noqa: BLE001 - re-raised below
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        raise HostDeadError(
            f"per-step broadcast did not complete within {timeout:.0f}s "
            "— a peer host is dead or wedged (fail-fast; raise "
            "VLLM_TPU_BROADCAST_TIMEOUT_S if peers legitimately "
            "compile for longer)")
    if err:
        # A failed step broadcast is always fatal to the engine;
        # surface peer-death signatures (gloo "Connection closed by
        # peer", coordination-service heartbeat timeouts) as the
        # typed error the engine's fail-fast path expects.
        msg = str(err[0])
        if any(s in msg for s in ("Connection closed by peer",
                                  "heartbeat timeout", "Gloo",
                                  "UNAVAILABLE")):
            raise HostDeadError(msg) from err[0]
        raise err[0]
    return result[0]


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
    buf = _bcast_with_watchdog(
        lambda: multihost_utils.broadcast_one_to_all(buf, is_source=src))
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
