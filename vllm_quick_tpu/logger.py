"""Logging for vllm-quick-tpu.

Capability parity with the reference's colored console logger
(reference: vllm/logger.py) without copying its formatter: we emit a
single-line structured format and honor ``VLLM_TPU_LOG_LEVEL``.
"""
import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%m-%d %H:%M:%S"

_root_configured = False


def _configure_root() -> None:
    global _root_configured
    if _root_configured:
        return
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATE_FORMAT))
    root = logging.getLogger("vllm_quick_tpu")
    root.setLevel(os.environ.get("VLLM_TPU_LOG_LEVEL", "INFO").upper())
    root.addHandler(handler)
    root.propagate = False
    _root_configured = True


def init_logger(name: str) -> logging.Logger:
    _configure_root()
    if not name.startswith("vllm_quick_tpu"):
        name = f"vllm_quick_tpu.{name}"
    return logging.getLogger(name)
