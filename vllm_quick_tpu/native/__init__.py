"""Native (C++) host-side data-plane helpers.

The reference keeps its load-time weight re-permutation in CUDA
(gptq_shuffle, q_gemm.cu:729-862); ours is host-side: csrc/repack.cpp
implements the AWQ/GPTQ nibble unpack and i8pair superblock pack with
OpenMP. Compiled on first use with the system g++ and cached; every
entry point falls back to numpy when no toolchain is available, so the
package stays importable anywhere.
"""
import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from vllm_quick_tpu.logger import init_logger

logger = init_logger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "repack.cpp")
_CACHE_DIR = os.environ.get(
    "VLLM_TPU_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "vllm_quick_tpu"))


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
    out = os.path.join(_CACHE_DIR, "repack.so")
    src_mtime = os.path.getmtime(_SRC)
    if os.path.exists(out) and os.path.getmtime(out) >= src_mtime:
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native repack build failed (%s); using numpy "
                       "fallback", e)
        return None
    return out


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("VLLM_TPU_DISABLE_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i64 = ctypes.c_int64
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.awq_unpack.argtypes = [u32p, u8p, i64, i64]
    lib.gptq_unpack_axis0.argtypes = [u32p, u8p, i64, i64]
    lib.pack_i8pair.argtypes = [u8p, i8p, i64, i64]
    _LIB = lib
    logger.info("native repack library loaded from %s", path)
    return _LIB


def _u32(x: np.ndarray):
    return np.ascontiguousarray(x).view(np.uint32)


def awq_unpack(x: np.ndarray) -> Optional[np.ndarray]:
    """int32 [..., C] -> uint8 [..., C*8] (AWQ nibble order); None if
    no native library."""
    lib = _lib()
    if lib is None or x.ndim < 1:
        return None
    xs = _u32(x.reshape(-1, x.shape[-1]))
    rows, cols = xs.shape
    out = np.empty((rows, cols * 8), np.uint8)
    lib.awq_unpack(xs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                   rows, cols)
    return out.reshape(*x.shape[:-1], x.shape[-1] * 8)


def gptq_unpack_axis0(x: np.ndarray) -> Optional[np.ndarray]:
    """int32 [R, C] -> uint8 [R*8, C] (sequential nibbles, LSB first)."""
    lib = _lib()
    if lib is None or x.ndim != 2:
        return None
    xs = _u32(x)
    rows, cols = xs.shape
    out = np.empty((rows * 8, cols), np.uint8)
    lib.gptq_unpack_axis0(
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), rows, cols)
    return out


def pack_i8pair(q: np.ndarray) -> Optional[np.ndarray]:
    """uint8-valued [K, N] (K % 256 == 0) -> int8 [K//2, N] superblock
    dual-half layout."""
    lib = _lib()
    if lib is None:
        return None
    qc = np.ascontiguousarray(q, dtype=np.uint8)
    k, n = qc.shape
    out = np.empty((k // 2, n), np.int8)
    lib.pack_i8pair(qc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                    k, n)
    return out
