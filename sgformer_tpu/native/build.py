"""Lazy g++ build + ctypes loader for the native graph kernels."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _source_path() -> str:
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    return os.path.join(pkg_root, "csrc", "graph_kernels.cpp")


def _cache_path() -> str:
    return os.path.join(
        os.path.dirname(__file__), "_graph_kernels.so"
    )


def _compile() -> Optional[str]:
    src = _source_path()
    if not os.path.exists(src):
        return None
    out = _cache_path()
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    tmp = tempfile.mktemp(suffix=".so", dir=os.path.dirname(out))
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return out
    except (subprocess.SubprocessError, OSError):
        if os.path.exists(tmp):
            os.unlink(tmp)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _compile()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64, i32, f32, u64 = (
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.c_uint64,
        )
        P = ctypes.POINTER
        lib.count_chunks.restype = i64
        lib.count_chunks.argtypes = [P(i64), i64, i64, i64]
        lib.fill_chunks.restype = None
        lib.fill_chunks.argtypes = [
            P(i64), P(i32), P(i32), P(f32), i64, i64, i64,
            P(i32), P(i32), P(f32), P(i32),
        ]
        lib.sample_neighbors.restype = i64
        lib.sample_neighbors.argtypes = [
            P(i64), P(i64), P(i64), i64, i64, u64, P(i64), P(i64),
        ]
        lib.sample_batch.restype = i64
        lib.sample_batch.argtypes = [
            P(i64), P(i64), P(i64), i64, P(i64), i64, i64, i64, u64,
            P(i64), P(i32), P(i32), P(f32), P(f32), P(i64),
        ]
        lib.lpa_cluster.restype = i64
        lib.lpa_cluster.argtypes = [
            P(i64), P(i64), i64, i64, i64, i64, u64, P(i64),
        ]
        lib.cluster_pack.restype = None
        lib.cluster_pack.argtypes = [P(i64), i64, i64, P(i64)]
        lib.fill_chunks_sorted.restype = None
        lib.fill_chunks_sorted.argtypes = [
            P(i64), P(i32), P(i32), P(f32), i64, i64, i64,
            P(i32), P(i32), P(f32), P(i32),
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None
