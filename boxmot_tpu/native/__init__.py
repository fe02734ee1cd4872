"""Native (C++) host runtime: cache IO and frame packing via ctypes.

Mirror of the reference native layer's role
(boxmot/native/_common.py:58-120 on-demand CMake build with a
cross-process lock; boxmot/native/cpp/trackers/base io.cpp): the tracker
math runs on TPU, but the single-core host's cache IO and ragged->padded
packing benefit from native code.  Falls back to the numpy
implementations transparently when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import fcntl
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_CPP_DIR = _REPO_ROOT / "native" / "cpp"
_BUILD_DIR = _CPP_DIR / "build"
_LIB = None
_TRIED = False


def _sources_mtime() -> float:
    """Newest mtime across the C++ sources (stale-build detection)."""
    newest = 0.0
    for pattern in ("src/*.cpp", "src/*.hpp", "CMakeLists.txt"):
        for p in _CPP_DIR.glob(pattern):
            newest = max(newest, p.stat().st_mtime)
    return newest


def _build_library() -> Path | None:
    lib = _BUILD_DIR / "libboxmot_native.so"
    if lib.exists() and lib.stat().st_mtime >= _sources_mtime():
        return lib
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    lock_path = _BUILD_DIR / ".build.lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)  # cross-process build lock
        if lib.exists() and lib.stat().st_mtime >= _sources_mtime():
            return lib
        try:
            subprocess.run(
                ["cmake", "-S", str(_CPP_DIR), "-B", str(_BUILD_DIR)],
                check=True,
                capture_output=True,
            )
            subprocess.run(
                ["cmake", "--build", str(_BUILD_DIR), "--config", "Release", "-j"],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return lib if lib.exists() else None


def get_library():
    """Load (building on demand) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("BOXMOT_TPU_NO_NATIVE"):
        return None
    path = _build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.bmt_version.restype = ctypes.c_char_p
    lib.bmt_last_error.restype = ctypes.c_char_p
    lib.bmt_read_npy_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.bmt_write_npy_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.bmt_append_npy_f32.argtypes = lib.bmt_write_npy_f32.argtypes
    lib.bmt_pack_frames_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.bmt_write_mot.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.bmt_lapjv.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return _LIB


def _f32p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_available() -> bool:
    return get_library() is not None


def read_npy(path) -> np.ndarray | None:
    lib = get_library()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.bmt_read_npy_f32(str(path).encode(), ctypes.byref(data), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(lib.bmt_last_error().decode())
    try:
        out = np.ctypeslib.as_array(data, shape=(rows.value, cols.value)).copy()
    finally:
        lib.bmt_free(data)
    return out


def write_npy(path, arr: np.ndarray):
    lib = get_library()
    arr = np.ascontiguousarray(arr, np.float32)
    if lib is None:
        np.save(path, arr)
        return
    rc = lib.bmt_write_npy_f32(str(path).encode(), _f32p(arr), arr.shape[0], arr.shape[1])
    if rc != 0:
        raise IOError(lib.bmt_last_error().decode())


def append_npy(path, arr: np.ndarray):
    lib = get_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr = np.ascontiguousarray(arr, np.float32)
    rc = lib.bmt_append_npy_f32(str(path).encode(), _f32p(arr), arr.shape[0], arr.shape[1])
    if rc != 0:
        raise IOError(lib.bmt_last_error().decode())


def pack_frames_native(rows: np.ndarray, n_frames: int, max_dets: int, box_cols: int = 4):
    """(N, 1+box+2) [frame, box..., conf, cls] rows -> (F, D, box+3) padded."""
    lib = get_library()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.float32)
    out = np.empty((n_frames, max_dets, box_cols + 3), np.float32)
    rc = lib.bmt_pack_frames_f32(
        _f32p(rows), rows.shape[0], rows.shape[1], n_frames, max_dets, box_cols, _f32p(out)
    )
    if rc != 0:
        raise ValueError(lib.bmt_last_error().decode())
    return out


def write_mot_native(path, rows: np.ndarray) -> bool:
    lib = get_library()
    if lib is None:
        return False
    rows = np.ascontiguousarray(rows, np.float64).reshape(-1, 9)
    rc = lib.bmt_write_mot(str(path).encode(), rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), rows.shape[0])
    if rc != 0:
        raise IOError(lib.bmt_last_error().decode())
    return True


def lapjv_native(cost: np.ndarray, limit: float) -> np.ndarray | None:
    """Exact JV assignment with cost-limit semantics (bmt_lapjv).

    Returns r2c (n,) int32 with -1 for unassigned, or None when the
    native library is unavailable.
    """
    lib = get_library()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    r2c = np.full(n, -1, np.int32)
    if n == 0:
        return r2c
    rc = lib.bmt_lapjv(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        m,
        float(limit),
        r2c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return r2c
