"""ctypes bindings for the native host-IO library (nl_vsgg_tpu/native/io.cpp).

Builds the shared object on first use with g++ (no pybind11 in this
environment); falls back to pure-numpy implementations when a compiler is
unavailable so the framework never hard-depends on the native path
(config flag `use_native_io`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRCS = [os.path.join(_NATIVE_DIR, "io.cpp"),
         os.path.join(_NATIVE_DIR, "grounding.cpp")]
_SO = os.path.join(_NATIVE_DIR, "libnlvsgg_io.so")
_lock = threading.Lock()
_lib = None
_build_failed = False

_F32 = ctypes.POINTER(ctypes.c_float)
_I64 = ctypes.POINTER(ctypes.c_int64)
_I32 = ctypes.POINTER(ctypes.c_int32)
_U8 = ctypes.POINTER(ctypes.c_uint8)


def _build() -> bool:
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", *_SRCS, "-o", _SO],
                       check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    """The loaded shared library, building it if needed; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.isfile(_SO) or any(
                os.path.getmtime(_SO) < os.path.getmtime(s) for s in _SRCS):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.read_npy_batch_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
            _F32, _I64, _I64, _I64, ctypes.c_int]
        lib.pack_padded_f32.argtypes = [
            _F32, _I64, ctypes.c_int, ctypes.c_int64, ctypes.c_int64, _F32]
        lib.pyset_intersect_order.argtypes = [
            _I64, ctypes.c_int, _I64, ctypes.c_int, _I64]
        lib.pyset_intersect_order.restype = ctypes.c_int
        lib.ground_pack.argtypes = [
            ctypes.c_int, ctypes.c_int, _F32, _I64,      # F, D, dets, counts
            _F32, ctypes.c_int, _I64, ctypes.c_int,      # feats, stride, counts, dim
            _I32, _I64, _F32, _F32, _F32,                # gt cls/off/att/sp/con
            _U8, ctypes.c_int,                           # person lut
            _I32, _I32, ctypes.c_int, ctypes.c_int,      # oi2ag, cnt, n_oi, fan
            ctypes.c_int, ctypes.c_int,                  # is_train, pseudo_way
            ctypes.c_int, ctypes.c_int,                  # BB, BR
            _F32, _I32, _U8, _I32, _F32, _F32, _F32,     # box-side outputs
            _I32, _I32, _U8, _F32, _F32, _F32,           # rel-side outputs
            _I64]                                        # out_counts
        lib.ground_pack.restype = ctypes.c_int
        _lib = lib
        return _lib


def _i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.int64)


def read_feat_batch(paths: list[str], cols: int, max_rows_each: int,
                    n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Parallel-read float32 .npy files into one (n, max_rows_each, cols)
    padded array; returns (array, counts). Pure-numpy fallback when the
    native library is unavailable."""
    n = len(paths)

    def warn_truncated(true_counts):
        over = true_counts > max_rows_each
        if over.any():
            import warnings
            warnings.warn(
                f"{int(over.sum())} npy file(s) exceed max_rows={max_rows_each} "
                f"(largest {int(true_counts.max())} rows); extra rows DROPPED "
                f"(e.g. {paths[int(np.argmax(true_counts))]})")

    lib = get_lib()
    if lib is None:
        out = np.zeros((n, max_rows_each, cols), np.float32)
        counts = np.zeros(n, np.int64)
        true_counts = np.zeros(n, np.int64)
        for i, p in enumerate(paths):
            a = np.load(p)
            a = a.reshape(len(a), -1)
            true_counts[i] = len(a)
            a = a[:max_rows_each]
            out[i, :len(a)] = a
            counts[i] = len(a)
        warn_truncated(true_counts)
        return out, counts

    out = np.zeros((n, max_rows_each, cols), np.float32)
    counts = np.zeros(n, np.int64)
    offsets = _i64(np.arange(n) * max_rows_each)
    max_rows = _i64(np.full(n, max_rows_each))
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    lib.read_npy_batch_f32(
        blob, n, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads)
    if (counts < 0).any():
        bad = [paths[i] for i in np.where(counts < 0)[0]]
        raise IOError(f"native npy read failed for {bad[:3]}...")
    # the native reader returns TRUE file row counts; rows past max_rows_each
    # were not read — warn like the pickle path does, then clamp
    warn_truncated(counts)
    return out, np.minimum(counts, max_rows_each)


def pack_padded(src: np.ndarray, row_counts: np.ndarray,
                bucket_rows: int) -> np.ndarray:
    """(total_rows, cols) ragged-concatenated rows -> (n_seg, bucket, cols)."""
    src = np.ascontiguousarray(src, np.float32)
    counts = _i64(row_counts)
    n_seg = len(counts)
    cols = src.shape[1]
    dst = np.zeros((n_seg, bucket_rows, cols), np.float32)
    lib = get_lib()
    if lib is None:
        off = 0
        for s, c in enumerate(counts):
            keep = min(int(c), bucket_rows)
            dst[s, :keep] = src[off:off + keep]
            off += int(c)
        return dst
    lib.pack_padded_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_seg, cols, bucket_rows,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst
