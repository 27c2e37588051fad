"""Native (C++) host-pipeline components, loaded via ctypes.

Builds svpc_native.so from packer.cpp on first import (g++ -O3); every
entry point has a pure-numpy fallback, so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "svpc_native.so")
_SRC = os.path.join(_DIR, "packer.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native packer build failed (%s); using numpy fallback", e)
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.warning("native packer load failed: %s", e)
            return None
        lib.svpc_pack_video.restype = ctypes.c_int
        lib.svpc_pack_video.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,  # expected_d: caller buffer row width
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.svpc_npy_rows.restype = ctypes.c_int64
        lib.svpc_npy_rows.argtypes = [ctypes.c_char_p]
        lib.svpc_mmap_cache_clear.restype = None
        lib.svpc_mmap_cache_clear.argtypes = []
        lib.svpc_mmap_cache_enable.restype = None
        lib.svpc_mmap_cache_enable.argtypes = [ctypes.c_int]
        _lib = lib
        return _lib


def pack_video_native(resnet_path: str, bn_path: str, timestamps,
                      frm2sec: float, max_v_len: int, total_len: int,
                      feature_size: int, n_threads: int = 2):
    """(n_clips, total_len, feature_size) f32 buffer + per-clip valid
    lengths, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ts = np.ascontiguousarray(timestamps, dtype=np.float64)
    n_clips = ts.shape[0]
    out = np.zeros((n_clips, total_len, feature_size), dtype=np.float32)
    valid = np.zeros((n_clips,), dtype=np.int64)
    rc = lib.svpc_pack_video(
        resnet_path.encode(), bn_path.encode(),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n_clips), ctypes.c_double(frm2sec),
        ctypes.c_int64(max_v_len), ctypes.c_int64(total_len),
        ctypes.c_int64(feature_size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n_threads))
    _raise_pack_error(rc, resnet_path, total_len, feature_size)
    if rc != 0:
        return None
    return out, valid


def _raise_pack_error(rc: int, resnet_path: str, total_len: int,
                      feature_size: int) -> None:
    if rc == -3:
        raise ValueError(
            f"{resnet_path}: clip span exceeds the buffer's "
            f"total_len={total_len} — feature file replaced on disk after "
            f"valid lengths were computed?  Re-validate via "
            f"FeatureStore.invalidate()")
    if rc == -4:
        raise ValueError(
            f"{resnet_path}: resnet+bn feature dims on disk do not sum to "
            f"the model's video_feature_size={feature_size} — wrong "
            f"dataset's features, or a file replaced after validation")


def mmap_cache_clear() -> None:
    """Drop the packer's persistent file mappings (waits for in-flight
    packs).  Mappings rebuild lazily; use under memory pressure or after
    replacing feature files on disk.  NOTE: python-side caches
    (FeatureStore._rows/_cache) are separate — after replacing files call
    ``FeatureStore.invalidate()``, which clears both layers."""
    lib = get_lib()
    if lib is not None:
        lib.svpc_mmap_cache_clear()


def mmap_cache_enable(on: bool) -> None:
    """Toggle the persistent mmap cache (on by default)."""
    lib = get_lib()
    if lib is not None:
        lib.svpc_mmap_cache_enable(1 if on else 0)


def pack_video_into(resnet_path: str, bn_path: str, timestamps,
                    frm2sec: float, max_v_len: int,
                    out: np.ndarray, lo: int, n_threads: int = 2):
    """Fill ``out[lo:lo+n_clips]`` in place — the zero-extra-copy path of
    the lazy pipeline: feature bytes move exactly once, mmap -> the final
    batch buffer.

    ``out`` must be a zero-initialized C-contiguous float32 array of shape
    (N, total_len, D) with N >= lo + n_clips; ``total_len`` (the bucketed
    video span) is read off the buffer.  Returns the per-clip valid
    lengths, or None if the native library is unavailable or errors.
    """
    lib = get_lib()
    if lib is None:
        return None
    ts = np.ascontiguousarray(timestamps, dtype=np.float64)
    n_clips = ts.shape[0]
    N, total_len, feature_size = out.shape
    assert out.dtype == np.float32 and out.flags.c_contiguous
    assert 0 <= lo and lo + n_clips <= N, (lo, n_clips, N)
    valid = np.zeros((n_clips,), dtype=np.int64)
    base = out.ctypes.data + lo * total_len * feature_size * 4
    rc = lib.svpc_pack_video(
        resnet_path.encode(), bn_path.encode(),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n_clips), ctypes.c_double(frm2sec),
        ctypes.c_int64(max_v_len), ctypes.c_int64(total_len),
        ctypes.c_int64(feature_size),
        ctypes.cast(base, ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n_threads))
    _raise_pack_error(rc, resnet_path, total_len, feature_size)
    if rc != 0:
        return None
    return valid
