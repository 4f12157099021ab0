"""ctypes bindings for the native host runtime (native/feeder.cpp).

Provides the reference's Channel semantics (``channel.h:11-56``) + the
per-scan packing hot path in C++, with a pure-Python fallback when the
shared library hasn't been built.  Build: ``make -C native`` (or it is
built on demand here if a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_repo_root(), "native", "libfeeder.so")
    if not os.path.exists(so):
        src = os.path.join(_repo_root(), "native", "feeder.cpp")
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", so, src],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.lego_pack_scan.restype = ctypes.c_int64
    lib.lego_channel_create.restype = ctypes.c_void_p
    lib.lego_channel_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.lego_channel_destroy.argtypes = [ctypes.c_void_p]
    lib.lego_channel_send.restype = ctypes.c_int
    lib.lego_channel_recv.restype = ctypes.c_int
    lib.lego_channel_close.argtypes = [ctypes.c_void_p]
    lib.lego_channel_size.restype = ctypes.c_int64
    lib.lego_channel_size.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def pack_scan_native(points: np.ndarray,
                     capacity: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """NaN-filter + pad to capacity.  Uses C++ when available."""
    pts = np.ascontiguousarray(points, np.float32)
    lib = _load()
    out_xyz = np.zeros((capacity, 3), np.float32)
    out_valid = np.zeros((capacity,), np.uint8)
    if lib is not None:
        n_valid = lib.lego_pack_scan(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(pts.shape[0]), ctypes.c_int64(capacity),
            out_xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out_xyz, out_valid.astype(bool), int(n_valid)
    # fallback
    finite = np.isfinite(pts).all(axis=-1)
    n = min(pts.shape[0], capacity)
    out_xyz[:n] = np.nan_to_num(pts[:n], nan=0.0, posinf=0.0, neginf=0.0)
    v = out_valid.astype(bool)
    v[:n] = finite[:n]
    return out_xyz, v, int(v.sum())


class ScanChannel:
    """Bounded blocking channel of packed scans — Channel<T> semantics
    (depth=1 ⇒ the reference's deterministic lock-step replay)."""

    def __init__(self, capacity_points: int, depth: int = 1):
        self.capacity = capacity_points
        self.depth = depth
        self._lib = _load()
        if self._lib is not None:
            self._h = ctypes.c_void_p(self._lib.lego_channel_create(
                ctypes.c_int64(capacity_points), ctypes.c_int64(depth)))
        else:
            import queue
            self._q = queue.Queue(maxsize=depth)
            self._closed = False

    def send(self, points: np.ndarray, stamp: float) -> bool:
        if self._lib is not None:
            pts = np.ascontiguousarray(points, np.float32)
            r = self._lib.lego_channel_send(
                self._h,
                pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_int64(pts.shape[0]), ctypes.c_double(stamp))
            return r == 0
        if self._closed:
            return False
        xyz, valid, _ = pack_scan_native(points, self.capacity)
        self._q.put((xyz, valid, stamp))
        return True

    def recv(self):
        """Returns (xyz (C,3), valid (C,), stamp) or None when closed."""
        if self._lib is not None:
            xyz = np.zeros((self.capacity, 3), np.float32)
            valid = np.zeros((self.capacity,), np.uint8)
            stamp = ctypes.c_double(0.0)
            r = self._lib.lego_channel_recv(
                self._h,
                xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(stamp))
            if r != 0:
                return None
            return xyz, valid.astype(bool), stamp.value
        try:
            item = self._q.get(timeout=0.1) if self._closed else self._q.get()
            return item
        except Exception:
            return None

    def close(self):
        if self._lib is not None:
            self._lib.lego_channel_close(self._h)
        else:
            self._closed = True

    def __del__(self):
        try:
            if self._lib is not None and self._h:
                self._lib.lego_channel_destroy(self._h)
        except Exception:
            pass
