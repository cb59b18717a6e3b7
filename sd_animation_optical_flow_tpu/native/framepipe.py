"""ctypes binding for the native frame pipeline (frameloader.cpp).

Builds the shared library on first use (g++, cached beside the source)
and exposes ``FramePipe``. Falls back to a pure-Python implementation
with the same API when no compiler is available, so pipelines never
hard-depend on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "frameloader.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libframeloader.so")
_LOCK = threading.Lock()
_CDLL: Optional[ctypes.CDLL] = None


def _build() -> Optional[ctypes.CDLL]:
    global _CDLL
    with _LOCK:
        if _CDLL is not None:
            return _CDLL
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC, "-o", _LIB],
                    check=True, capture_output=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.fp_open.restype = ctypes.c_void_p
        lib.fp_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                ctypes.c_long, ctypes.c_int]
        lib.fp_get.restype = ctypes.c_int
        lib.fp_get.argtypes = [ctypes.c_void_p, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_uint8)]
        lib.fp_put.restype = ctypes.c_int
        lib.fp_put.argtypes = [ctypes.c_void_p, ctypes.c_int,
                               ctypes.POINTER(ctypes.c_uint8)]
        lib.fp_flush.argtypes = [ctypes.c_void_p]
        lib.fp_stats.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_long),
                                 ctypes.POINTER(ctypes.c_long),
                                 ctypes.POINTER(ctypes.c_long)]
        lib.fp_close.argtypes = [ctypes.c_void_p]
        _CDLL = lib
        return lib


class FramePipe:
    """Raw-frame streaming over <dir>/<idx:05d>.raw blobs."""

    def __init__(self, directory: str, num_frames: int, shape,
                 prefetch: int = 8):
        self.dir = directory
        self.num_frames = num_frames
        self.shape = tuple(shape)
        self.nbytes = int(np.prod(self.shape))
        os.makedirs(directory, exist_ok=True)
        self._lib = _build()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.fp_open(
                directory.encode(), num_frames, self.nbytes, prefetch)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def get(self, idx: int) -> np.ndarray:
        out = np.empty(self.shape, np.uint8)
        if self.native:
            rc = self._lib.fp_get(
                self._handle, idx,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if rc != 0:
                raise FileNotFoundError(
                    f"frame {idx} missing in {self.dir} (rc={rc})")
            return out
        path = os.path.join(self.dir, f"{idx:05d}.raw")
        return np.fromfile(path, np.uint8).reshape(self.shape)

    def put(self, idx: int, frame: np.ndarray):
        frame = np.ascontiguousarray(frame, np.uint8)
        assert frame.nbytes == self.nbytes, (frame.shape, self.shape)
        if self.native:
            self._lib.fp_put(
                self._handle, idx,
                frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        else:
            frame.tofile(os.path.join(self.dir, f"{idx:05d}.raw"))

    def flush(self):
        if self.native:
            self._lib.fp_flush(self._handle)

    def stats(self):
        if not self.native:
            return {"reads": -1, "writes": -1, "cache_hits": -1}
        r = ctypes.c_long()
        w = ctypes.c_long()
        h = ctypes.c_long()
        self._lib.fp_stats(self._handle, ctypes.byref(r), ctypes.byref(w),
                           ctypes.byref(h))
        return {"reads": r.value, "writes": w.value, "cache_hits": h.value}

    def close(self):
        if self.native and self._handle is not None:
            self._lib.fp_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
