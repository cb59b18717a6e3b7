"""Host memory staging for model init / checkpoint ports.

This environment (and microVM-snapshot hosts generally) services
first-touch page faults on *private* anonymous memory extremely slowly
(~10-70 MB/s measured), while *shared* anonymous mappings fault at
full memcpy speed (>20 GB/s). glibc additionally mmap/munmaps every
large allocation (default M_MMAP_THRESHOLD = 128 KiB), so each big
numpy temporary re-pays the fault cost instead of reusing warm pages.
Together these made a full SD-1.5 UNet host init + bf16 cast take
minutes (measured 104s init + 176s cast); with the two fixes below the
same work is ~2s of RNG + ~0.5s of cast per GB.

Two independent mitigations:

* ``tune_host_allocator()`` — raise glibc's mmap/trim thresholds via
  ``mallopt`` so freed large blocks stay on the heap and later
  allocations reuse already-faulted pages. Called at package import
  (opt out with ``SDAOF_NO_MALLOC_TUNE=1``).
* ``shared_empty(shape, dtype)`` — a numpy array backed by a shared
  anonymous ``mmap``, for large *staging* buffers (weight init, dtype
  casts, checkpoint ports) that are written once and shipped to the
  device with ``jax.device_put``.
"""

from __future__ import annotations

import ctypes
import mmap
import os
import sys

import numpy as np

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_TUNED = False


def tune_host_allocator() -> bool:
    """Raise glibc's M_MMAP_THRESHOLD / M_TRIM_THRESHOLD to 1 GiB so
    large numpy temporaries reuse warm heap pages. Idempotent; returns
    True when the knobs were applied."""
    global _TUNED
    if _TUNED:
        return True
    if os.environ.get("SDAOF_NO_MALLOC_TUNE") == "1":
        return False
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30))
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)) and ok
        _TUNED = ok
        return ok
    except Exception:      # non-glibc libc; nothing to tune
        return False


def shared_empty(shape, dtype) -> np.ndarray:
    """Uninitialized numpy array backed by shared anonymous memory.

    First-touch writes run at memcpy speed on hosts where private
    anonymous faults are slow (microVM snapshot/balloon paging). Use
    for large write-once staging buffers; the array is page-aligned
    and otherwise a perfectly ordinary numpy array.
    """
    if np.isscalar(shape):
        shape = (int(shape),)
    shape = tuple(int(s) for s in shape)
    dt = np.dtype(dtype)
    nbytes = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
    if nbytes == 0:
        return np.empty(shape, dt)
    buf = mmap.mmap(-1, nbytes)
    return np.frombuffer(buf, dtype=dt).reshape(shape)
