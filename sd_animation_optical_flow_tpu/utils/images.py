"""Host<->device image conversions and PNG IO.

The pipelines keep the reference's external contracts (BGR uint8 frames
from cv2, `converted_%06d.png` outputs, README.md:37-40) while the
device side works in NHWC float [-1, 1] RGB.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def bgr_u8_to_model(img_bgr: np.ndarray) -> jnp.ndarray:
    """[H, W, 3] BGR uint8 -> [1, H, W, 3] RGB float32 in [-1, 1].

    Uploads the uint8 bytes and converts on-device (4x less traffic on
    the ~80MB/s axon link than shipping f32)."""
    d = jnp.asarray(img_bgr)
    return (d[..., ::-1].astype(jnp.float32) / 127.5 - 1.0)[None]


def model_to_bgr_u8(img) -> np.ndarray:
    """[1, H, W, 3] RGB [-1, 1] -> [H, W, 3] BGR uint8."""
    arr = np.asarray(img[0])
    arr = np.clip(arr * 127.5 + 127.5, 0, 255).astype(np.uint8)
    return arr[..., ::-1]


def rgb_u8(img) -> np.ndarray:
    arr = np.asarray(img[0]) if img.ndim == 4 else np.asarray(img)
    return np.clip(arr * 127.5 + 127.5, 0, 255).astype(np.uint8)


def bgr_f32d_to_model(img_bgr_d) -> jnp.ndarray:
    """Device [H, W, 3] BGR float 0..255 -> [1, H, W, 3] RGB [-1, 1]
    without leaving the device (streaming pixel pipeline)."""
    return (img_bgr_d[..., ::-1] / 127.5 - 1.0)[None]


def model_to_bgr_f32d(img) -> jnp.ndarray:
    """Device [1, H, W, 3] RGB [-1, 1] -> [H, W, 3] BGR float 0..255,
    still on device."""
    return jnp.clip(img[0] * 127.5 + 127.5, 0.0, 255.0)[..., ::-1]


def bgr_f32_to_u8(img_bgr_d) -> np.ndarray:
    """Pull a device BGR float frame to a host uint8 image (the single
    host sync per streamed frame). The clip + truncating cast happens
    ON DEVICE so the link carries uint8 (4x less traffic on the ~80MB/s
    axon tunnel); jnp.floor reproduces numpy's astype(uint8) truncation
    bit-for-bit for the non-negative clipped range."""
    img_bgr_d = jnp.asarray(img_bgr_d)
    if img_bgr_d.dtype == jnp.uint8:
        return np.asarray(img_bgr_d)
    u8 = jnp.floor(jnp.clip(img_bgr_d, 0, 255)).astype(jnp.uint8)
    return np.asarray(u8)


def write_png(path: str, img_bgr: np.ndarray):
    import cv2
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, img_bgr)


class PngWriter:
    """Write-behind PNG writer: cv2.imwrite (which releases the GIL for
    the zlib encode + disk IO) runs on worker threads so PNG output
    overlaps device compute — the output-side analog of the native
    frame pipe's input read-behind (native/framepipe.py). The reference
    writes PNGs inline between GPU stages (ofgen_pixel_inpaint.py:356).

    ``close()`` drains the queue and re-raises the first worker error;
    callers must close (or use as a context manager) before treating
    the output directory as complete."""

    def __init__(self, workers: int = 2):
        from concurrent.futures import ThreadPoolExecutor
        self._ex = ThreadPoolExecutor(max_workers=workers,
                                      thread_name_prefix="pngw")
        self._futs = []

    def submit(self, path: str, img_bgr: np.ndarray):
        self._futs.append(self._ex.submit(write_png, path, img_bgr))

    def close(self):
        futs, self._futs = self._futs, []
        try:
            for f in futs:
                f.result()
        finally:
            self._ex.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_png_bgr(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img
