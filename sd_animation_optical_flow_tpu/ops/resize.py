"""cv2-parity image resizing as separable weight-matrix matmuls.

The reference leans on cv2.resize everywhere (INTER_AREA for frame prep,
ofgen_pixel_inpaint.py:298; INTER_CUBIC for latent/mask resizing,
guided_ldm_inpainting.py:225; INTER_LANCZOS4 in resize_keep_aspect,
ofgen_pixel_inpaint.py:27-32). On TPU a resize is two dense matmuls
(H-axis then W-axis weight matrices), which rides the MXU instead of
gather units. Weight matrices are built host-side with numpy per
(in, out, mode) and are constants under jit.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _clip_gather_weights(idx, w, size):
    """Accumulate out-of-range taps onto the clamped edge pixel
    (cv2 BORDER_REPLICATE semantics used by cv2.resize)."""
    out, taps = idx.shape
    mat = np.zeros((out, size), np.float64)
    np.add.at(mat, (np.repeat(np.arange(out), taps),
                    np.clip(idx, 0, size - 1).ravel()), w.ravel())
    return mat


def _cubic_weight(t, a=-0.75):
    t = np.abs(t)
    w = np.where(t <= 1, ((a + 2) * t - (a + 3)) * t * t + 1,
                 np.where(t < 2, ((a * t - 5 * a) * t + 8 * a) * t - 4 * a, 0))
    return w


def _lanczos_weight(t, taps=4):
    t = np.asarray(t, np.float64)
    w = np.sinc(t) * np.sinc(t / taps)
    return np.where(np.abs(t) < taps, w, 0.0)


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """[out_size, in_size] row-stochastic resize weights for one axis."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5

    if mode == "nearest":
        idx = np.clip(np.floor((dst + 0.5) * scale).astype(int), 0,
                      in_size - 1)
        mat = np.zeros((out_size, in_size))
        mat[np.arange(out_size), idx] = 1.0
    elif mode == "linear":
        i0 = np.floor(src).astype(int)
        f = src - i0
        idx = np.stack([i0, i0 + 1], 1)
        w = np.stack([1 - f, f], 1)
        mat = _clip_gather_weights(idx, w, in_size)
    elif mode == "cubic":
        i0 = np.floor(src).astype(int)
        f = src - i0
        offs = np.arange(-1, 3)
        idx = i0[:, None] + offs[None]
        w = _cubic_weight(f[:, None] - offs[None])
        mat = _clip_gather_weights(idx, w, in_size)
    elif mode == "lanczos4":
        i0 = np.floor(src).astype(int)
        f = src - i0
        offs = np.arange(-3, 5)
        idx = i0[:, None] + offs[None]
        w = _lanczos_weight(f[:, None] - offs[None])
        w = w / w.sum(1, keepdims=True)
        mat = _clip_gather_weights(idx, w, in_size)
    elif mode == "area":
        if out_size >= in_size:
            # cv2 INTER_AREA upscale falls back to bilinear-like sampling
            return resize_matrix(in_size, out_size, "linear")
        mat = np.zeros((out_size, in_size))
        for o in range(out_size):
            lo, hi = o * scale, (o + 1) * scale
            i_lo, i_hi = int(np.floor(lo)), int(np.ceil(hi))
            for i in range(i_lo, min(i_hi, in_size)):
                overlap = min(hi, i + 1) - max(lo, i)
                if overlap > 0:
                    mat[o, i] = overlap
        mat /= mat.sum(1, keepdims=True)
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    return mat.astype(np.float32)


def resize(x, out_hw, mode: str = "linear"):
    """x [..., H, W, C] -> [..., out_h, out_w, C]."""
    out_h, out_w = out_hw
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(resize_matrix(h, out_h, mode))
    mw = jnp.asarray(resize_matrix(w, out_w, mode))
    y = jnp.einsum("oh,...hwc->...owc", mh.astype(x.dtype), x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.einsum("pw,...owc->...opc", mw.astype(x.dtype), y,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y
