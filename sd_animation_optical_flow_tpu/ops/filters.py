"""Image filters with cv2/PIL-parity semantics (device-side).

Replaces the reference's host-side mask/keyframe processing:
Gaussian blur (PIL ImageFilter.GaussianBlur for masks,
guided_ldm_inpainting.py:293; cv2.GaussianBlur for unsharp,
ofgen_pixel_inpaint.py:120-123), morphological dilation with ellipse
elements (ofgen_pixel_inpaint.py:262-267), and the unsharp mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def gaussian_kernel_1d(sigma: float, ksize: int = 0) -> np.ndarray:
    """cv2.getGaussianKernel semantics: if ksize==0, derive it from sigma
    (cv2 uses round(sigma*3)*2+1 for 8-bit); if sigma<=0, derive from
    ksize (sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8)."""
    if ksize <= 0:
        ksize = int(round(sigma * 3)) * 2 + 1
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = (ksize - 1) / 2
    x = np.arange(ksize) - r
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _sep_filter(x, k, axis):
    """Separable 1D correlation along a spatial axis with edge replicate
    (cv2 default BORDER_REFLECT_101 differs only within radius of the
    border; replicate keeps masks conservative there)."""
    r = len(k) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="edge")
    kj = jnp.asarray(k, x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                     else jnp.float32)
    xp = xp.astype(kj.dtype)
    out = sum(kj[i] * jax.lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis)
              for i in range(len(k)))
    return out


@functools.partial(jax.jit, static_argnames=("sigma", "ksize"))
def gaussian_blur(x, sigma: float, ksize: int = 0):
    """x [H, W] or [H, W, C] float; true separable Gaussian."""
    k = gaussian_kernel_1d(float(sigma), ksize)
    y = _sep_filter(x, k, 0)
    y = _sep_filter(y, k, 1)
    return y.astype(x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else y


def ellipse_kernel(size: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (size, size)) parity."""
    import cv2
    return cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                     (size, size)).astype(bool)


@functools.partial(jax.jit, static_argnames=("kernel_shape",))
def _dilate_impl(x, offsets, kernel_shape):
    h, w = x.shape[:2]
    ry, rx = kernel_shape[0] // 2, kernel_shape[1] // 2
    xp = jnp.pad(x, ((ry, ry), (rx, rx)) + ((0, 0),) * (x.ndim - 2),
                 constant_values=0)
    out = x
    for dy, dx in offsets:
        out = jnp.maximum(out, jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(xp, dy, h, 0), dx, w, 1))
    return out


def dilate(x, kernel: np.ndarray):
    """Morphological max-dilation of [H, W] (or [H, W, C]) by a boolean
    structuring element (cv2.dilate parity, zero padding)."""
    ys, xs = np.nonzero(kernel)
    offsets = tuple((int(y), int(x)) for y, x in zip(ys, xs))
    return _dilate_impl(x, offsets, kernel.shape)


@jax.jit
def unsharp(img):
    """ofgen unsharp (ofgen_pixel_inpaint.py:120-123): 1.3*img - 0.3*blur
    with cv2.GaussianBlur(ksize=0, sigma=2)."""
    blurred = gaussian_blur(img.astype(jnp.float32), 2.0, ksize=13)
    out = 1.3 * img.astype(jnp.float32) - 0.3 * blurred
    if jnp.issubdtype(img.dtype, jnp.floating):
        return out.astype(img.dtype)
    return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)


def _blur_any_sigma(x, sigma: float):
    """Gaussian blur at arbitrary sigma. Large sigmas go through a
    downsample -> blur -> upsample pyramid (PIL's own GaussianBlur is a
    box-chain approximation, so approximate large-radius behavior is the
    contract); small sigmas use the exact separable kernel."""
    if sigma <= 0:
        return x
    if sigma <= 12:
        return gaussian_blur(x, float(sigma))
    from .resize import resize
    h, w = x.shape[-3], x.shape[-2]
    f = max(int(sigma // 8), 1)
    hs, ws = max(h // f, 1), max(w // f, 1)
    small = resize(x, (hs, ws), "area")
    small = gaussian_blur(small, float(sigma) / f)
    return resize(small, (h, w), "linear")


def fill_masked(img, mask01,
                schedule=((256, 1), (64, 1), (16, 2), (4, 4), (2, 2),
                          (0, 1))):
    """Fill masked pixels with multi-radius Gaussian-blurred colors —
    the reference's ``fill_mask_input`` (guided_ldm_inpainting.py:161-176):
    premultiplied-alpha blurs at radii 256/64/16/4/2/0 alpha-composited
    coarse-to-fine, so fine structure wins near the hole boundary and
    coarse colors fill the interior.

    img [..., H, W, C] (any linear color space); mask01 [..., H, W]
    (1 = hole). Device-side jnp (the reference round-trips through PIL).
    """
    a = (1.0 - jnp.asarray(mask01, jnp.float32))[..., None]
    prem = img.astype(jnp.float32) * a
    mod_c = jnp.zeros_like(prem)
    mod_a = jnp.zeros_like(a)
    for radius, repeats in schedule:
        bc = _blur_any_sigma(prem, radius)
        ba = _blur_any_sigma(a, radius)
        col = bc / jnp.maximum(ba, 1e-6)
        src_prem = col * ba
        for _ in range(repeats):
            # src OVER dst, premultiplied (PIL alpha_composite)
            mod_c = src_prem + mod_c * (1.0 - ba)
            mod_a = ba + mod_a * (1.0 - ba)
    out = mod_c / jnp.maximum(mod_a, 1e-6)
    return out.astype(img.dtype)
