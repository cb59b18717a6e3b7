"""Sampler-side tensor helpers: dynamic (norm) thresholding of pred_x0.

Parity surface of the reference's ldm/models/diffusion/sampling_util.py
(append_dims / norm_thresholding / spatial_norm_thresholding), consumed
by the DDIM and PLMS samplers via their ``dynamic_threshold`` option
(reference: ddim.py:242-243, plms.py:216-217).

Layout note: this framework is NHWC; the "spatial" variant reduces over
the trailing channel axis (the reference's "b c h w" reduces over dim 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def append_dims(x: jnp.ndarray, target_dims: int) -> jnp.ndarray:
    """Right-pad ``x`` with singleton dims until it has ``target_dims``."""
    dims_to_append = target_dims - x.ndim
    if dims_to_append < 0:
        raise ValueError(
            f"input has {x.ndim} dims but target_dims is {target_dims}")
    return x[(...,) + (None,) * dims_to_append]


def norm_thresholding(x0: jnp.ndarray, value: float) -> jnp.ndarray:
    """Rescale each batch element so its RMS is at most ``value``
    (sampling_util.py:14-16 semantics: s = max(rms, value); x0 * value/s).
    Elements already below the threshold are unchanged."""
    rms = jnp.sqrt(jnp.mean(
        jnp.square(x0.astype(jnp.float32)).reshape(x0.shape[0], -1), axis=1))
    s = append_dims(jnp.maximum(rms, value), x0.ndim).astype(x0.dtype)
    return x0 * (jnp.asarray(value, x0.dtype) / s)


def spatial_norm_thresholding(x0: jnp.ndarray, value: float) -> jnp.ndarray:
    """Per-pixel variant: RMS over the channel axis (NHWC -> axis -1),
    clamped below by ``value`` (sampling_util.py:19-22)."""
    s = jnp.sqrt(jnp.mean(jnp.square(x0.astype(jnp.float32)),
                          axis=-1, keepdims=True))
    s = jnp.maximum(s, value).astype(x0.dtype)
    return x0 * (jnp.asarray(value, x0.dtype) / s)
