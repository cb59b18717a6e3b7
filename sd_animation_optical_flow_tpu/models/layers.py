"""Core functional NN layers (NHWC, pytree params).

Every layer is a pair of functions:
  * ``<name>_init(rng, ...) -> params``   (dict of jnp arrays)
  * ``<name>(params, x, ...) -> y``       (pure apply)

Conventions:
  * Activations are NHWC ([B, H, W, C]); conv kernels are HWIO.
  * Params are stored float32; ``x.dtype`` drives compute precision
    (normalization statistics are always computed in float32).
  * Matches the numerics of the reference's torch layers
    (reference: ldm/modules/diffusionmodules/util.py:154-251) so ported
    checkpoints reproduce outputs.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

import contextlib

import numpy as _np

# When True, initializers draw from numpy instead of jax.random: zero
# compiles/dispatches. Random-weight init is not numerics-critical, and
# in remote-compile environments (axon tunnel) every jax.random call is
# a separate remote compilation — full-model init goes from minutes to
# seconds. Seeds derive from the jax key data, so it stays deterministic.
_NUMPY_INIT = False


@contextlib.contextmanager
def numpy_init():
    global _NUMPY_INIT
    prev = _NUMPY_INIT
    _NUMPY_INIT = True
    try:
        yield
    finally:
        _NUMPY_INIT = prev


def _np_seed(rng) -> int:
    data = _np.asarray(jax.random.key_data(rng)).ravel()
    return int(data[-1]) ^ (int(data[0]) << 1)


def _kaiming_uniform(rng, shape, fan_in):
    # torch's default Conv/Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / math.sqrt(max(fan_in, 1))
    if _NUMPY_INIT:
        r = _np.random.default_rng(_np_seed(rng))
        return jnp.asarray(r.uniform(-bound, bound, shape)
                           .astype(_np.float32))
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def linear_init(rng, in_dim: int, out_dim: int, *, zero: bool = False,
                bias: bool = True):
    kw, kb = jax.random.split(rng)
    w = (jnp.zeros((in_dim, out_dim), jnp.float32) if zero
         else _kaiming_uniform(kw, (in_dim, out_dim), in_dim))
    p = {"w": w}
    if bias:
        p["b"] = (jnp.zeros((out_dim,), jnp.float32) if zero
                  else _kaiming_uniform(kb, (out_dim,), in_dim))
    return p


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# conv2d  (NHWC x HWIO -> NHWC)
# ---------------------------------------------------------------------------

def conv2d_init(rng, in_ch: int, out_ch: int, kernel: int | Sequence[int],
                *, zero: bool = False, bias: bool = True):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    kh, kw_ = kernel
    fan_in = in_ch * kh * kw_
    kw, kb = jax.random.split(rng)
    w = (jnp.zeros((kh, kw_, in_ch, out_ch), jnp.float32) if zero
         else _kaiming_uniform(kw, (kh, kw_, in_ch, out_ch), fan_in))
    p = {"w": w}
    if bias:
        p["b"] = (jnp.zeros((out_ch,), jnp.float32) if zero
                  else _kaiming_uniform(kb, (out_ch,), fan_in))
    return p


def conv2d(p, x, *, stride: int = 1, padding="SAME", dilation: int = 1):
    """2D convolution. ``padding`` may be 'SAME', 'VALID', an int, or
    explicit ((top, bottom), (left, right))."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def norm_init(dim: int):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def group_norm(p, x, *, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over the channel (last) axis of an NHWC (or N...C) tensor.

    Statistics in float32 regardless of input dtype (matches the
    reference's GroupNorm32, openaimodel/util.py:226-231).
    """
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    # SD channel counts are always divisible by 32 (gcd == num_groups);
    # the gcd only kicks in for small test configs.
    g = math.gcd(num_groups, c)
    # Layout-preserving stats: every big-tensor op stays in the native
    # [..., C] layout (C on the lane axis). The textbook reshape to
    # [B, S, G, C/G] puts C/G (as small as 4) on the lane axis — a full
    # relayout of the tensor into nearly-empty tiles; measured 6.2ms ->
    # 2.8ms per VAE resblock at 512x768x128 on v5e. Two-pass moments in
    # f32 (GroupNorm32 semantics), group-reduced on tiny [B, G] arrays.
    reduce_axes = tuple(range(1, x.ndim - 1))            # spatial axes
    xf32 = x.astype(jnp.float32)
    m_c = jnp.mean(xf32, axis=reduce_axes)               # [B, C]
    m_g = jnp.mean(m_c.reshape(b, g, c // g), axis=2)    # [B, G]
    mean_c = jnp.repeat(m_g, c // g, axis=1)             # [B, C]
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    centered = xf32 - mean_c.reshape(bshape)
    v_c = jnp.mean(jnp.square(centered), axis=reduce_axes)
    v_g = jnp.mean(v_c.reshape(b, g, c // g), axis=2)
    inv_c = jnp.repeat(jax.lax.rsqrt(v_g + eps), c // g, axis=1)
    # affine in the INPUT dtype: stats stay f32 but the big elementwise
    # tensors round to bf16 one stage earlier, halving HBM traffic on
    # the bf16 path; f32 inputs keep full precision.
    y = (centered * inv_c.reshape(bshape)).astype(orig_dtype)
    return y * p["scale"].astype(orig_dtype) + p["bias"].astype(orig_dtype)


def layer_norm(p, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * p["scale"] + p["bias"]
    return xf.astype(orig_dtype)


def instance_norm(p, x, *, eps: float = 1e-5):
    """InstanceNorm2d over H,W per-channel (RAFT fnet, extractor.py:147)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        xf = xf * p["scale"] + p["bias"]
    return xf.astype(orig_dtype)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def swish(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# timestep embedding
# ---------------------------------------------------------------------------

def timestep_embedding(t, dim: int, *, max_period: float = 10000.0,
                       dtype=jnp.float32):
    """Sinusoidal timestep embedding, [cos|sin] order matching the
    reference (ldm/modules/diffusionmodules/util.py:154-174).

    t: [B] (float or int timesteps) -> [B, dim]
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def avg_pool2d(x, window: int = 2, stride: int | None = None):
    stride = stride or window
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID"
    ) / float(window * window)


def nearest_upsample2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
