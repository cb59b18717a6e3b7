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

from ..utils.hostmem import shared_empty

# When True, initializers draw from numpy instead of jax.random: zero
# compiles/dispatches. Random-weight init is not numerics-critical, and
# in remote-compile environments (axon tunnel) every jax.random call is
# a separate remote compilation — full-model init goes from minutes to
# seconds. Seeds derive from the jax key data, so it stays deterministic.
_NUMPY_INIT = False
_NUMPY_INIT_DTYPE = None    # target dtype for numpy-mode random params
_SCRATCH_F32 = None         # reusable f32 staging chunk (warm heap pages)


@contextlib.contextmanager
def numpy_init(dtype=None):
    """Draw initializers from numpy instead of jax.random.

    With ``dtype`` (e.g. ``jnp.bfloat16``) random params are written
    straight into buffers of that dtype through a small reusable f32
    scratch — on hosts where fresh memory is slow past a few GB
    (utils/hostmem.py), this keeps a multi-model init inside the fast
    window instead of staging every model in f32 first.
    """
    global _NUMPY_INIT, _NUMPY_INIT_DTYPE
    prev, prev_dt = _NUMPY_INIT, _NUMPY_INIT_DTYPE
    _NUMPY_INIT = True
    _NUMPY_INIT_DTYPE = _np.dtype(dtype) if dtype is not None else None
    try:
        yield
    finally:
        _NUMPY_INIT, _NUMPY_INIT_DTYPE = prev, prev_dt


def cast_tree(tree, dtype):
    """Host-side dtype cast of a param pytree via numpy/ml_dtypes.

    ``jax.tree.map(lambda x: x.astype(bf16), params)`` outside jit
    dispatches one eager convert_element_type program per leaf — ~300
    unique shapes x ~0.3s compile each on a loaded host (measured 100s
    for one SD-1.5 UNet). numpy + ml_dtypes does the same cast as plain
    memory traffic; ``jax.device_put`` accepts the numpy bf16 arrays
    directly. Non-float leaves pass through untouched."""
    np_dtype = _np.dtype(dtype)

    def cast(x):
        a = _np.asarray(x)
        if a.dtype.kind == "f" and a.dtype != np_dtype:
            out = shared_empty(a.shape, np_dtype)
            _np.copyto(out, a, casting="same_kind")
            return out
        return a
    return jax.tree.map(cast, tree)


def _zeros(shape):
    if _NUMPY_INIT:
        return _np.zeros(shape, _NUMPY_INIT_DTYPE or _np.float32)
    return jnp.zeros(shape, jnp.float32)


def _ones(shape):
    if _NUMPY_INIT:
        return _np.ones(shape, _NUMPY_INIT_DTYPE or _np.float32)
    return jnp.ones(shape, jnp.float32)


def _np_seed(rng) -> int:
    data = _np.asarray(jax.random.key_data(rng)).ravel()
    return int(data[-1]) ^ (int(data[0]) << 1)


def normal_init_array(rng, shape, scale: float = 1.0):
    """N(0, scale^2) param init honoring the ``numpy_init`` context
    (threefry on a single host core is minutes for embedding tables)."""
    if _NUMPY_INIT:
        r = _np.random.default_rng(_np_seed(rng))
        u = shared_empty(shape, _np.float32)
        r.standard_normal(out=u.reshape(-1), dtype=_np.float32)
        if scale != 1.0:
            _np.multiply(u, scale, out=u)
        if _NUMPY_INIT_DTYPE is not None and _NUMPY_INIT_DTYPE != _np.float32:
            out = shared_empty(shape, _NUMPY_INIT_DTYPE)
            _np.copyto(out, u, casting="same_kind")
            return out
        return u
    return jax.random.normal(rng, shape, jnp.float32) * scale


def _kaiming_uniform(rng, shape, fan_in):
    # torch's default Conv/Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    bound = 1.0 / math.sqrt(max(fan_in, 1))
    if _NUMPY_INIT:
        r = _np.random.default_rng(_np_seed(rng))
        # f32 generation straight into a shared-anon staging buffer,
        # scaled in place: the f64-uniform + astype + private-page
        # faults version took ~110s for one SD-1.5 UNet on this host;
        # this takes ~3s (see utils/hostmem.py). Returned as numpy —
        # params are jit arguments, so device conversion happens at the
        # jit/device_put boundary either way.
        if _NUMPY_INIT_DTYPE is None or _NUMPY_INIT_DTYPE == _np.float32:
            u = shared_empty(shape, _np.float32)
            r.random(out=u.reshape(-1), dtype=_np.float32)
            _np.multiply(u, 2.0 * bound, out=u)
            _np.subtract(u, bound, out=u)
            return u
        # low-precision target: stream through a reusable f32 scratch so
        # only the final (half-size) buffer touches fresh pages
        global _SCRATCH_F32
        if _SCRATCH_F32 is None:
            _SCRATCH_F32 = _np.empty(1 << 24, _np.float32)   # 64 MB
        out = shared_empty(shape, _NUMPY_INIT_DTYPE)
        flat = out.reshape(-1)
        n = flat.shape[0]
        for lo in range(0, n, _SCRATCH_F32.shape[0]):
            hi = min(lo + _SCRATCH_F32.shape[0], n)
            tmp = _SCRATCH_F32[:hi - lo]
            r.random(out=tmp, dtype=_np.float32)
            _np.multiply(tmp, 2.0 * bound, out=tmp)
            _np.subtract(tmp, bound, out=tmp)
            _np.copyto(flat[lo:hi], tmp, casting="same_kind")
        return out
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def linear_init(rng, in_dim: int, out_dim: int, *, zero: bool = False,
                bias: bool = True):
    kw, kb = jax.random.split(rng)
    w = (_zeros((in_dim, out_dim)) if zero
         else _kaiming_uniform(kw, (in_dim, out_dim), in_dim))
    p = {"w": w}
    if bias:
        p["b"] = (_zeros((out_dim,)) if zero
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
    w = (_zeros((kh, kw_, in_ch, out_ch)) if zero
         else _kaiming_uniform(kw, (kh, kw_, in_ch, out_ch), fan_in))
    p = {"w": w}
    if bias:
        p["b"] = (_zeros((out_ch,)) if zero
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
    return {"scale": _ones((dim,)), "bias": _zeros((dim,))}


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
    # Layout-preserving, TWO-pass total: every big-tensor op stays in the
    # native [..., C] layout (C on the lane axis — the textbook reshape
    # to [B, S, G, C/G] forces a full relayout into nearly-empty tiles).
    # Pass 1 reduces E[x] and E[x^2] together in one fused read of x
    # (moments via E[x^2] - E[x]^2; VAE/UNet activations are O(10) so
    # the cancellation is benign in f32). Pass 2 is a single fused
    # y = x*a + b with the mean/rsqrt/affine folded into per-channel
    # [B, C] coefficients — no materialized f32 centered tensor (that
    # intermediate was ~4x the HBM traffic at 512x768x128 on v5e).
    reduce_axes = tuple(range(1, x.ndim - 1))            # spatial axes
    xf32 = x.astype(jnp.float32)
    s1 = jnp.mean(xf32, axis=reduce_axes)                # [B, C]
    s2 = jnp.mean(xf32 * xf32, axis=reduce_axes)         # [B, C] same pass
    m_g = jnp.mean(s1.reshape(b, g, c // g), axis=2)     # [B, G]
    e2_g = jnp.mean(s2.reshape(b, g, c // g), axis=2)    # [B, G]
    v_g = jnp.maximum(e2_g - m_g * m_g, 0.0)
    inv_g = jax.lax.rsqrt(v_g + eps)
    inv_c = jnp.repeat(inv_g, c // g, axis=1)            # [B, C]
    mean_c = jnp.repeat(m_g, c // g, axis=1)             # [B, C]
    scale = p["scale"].astype(jnp.float32)[None]         # [1, C]
    bias = p["bias"].astype(jnp.float32)[None]
    a = inv_c * scale                                    # [B, C]
    sh = bias - mean_c * a
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    # pass 2 — one fused elementwise loop (read x, write y; the f32
    # intermediate lives in registers, so precision is free): the
    # subtraction-and-scale happens in f32 and rounds once at the end
    return (xf32 * a.reshape(bshape)
            + sh.reshape(bshape)).astype(orig_dtype)


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


def upsample2x_conv(p, x):
    """``conv2d(p, nearest_upsample2x(x))`` for a 3x3 SAME conv, computed
    as four subpixel 2x2 convs on the LOW-res input.

    Nearest-neighbour upsampling duplicates pixels, so each of the four
    output parities (dp, dq) sees at most 2 distinct source pixels per
    axis: parity 0 taps rows (i-1, i) with weights (w0, w1+w2); parity 1
    taps (i, i+1) with (w0+w1, w2). Summing weights instead of repeating
    pixels cuts the conv FLOPs to 16/36 of the upsampled form and never
    materializes the 4x intermediate — the interleave reshape at the end
    is a layout no-op (row-major (i, dp) == 2i+dp). Exact same sums as
    the reference's Upsample block (openaimodel.py Upsample /
    model.py:Upsample) modulo f32 weight pre-addition."""
    w = p["w"].astype(x.dtype)                      # [3, 3, I, O]
    # per-axis 2-tap kernels, rows then columns
    r0 = jnp.stack([w[0], w[1] + w[2]])             # [2, 3, I, O] (dp=0)
    r1 = jnp.stack([w[0] + w[1], w[2]])             # [2, 3, I, O] (dp=1)
    ks = {}
    for dp, r in ((0, r0), (1, r1)):
        ks[(dp, 0)] = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)
        ks[(dp, 1)] = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
    pads = {0: (1, 0), 1: (0, 1)}                   # taps (i-1,i) / (i,i+1)
    ys = {}
    for (dp, dq), k in ks.items():
        ys[(dp, dq)] = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1),
            padding=(pads[dp], pads[dq]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, h, wd, _ = x.shape
    o = ys[(0, 0)].shape[-1]
    y = jnp.stack([jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=3),
                   jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=3)], axis=2)
    y = y.reshape(b, 2 * h, 2 * wd, o)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y
