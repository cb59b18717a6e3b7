"""Fused GEGLU feed-forward for the UNet transformer blocks.

The reference's FF is ``Linear(d, 8d) -> chunk2 -> x * gelu(gate) ->
Linear(4d, d)`` (ldm/modules/attention.py FeedForward/GEGLU). As three
XLA ops at SD strip shapes the [B*N, 4d] (and 8d) intermediates round-trip
HBM — measured 3.13 ms at 6144x320, CFG batch 16 on v5e (~77 TF/s for a
0.24 TFLOP op whose matmuls alone run >150 TF/s). This kernel computes
both matmuls tile-by-tile with the intermediates resident in VMEM: HBM
traffic drops to x + out + one pass over the (small) weights, and the op
runs at MXU rate.

Layout: the launcher splits W1 into its value/gate halves so the FF dim
can be chunked along a grid axis (each chunk contributes a rank-``dffc``
update to the second matmul, accumulated in an f32 scratch):

    h_c    = x @ W1a_c + b1a_c          (bf16 round, like XLA's linear)
    g_c    = x @ W1b_c + b1b_c
    acc   += (h_c * gelu(g_c)) @ W2_c   (f32 accumulator)
    out    = bf16(acc) + b2

gelu is exact (erf), computed in f32 — XLA's path evaluates it on bf16
values, so results agree to bf16 rounding (parity-tested vs _geglu_ff).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """f32 erf — Mosaic has no erf primitive, so evaluate the
    Abramowitz & Stegun 7.1.26 rational approximation (|err| < 1.5e-7,
    ~20x below the kernel's f32 parity tolerance and far below bf16
    rounding of the surrounding values)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    # erf-based gelu, f32 in/out (jax.nn.gelu approximate=False)
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _geglu_kernel(x_ref, w1a_ref, w1b_ref, b1a_ref, b1b_ref, w2_ref,
                  b2_ref, o_ref, acc_ref, *, out_dtype, ln_eps=None,
                  lns_ref=None, lnb_ref=None, residual=False):
    ff_idx = pl.program_id(1)

    @pl.when(ff_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                                   # [bm, din]
    if ln_eps is not None:
        # LayerNorm prologue: x arrives RAW; the separate LN pass this
        # absorbs costs a full HBM read+write of the activation at
        # every transformer block. f32 stats + affine, rounded back to
        # the input dtype — bit-matches layers.layer_norm. Recomputed
        # per ff chunk, but both UNet call sites run one chunk.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
        xf = xf * lns_ref[...] + lnb_ref[...]
        xn = xf.astype(x.dtype)
    else:
        xn = x
    # both matmuls accumulate f32 on the MXU; the bf16 round of h/g
    # before the gelu matches XLA's linear() output dtype exactly
    h = jax.lax.dot_general(xn, w1a_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = (h.astype(x.dtype) + b1a_ref[...].astype(x.dtype))
    g = jax.lax.dot_general(xn, w1b_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = (g.astype(x.dtype) + b1b_ref[...].astype(x.dtype))
    hg = (h.astype(jnp.float32) * _gelu_exact(g.astype(jnp.float32))
          ).astype(x.dtype)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        hg, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ff_idx == pl.num_programs(1) - 1)
    def _finalize():
        out = (acc_ref[:].astype(out_dtype)
               + b2_ref[...].astype(out_dtype))
        if residual:
            # residual-add epilogue: x + FF(LN(x)) in one write — the
            # raw x block is already VMEM-resident
            out = x_ref[...].astype(out_dtype) + out
        o_ref[...] = out


def _geglu_kernel_ln(x_ref, lns_ref, lnb_ref, w1a_ref, w1b_ref, b1a_ref,
                     b1b_ref, w2_ref, b2_ref, o_ref, acc_ref, *,
                     out_dtype, ln_eps, residual):
    _geglu_kernel(x_ref, w1a_ref, w1b_ref, b1a_ref, b1b_ref, w2_ref,
                  b2_ref, o_ref, acc_ref, out_dtype=out_dtype,
                  ln_eps=ln_eps, lns_ref=lns_ref, lnb_ref=lnb_ref,
                  residual=residual)


@functools.partial(jax.jit, static_argnames=("block_m", "block_ff",
                                              "ln_eps", "residual"))
def geglu_ff_fused(x, w1, b1, w2, b2, ln_scale=None, ln_bias=None, *,
                   block_m: int = 512, block_ff: int = 1280,
                   ln_eps: float = 1e-5, residual: bool = False):
    """x [..., din] @ w1 [din, 2*dff] -> geglu -> @ w2 [dff, din].

    Returns the same value as the unfused
    ``linear(w1) -> split -> x*gelu(gate) -> linear(w2)`` chain to bf16
    rounding. Rows are padded to ``block_m``; dff must divide
    ``block_ff`` or vice versa (the grid chunks dff).

    With ``ln_scale``/``ln_bias`` the kernel applies LayerNorm to x
    first (f32 stats, matching layers.layer_norm), and with
    ``residual=True`` it adds the RAW x to the output — i.e. the whole
    transformer-block tail ``x + FF(LN(x))`` in one pass over HBM
    instead of four (LN write+read, FF out write, residual read).
    """
    orig_shape = x.shape
    din = x.shape[-1]
    dff = w2.shape[0]
    assert w1.shape == (din, 2 * dff), (w1.shape, din, dff)
    if jnp.dtype(x.dtype).itemsize >= 4:
        # f32 activations double every VMEM buffer — halve the row block
        # to stay inside the 16MB scoped budget
        block_m = max(min(block_m, 512), block_m // 2)
    m = math.prod(orig_shape[:-1])
    xf = x.reshape(m, din)

    block_ff = min(block_ff, dff)
    assert dff % block_ff == 0, (dff, block_ff)
    m_p = pl.cdiv(m, block_m) * block_m
    if m_p != m:
        xf = jnp.pad(xf, ((0, m_p - m), (0, 0)))

    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    w1a, w1b = w1[:, :dff], w1[:, dff:]
    b1a, b1b = b1[:dff].reshape(1, dff), b1[dff:].reshape(1, dff)
    b2r = b2.reshape(1, din)

    grid = (m_p // block_m, dff // block_ff)
    ln = ln_scale is not None
    w_specs = [
        pl.BlockSpec((din, block_ff), lambda i, j: (0, j)),
        pl.BlockSpec((din, block_ff), lambda i, j: (0, j)),
        pl.BlockSpec((1, block_ff), lambda i, j: (0, j)),
        pl.BlockSpec((1, block_ff), lambda i, j: (0, j)),
        pl.BlockSpec((block_ff, din), lambda i, j: (j, 0)),
        pl.BlockSpec((1, din), lambda i, j: (0, 0)),
    ]
    x_spec = pl.BlockSpec((block_m, din), lambda i, j: (i, 0))
    if ln:
        kern = functools.partial(_geglu_kernel_ln, out_dtype=x.dtype,
                                 ln_eps=ln_eps, residual=residual)
        ln_spec = pl.BlockSpec((1, din), lambda i, j: (0, 0))
        in_specs = [x_spec, ln_spec, ln_spec] + w_specs
        inputs = (xf, ln_scale.astype(jnp.float32).reshape(1, din),
                  ln_bias.astype(jnp.float32).reshape(1, din),
                  w1a, w1b, b1a, b1b, w2, b2r)
    else:
        kern = functools.partial(_geglu_kernel, out_dtype=x.dtype,
                                 residual=residual)
        in_specs = [x_spec] + w_specs
        inputs = (xf, w1a, w1b, b1a, b1b, w2, b2r)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, din), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_p, din), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, din), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )(*inputs)

    return out[:m].reshape(orig_shape)


def _linear_ln_kernel(x_ref, lns_ref, lnb_ref, w_ref, o_ref, *, ln_eps):
    # LN prologue in f32 (bit-matches layers.layer_norm), round to the
    # activation dtype, then one MXU dot with the whole weight resident
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xf * lns_ref[...] + lnb_ref[...]).astype(x.dtype)
    y = jax.lax.dot_general(xn, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "ln_eps"))
def linear_ln_fused(x, w, ln_scale, ln_bias, *, block_m: int = 1024,
                    ln_eps: float = 1e-5):
    """``LN(x) @ w`` with the LayerNorm fused into the projection.

    Used for the UNet attention projections (LN1 -> QKV, LN2 -> Q; SD's
    q/k/v projections carry no bias): the LN reduction is a producer XLA
    will not fuse into a dot, so the standalone LN costs a full HBM
    read+write of the activation per transformer block. Here the raw x
    block is normalized in VMEM and fed straight to the MXU. The whole
    weight stays resident (dout <= 3*din at these shapes); the grid runs
    over rows only.
    """
    orig_shape = x.shape
    din = x.shape[-1]
    dout = w.shape[1]
    assert w.shape[0] == din, (w.shape, din)
    if jnp.dtype(x.dtype).itemsize >= 4:
        block_m = max(min(block_m, 512), block_m // 2)
    m = math.prod(orig_shape[:-1])
    xf = x.reshape(m, din)
    m_p = pl.cdiv(m, block_m) * block_m
    if m_p != m:
        xf = jnp.pad(xf, ((0, m_p - m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_linear_ln_kernel, ln_eps=ln_eps),
        grid=(m_p // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, din), lambda i: (i, 0)),
            pl.BlockSpec((1, din), lambda i: (0, 0)),
            pl.BlockSpec((1, din), lambda i: (0, 0)),
            pl.BlockSpec((din, dout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, dout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_p, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() != "tpu",
    )(xf, ln_scale.astype(jnp.float32).reshape(1, din),
      ln_bias.astype(jnp.float32).reshape(1, din), w.astype(x.dtype))
    return out[:m].reshape(*orig_shape[:-1], dout)
