"""Parity tests for the fused GEGLU feed-forward kernel (ops/ffn.py)
against the unfused XLA chain it replaces (models/unet._geglu_ff;
reference semantics: ldm/modules/attention.py FeedForward/GEGLU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.ops.ffn import geglu_ff_fused


def _unfused(x, w1, b1, w2, b2):
    h = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    return h @ w2.astype(x.dtype) + b2.astype(x.dtype)


def _params(rng, din, dff, dtype):
    w1 = rng.standard_normal((din, 2 * dff)).astype(np.float32) * 0.05
    b1 = rng.standard_normal((2 * dff,)).astype(np.float32) * 0.05
    w2 = rng.standard_normal((dff, din)).astype(np.float32) * 0.05
    b2 = rng.standard_normal((din,)).astype(np.float32) * 0.05
    return tuple(jnp.asarray(a, dtype) for a in (w1, b1, w2, b2))


@pytest.mark.parametrize("din,dff,m,block_m,block_ff", [
    (64, 256, 512, 256, 256),     # single ff chunk
    (64, 256, 512, 256, 128),     # chunked ff axis (grid accumulation)
    (64, 256, 300, 256, 128),     # non-divisible rows (pad + slice)
])
def test_fused_matches_unfused_f32(np_rng, din, dff, m, block_m, block_ff):
    x = jnp.asarray(np_rng.standard_normal((m, din)), jnp.float32) * 0.5
    w1, b1, w2, b2 = _params(np_rng, din, dff, jnp.float32)
    out = geglu_ff_fused(x, w1, b1, w2, b2, block_m=block_m,
                         block_ff=block_ff)
    ref = _unfused(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_unfused_bf16_3d(np_rng):
    """bf16 (the deployment dtype) with a [B, N, C] input as the
    transformer calls it; tolerance is bf16-rounding-scale."""
    x = jnp.asarray(np_rng.standard_normal((2, 256, 64)),
                    jnp.bfloat16) * 0.5
    w1, b1, w2, b2 = _params(np_rng, 64, 256, jnp.bfloat16)
    out = geglu_ff_fused(x, w1, b1, w2, b2, block_m=256, block_ff=128)
    ref = _unfused(x, w1, b1, w2, b2)
    assert out.shape == ref.shape == (2, 256, 64)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)


def _layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * scale + bias).astype(x.dtype)


@pytest.mark.parametrize("dtype,m,block_ff,tol", [
    (jnp.float32, 512, 256, 3e-5),    # single ff chunk
    (jnp.float32, 300, 128, 3e-5),    # chunked ff + padded rows
    (jnp.bfloat16, 512, 256, 0.05),   # deployment dtype
])
def test_fused_ln_residual_matches_chain(np_rng, dtype, m, block_ff, tol):
    """The whole transformer-block tail x + FF(LN(x)) fused into the
    kernel (LN prologue + residual epilogue) matches the unfused
    composition (models/unet._ff_tail fallback path)."""
    din, dff = 64, 256
    x = jnp.asarray(np_rng.standard_normal((m, din)), dtype) * 0.5
    w1, b1, w2, b2 = _params(np_rng, din, dff, dtype)
    g = jnp.asarray(np_rng.standard_normal((din,)), jnp.float32) * 0.1 + 1.0
    beta = jnp.asarray(np_rng.standard_normal((din,)), jnp.float32) * 0.1
    out = geglu_ff_fused(x, w1, b1, w2, b2, g, beta, residual=True,
                         block_m=256, block_ff=block_ff)
    ref = x + _unfused(_layer_norm(x, g, beta), w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype,m,dout,tol", [
    (jnp.float32, 512, 192, 3e-5),
    (jnp.float32, 300, 64, 3e-5),     # padded rows
    (jnp.bfloat16, 512, 192, 0.05),   # deployment dtype (QKV: dout=3*din)
])
def test_linear_ln_fused_matches_chain(np_rng, dtype, m, dout, tol):
    """LN(x) @ w with the LayerNorm fused as a kernel prologue matches
    the unfused composition (models/unet QKV/Q projection route)."""
    from sd_animation_optical_flow_tpu.ops.ffn import linear_ln_fused
    din = 64
    x = jnp.asarray(np_rng.standard_normal((m, din)), dtype) * 0.5
    w = jnp.asarray(np_rng.standard_normal((din, dout)), dtype) * 0.1
    g = jnp.asarray(np_rng.standard_normal((din,)), jnp.float32) * 0.1 + 1.0
    beta = jnp.asarray(np_rng.standard_normal((din,)), jnp.float32) * 0.1
    out = linear_ln_fused(x, w, g, beta, block_m=256)
    ref = _layer_norm(x, g, beta) @ w
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol)


def test_linear_ln_fused_3d(np_rng):
    from sd_animation_optical_flow_tpu.ops.ffn import linear_ln_fused
    din = 64
    x = jnp.asarray(np_rng.standard_normal((2, 200, din)), jnp.float32)
    w = jnp.asarray(np_rng.standard_normal((din, din)), jnp.float32) * 0.1
    g = jnp.ones((din,), jnp.float32)
    beta = jnp.zeros((din,), jnp.float32)
    out = linear_ln_fused(x, w, g, beta, block_m=128)
    ref = _layer_norm(x, g, beta) @ w
    assert out.shape == (2, 200, din)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
