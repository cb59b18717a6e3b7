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
