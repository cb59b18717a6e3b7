"""Attention: XLA path vs torch SDPA, flash kernel (interpret) vs XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sd_animation_optical_flow_tpu.ops import attention as A


def _rand_qkv(np_rng, b=2, nq=17, nk=23, h=4, d=8):
    q = np_rng.standard_normal((b, nq, h, d), dtype=np.float32)
    k = np_rng.standard_normal((b, nk, h, d), dtype=np.float32)
    v = np_rng.standard_normal((b, nk, h, d), dtype=np.float32)
    return q, k, v


def test_xla_attention_matches_torch(np_rng):
    q, k, v = _rand_qkv(np_rng)
    out = A.xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    qt, kt, vt = (torch.from_numpy(a).permute(0, 2, 1, 3) for a in (q, k, v))
    ref = F.scaled_dot_product_attention(qt, kt, vt).permute(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_xla_attention_bias(np_rng):
    q, k, v = _rand_qkv(np_rng, b=1, nq=5, nk=5, h=2, d=4)
    bias = np.triu(np.full((5, 5), -1e9, np.float32), k=1)[None, None]
    out = A.xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          bias=jnp.asarray(bias))
    qt, kt, vt = (torch.from_numpy(a).permute(0, 2, 1, 3) for a in (q, k, v))
    ref = F.scaled_dot_product_attention(qt, kt, vt, is_causal=True)
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 1, 3).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_flash_attention_matches_xla(np_rng):
    # interpret mode on CPU exercises the same kernel logic
    q, k, v = _rand_qkv(np_rng, b=1, nq=300, nk=260, h=2, d=64)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    ref = A.xla_attention(qj, kj, vj)
    import functools
    from unittest import mock
    from jax.experimental import pallas as pl
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        out = A.flash_attention(qj, kj, vj, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_banded_strip_bias_shape_and_band():
    h, w, n = 6, 4, 3
    bias = A.banded_strip_bias(h, w, n, radius=1, weight=1.0, sigma=1.0)
    assert bias.shape == (h * w, n * h * w)
    b = np.asarray(bias)
    # diagonal blocks carry weight exp(0)=1 on their diagonals
    np.testing.assert_allclose(np.diag(b[:w, :w]), 1.0, atol=1e-5)
    # far off-band entries are the -1000 base
    assert b[0, (3 * w) + 3] == -1000.0
    # tiled identically for every frame in the strip
    np.testing.assert_allclose(b[:, : h * w], b[:, h * w: 2 * h * w])


def test_sliced_attention_matches_xla(rng):
    from sd_animation_optical_flow_tpu.ops.attention import (
        sliced_attention, xla_attention)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    q = jax.random.normal(k1, (2, 37, 4, 16))
    k = jax.random.normal(k2, (2, 53, 4, 16))
    v = jax.random.normal(k3, (2, 53, 4, 16))
    bias = jax.random.normal(k4, (1, 1, 37, 53))
    ref = xla_attention(q, k, v, bias=bias)
    out = sliced_attention(q, k, v, slice_size=16, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
    out2 = sliced_attention(q, k, v, slice_size=16)
    ref2 = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-5)


def test_flash_banded_matches_xla_with_materialized_bias(np_rng):
    """The in-kernel analytic band must equal xla_attention with the
    materialized banded_strip_bias (interpret mode on CPU)."""
    h, w, n = 8, 16, 2          # strip of 2 frames, 128 query tokens
    q, k, v = _rand_qkv(np_rng, b=1, nq=h * w, nk=n * h * w, h=2, d=32)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    bias = A.banded_strip_bias(h, w, n, radius=3, weight=0.7, sigma=1.6)
    ref = A.xla_attention(qj, kj, vj, bias=bias[None, None])
    import functools
    from unittest import mock
    from jax.experimental import pallas as pl
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        out = A.flash_attention_banded(qj, kj, vj, h=h, w=w, radius=3,
                                       weight=0.7, sigma=1.6,
                                       block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_banded_guards():
    q = jnp.zeros((1, 12, 2, 8))
    k = jnp.zeros((1, 25, 2, 8))   # not a multiple of h*w
    with np.testing.assert_raises(AssertionError):
        A.flash_attention_banded(q, k, k, h=3, w=4)


def test_flash_keymask_matches_xla_bias(np_rng):
    """The analytic KV-injection mask (uncond rows see only keys <
    n_own) must equal xla attention with the materialized bias."""
    import functools
    from unittest import mock
    from jax.experimental import pallas as pl

    b, nq, nk, h, d = 4, 64, 160, 2, 32
    n_own, n_uncond = 64, 2
    q, k, v = _rand_qkv(np_rng, b=b, nq=nq, nk=nk, h=h, d=d)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    ref = A.attention_injected(qj, kj, vj, n_own=n_own, n_uncond=n_uncond,
                               use_flash=False)
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        out = A.flash_attention_keymask(qj, kj, vj, n_own=n_own,
                                        n_uncond=n_uncond,
                                        block_q=32, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # cond rows must actually use the reference keys: zeroing them
    # changes cond outputs but not uncond outputs
    k2 = kj.at[:, n_own:].set(0.0)
    v2 = vj.at[:, n_own:].set(0.0)
    ref2 = A.attention_injected(qj, k2, v2, n_own=n_own,
                                n_uncond=n_uncond, use_flash=False)
    np.testing.assert_allclose(np.asarray(ref2[:n_uncond]),
                               np.asarray(ref[:n_uncond]), atol=1e-5)
    assert np.abs(np.asarray(ref2[n_uncond:])
                  - np.asarray(ref[n_uncond:])).max() > 1e-4


def test_flash_diff_forward_matches_xla(np_rng):
    q, k, v = _rand_qkv(np_rng, b=2, nq=64, nk=64, h=2, d=16)
    out = A.flash_attention_diff(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v))
    ref = A.xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_diff_grads_match_xla(np_rng):
    """VJP parity with XLA attention, including a non-block-divisible K
    length (exercises the padded-K mask in the dQ kernel)."""
    for nq, nk in ((64, 64), (48, 37)):
        q, k, v = _rand_qkv(np_rng, b=2, nq=nq, nk=nk, h=2, d=16)
        qj, kj, vj = map(jnp.asarray, (q, k, v))
        w = np_rng.standard_normal((2, nq, 2, 16)).astype(np.float32)
        wj = jnp.asarray(w)  # fixed cotangent via a linear loss

        def loss_flash(q, k, v):
            return jnp.sum(A.flash_attention_diff(q, k, v) * wj)

        def loss_xla(q, k, v):
            return jnp.sum(A.xla_attention(q, k, v) * wj)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(qj, kj, vj)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(qj, kj, vj)
        for gf, gx, name in zip(g_flash, g_xla, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gx), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name} mismatch at nq={nq} nk={nk}")


def test_flash_diff_value_and_grad_bf16_runs(np_rng):
    q, k, v = _rand_qkv(np_rng, b=1, nq=32, nk=32, h=2, d=8)
    qj, kj, vj = (jnp.asarray(a, jnp.bfloat16) for a in (q, k, v))

    def loss(q, k, v):
        return jnp.sum(A.flash_attention_diff(q, k, v).astype(jnp.float32))

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(qj, kj, vj)
    assert jnp.isfinite(val)
    for g in grads:
        assert g.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_shortk_tpv_matches_xla(np_rng):
    """Short-K cross-attention route (one resident kv block in the
    transposed-PV kernel, routed by attention() for prompt-length K on
    TPU): parity vs XLA attention incl. a non-128-divisible K length
    (231-token prompt -> padded, masked)."""
    for nk in (37, 128):
        q, k, v = _rand_qkv(np_rng, b=2, nq=128, nk=nk, h=2, d=16)
        qj, kj, vj = map(jnp.asarray, (q, k, v))
        out = A.shortk_attention(qj, kj, vj, 64, 128)
        ref = A.xla_attention(qj, kj, vj)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_shortk_tpv_grads_match_xla(np_rng):
    q, k, v = _rand_qkv(np_rng, b=1, nq=64, nk=37, h=2, d=16)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    w = jnp.asarray(np_rng.standard_normal((1, 64, 2, 16)).astype(np.float32))

    def loss_shortk(q, k, v):
        return jnp.sum(A.shortk_attention(q, k, v, 64, 64) * w)

    def loss_xla(q, k, v):
        return jnp.sum(A.xla_attention(q, k, v) * w)

    g_s = jax.grad(loss_shortk, argnums=(0, 1, 2))(qj, kj, vj)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(qj, kj, vj)
    for gs, gx, name in zip(g_s, g_x, "qkv"):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gx),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")
