"""MFR strip attention (the reference's forward_mfr band bias,
ldm/modules/attention.py:220-324): sigma table parity, analytic kernel vs
materialized bias, and the UNet/facade wiring."""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.ops import attention as A


def test_mfr_sigma_matches_reference_table():
    # reference sigma_from_h (attention.py:256-261)
    for h, s in {96: 1.0, 48: 0.8, 24: 0.6, 12: 0.4}.items():
        assert abs(A.mfr_sigma(h) - s) < 1e-9


def test_mfr_strip_bias_semantics():
    h, w, n = 4, 3, 2
    bias = np.asarray(A.mfr_strip_bias(h, w, n, radius=1, weight=2.0,
                                       sigma=1.0, mode="target"))
    N = h * n * w
    assert bias.shape == (N, N)
    ws = n * w

    def tok(y, tile, x):
        return y * ws + tile * w + x

    # same-pixel target->reference: full weight
    np.testing.assert_allclose(bias[tok(1, 0, 1), tok(1, 1, 1)], 2.0)
    # 1-off diagonal: 2*exp(-1)
    np.testing.assert_allclose(bias[tok(1, 0, 1), tok(1, 1, 2)],
                               2.0 * np.exp(-1.0), rtol=1e-6)
    # outside radius: 0 (additive attraction, base stays 0 — the
    # reference's -100 fill is commented out)
    assert bias[tok(0, 0, 0), tok(3, 1, 2)] == 0.0
    # target->target (same tile): no bias
    assert bias[tok(1, 0, 1), tok(1, 0, 2)] == 0.0
    # reference-tile queries: never biased in 'target' mode
    assert np.all(bias[tok(1, 1, 0)] == 0.0)

    mut = np.asarray(A.mfr_strip_bias(h, w, n, radius=1, weight=2.0,
                                      sigma=1.0, mode="mutual"))
    # mutual: reference->target also attracts
    np.testing.assert_allclose(mut[tok(1, 1, 1), tok(1, 0, 1)], 2.0)
    assert mut[tok(1, 1, 1), tok(1, 1, 1)] == 0.0


@pytest.mark.parametrize("mode", ["target", "mutual"])
@pytest.mark.parametrize("n_tiles", [2, 3])
def test_flash_mfr_matches_materialized(np_rng, mode, n_tiles):
    h, w_tile = 6, 8
    N = h * n_tiles * w_tile
    b, heads, d = 1, 2, 32
    q = np_rng.standard_normal((b, N, heads, d), dtype=np.float32)
    k = np_rng.standard_normal((b, N, heads, d), dtype=np.float32)
    v = np_rng.standard_normal((b, N, heads, d), dtype=np.float32)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    bias = A.mfr_strip_bias(h, w_tile, n_tiles, radius=2, weight=1.5,
                            sigma=0.9, mode=mode)
    ref = A.xla_attention(qj, kj, vj, bias=bias[None, None])
    out = A.flash_attention_mfr(qj, kj, vj, h=h, w_tile=w_tile,
                                n_tiles=n_tiles, radius=2, weight=1.5,
                                sigma=0.9, mode=mode,
                                block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_strip_attention_cpu_fallback_matches_bias(np_rng):
    h, w_tile, n = 4, 6, 2
    N = h * n * w_tile
    q = jnp.asarray(np_rng.standard_normal((1, N, 2, 8), dtype=np.float32))
    out = A.strip_attention(q, q, q, h=h, w_strip=n * w_tile, n_tiles=n)
    bias = A.mfr_strip_bias(h, w_tile, n)[None, None]
    ref = A.xla_attention(q, q, q, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _tiny_unet():
    cfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                       attention_resolutions=(1,), num_heads=2,
                       context_dim=24)
    params = U.unet_init(jax.random.PRNGKey(0), cfg)
    # perturb the zero-init output convs (resblock out_conv, transformer
    # proj_out, final conv) — at init they make every transformer an
    # identity and the UNet output exactly 0, which would let the
    # strip-vs-plain comparison pass vacuously
    r = np.random.default_rng(7)
    params = jax.tree.map(
        lambda x: x + jnp.asarray(
            0.05 * r.standard_normal(x.shape).astype(np.float32)), params)
    return params, cfg


def test_unet_strip_matches_materialized_biases(rng):
    """unet_apply(strip=...) == unet_apply(attn_biases=materialized MFR
    bias at each layer's resolution) on a tiny 2-level model."""
    params, cfg = _tiny_unet()
    h, w_tile, n = 8, 8, 2
    x = jax.random.normal(rng, (1, h, n * w_tile, 4))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 24))
    strip = U.StripConfig(n_tiles=n, mode="target")
    out_strip, _ = U.unet_apply(params, cfg, x, t, ctx, strip=strip)

    # tiny config layer map: 0,1 encoder ds1 (h, w); 2 middle ds2;
    # 3,4,5 decoder ds1
    def bias_at(hh, wt):
        return A.mfr_strip_bias(hh, wt, n)[None, None]

    biases = {0: bias_at(h, w_tile), 1: bias_at(h, w_tile),
              2: bias_at(h // 2, w_tile // 2),
              3: bias_at(h, w_tile), 4: bias_at(h, w_tile),
              5: bias_at(h, w_tile)}
    out_bias, _ = U.unet_apply(params, cfg, x, t, ctx, attn_biases=biases)
    np.testing.assert_allclose(np.asarray(out_strip), np.asarray(out_bias),
                               rtol=1e-4, atol=1e-4)

    out_plain, _ = U.unet_apply(params, cfg, x, t, ctx)
    assert np.abs(np.asarray(out_strip) - np.asarray(out_plain)).max() > 1e-4


def test_strip_kv_capture_unchanged(rng):
    """K/V capture happens at the projections — the strip bias must not
    change captured K/V, only attention outputs."""
    params, cfg = _tiny_unet()
    x = jax.random.normal(rng, (1, 8, 16, 4))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 24))
    _, kv_plain = U.unet_apply(params, cfg, x, t, ctx)
    _, kv_strip = U.unet_apply(params, cfg, x, t, ctx,
                               strip=U.StripConfig(n_tiles=2))
    # encoder layer 0 K/V identical (first layer sees identical input);
    # deeper layers diverge because activations differ after layer 0
    np.testing.assert_allclose(np.asarray(kv_plain[0][0]),
                               np.asarray(kv_strip[0][0]), atol=1e-6)
