"""cv2 parity for resize / warp / filters — the 40 dB gate foundations."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.ops import filters as FL
from sd_animation_optical_flow_tpu.ops import resize as R
from sd_animation_optical_flow_tpu.ops import warp as W


def _psnr(a, b, peak=255.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak ** 2 / mse)


@pytest.fixture
def img(np_rng):
    # smooth-ish test image (pure noise overstates interpolation deltas)
    base = np_rng.uniform(0, 255, (40, 56, 3)).astype(np.float32)
    return cv2.GaussianBlur(base, (0, 0), 2.0)


def test_resize_linear_matches_cv2(img):
    out = R.resize(jnp.asarray(img), (29, 37), "linear")
    ref = cv2.resize(img, (37, 29), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.51)


def test_resize_cubic_matches_cv2(img):
    out = R.resize(jnp.asarray(img), (61, 83), "cubic")
    ref = cv2.resize(img, (83, 61), interpolation=cv2.INTER_CUBIC)
    assert _psnr(np.asarray(out), ref) > 45


def test_resize_area_matches_cv2(img):
    out = R.resize(jnp.asarray(img), (20, 28), "area")
    ref = cv2.resize(img, (28, 20), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.51)


def test_resize_lanczos_matches_cv2(img):
    out = R.resize(jnp.asarray(img), (80, 112), "lanczos4")
    ref = cv2.resize(img, (112, 80), interpolation=cv2.INTER_LANCZOS4)
    assert _psnr(np.asarray(out), ref) > 40


def test_warp_frame_matches_cv2_remap(img, np_rng):
    h, w = img.shape[:2]
    flow = (np_rng.uniform(-3, 3, (h, w, 2))).astype(np.float32)
    flow = cv2.GaussianBlur(flow, (0, 0), 3.0)
    out = W.warp_frame(jnp.asarray(img), jnp.asarray(flow))
    # reference contract (pdcnet_of.py:34-42)
    mapx = flow[..., 0] + np.arange(w, dtype=np.float32)[None]
    mapy = flow[..., 1] + np.arange(h, dtype=np.float32)[:, None]
    ref = cv2.remap(img, mapx, mapy, cv2.INTER_CUBIC)
    # cv2.remap quantizes fractional coords to 1/32 px; compare by PSNR
    assert _psnr(np.asarray(out), ref) > 40


def test_warp_zero_flow_is_identity(img):
    flow = jnp.zeros(img.shape[:2] + (2,), jnp.float32)
    out = W.warp_frame(jnp.asarray(img), flow)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-2)


def test_warp_border_constant_zero(img):
    # flow pushing all samples far out of the image -> zeros
    flow = jnp.full(img.shape[:2] + (2,), 1e4, jnp.float32)
    out = W.warp_frame(jnp.asarray(img), flow)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_warp_frame_latent_roundtrip(np_rng):
    lat = np_rng.standard_normal((8, 12, 4)).astype(np.float32)
    flow = np.zeros((64, 96, 2), np.float32)
    out = W.warp_frame_latent(jnp.asarray(lat), jnp.asarray(flow))
    assert out.shape == lat.shape
    # zero flow -> cubic up+down resize roundtrip stays close
    assert np.abs(np.asarray(out) - lat).mean() < 0.08


def test_gaussian_blur_matches_cv2(img):
    out = FL.gaussian_blur(jnp.asarray(img), 2.0, ksize=13)
    ref = cv2.GaussianBlur(img, (13, 13), 2.0)
    # border handling differs (replicate vs reflect101); check interior
    np.testing.assert_allclose(np.asarray(out)[8:-8, 8:-8],
                               ref[8:-8, 8:-8], atol=0.2)


def test_dilate_matches_cv2(np_rng):
    mask = (np_rng.uniform(size=(40, 50)) > 0.95).astype(np.uint8) * 255
    kern = FL.ellipse_kernel(7)
    out = FL.dilate(jnp.asarray(mask), kern)
    ref = cv2.dilate(mask, kern.astype(np.uint8))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_unsharp_matches_reference_formula(img):
    out = FL.unsharp(jnp.asarray(img))
    g = cv2.GaussianBlur(img, (0, 0), 2.0)
    ref = cv2.addWeighted(img, 1.3, g, -0.3, 0)
    np.testing.assert_allclose(np.asarray(out)[8:-8, 8:-8],
                               ref[8:-8, 8:-8], atol=0.35)


def test_flow_travel_distance_gating(np_rng):
    flow = np.ones((10, 10, 2), np.float32) * 3.0
    conf = np.ones((10, 10), np.float32)
    conf[:5] = 0.5
    v = W.flow_travel_distance(jnp.asarray(flow), jnp.asarray(conf))
    assert np.allclose(np.asarray(v)[:5], 0.0)
    assert np.allclose(np.asarray(v)[5:], np.sqrt(18.0), rtol=1e-5)


def test_fill_masked_fills_hole_with_surrounding_color():
    from sd_animation_optical_flow_tpu.ops.filters import fill_masked
    # uniform gray image with a hole: the fill must reproduce the gray
    img = jnp.full((1, 32, 32, 3), 0.25)
    mask = np.zeros((1, 32, 32), np.float32)
    mask[0, 10:22, 10:22] = 1.0
    out = fill_masked(img, jnp.asarray(mask))
    assert out.shape == img.shape
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-3)


def test_fill_masked_keeps_known_pixels():
    from sd_animation_optical_flow_tpu.ops.filters import fill_masked
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 24, 24, 3), dtype=np.float32))
    mask = np.zeros((1, 24, 24), np.float32)
    mask[0, 4:9, 4:9] = 1.0
    out = np.asarray(fill_masked(img, jnp.asarray(mask)))
    known = mask[0] == 0
    # known pixels survive (final radius-0 layer composites them on top)
    np.testing.assert_allclose(out[0][known], np.asarray(img)[0][known],
                               atol=1e-3)
    # hole pixels take plausible values from the image range
    hole = out[0][mask[0] == 1]
    assert hole.min() >= -0.1 and hole.max() <= 1.1
