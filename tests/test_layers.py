"""Numerical parity of core layers against torch (CPU) reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sd_animation_optical_flow_tpu.models import layers as L


def test_conv2d_matches_torch(np_rng):
    x = np_rng.standard_normal((2, 9, 11, 5), dtype=np.float32)
    w = np_rng.standard_normal((3, 3, 5, 7), dtype=np.float32)
    b = np_rng.standard_normal(7, dtype=np.float32)
    y = L.conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                 jnp.asarray(x), padding=1)
    yt = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                  torch.from_numpy(w).permute(3, 2, 0, 1),
                  torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(np.asarray(y),
                               yt.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_stride2_asymmetric_pad(np_rng):
    # the VAE downsample pads (0,1,0,1) then convs stride 2
    x = np_rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    w = np_rng.standard_normal((3, 3, 4, 4), dtype=np.float32)
    y = L.conv2d({"w": jnp.asarray(w)}, jnp.asarray(x), stride=2,
                 padding=((0, 1), (0, 1)))
    xt = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (0, 1, 0, 1))
    yt = F.conv2d(xt, torch.from_numpy(w).permute(3, 2, 0, 1), stride=2)
    np.testing.assert_allclose(np.asarray(y),
                               yt.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)
    assert y.shape == (1, 4, 4, 4)


def test_group_norm_matches_torch(np_rng):
    x = np_rng.standard_normal((2, 6, 6, 32), dtype=np.float32)
    scale = np_rng.standard_normal(32, dtype=np.float32)
    bias = np_rng.standard_normal(32, dtype=np.float32)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    y = L.group_norm(p, jnp.asarray(x), num_groups=8, eps=1e-6)
    yt = F.group_norm(torch.from_numpy(x).permute(0, 3, 1, 2), 8,
                      torch.from_numpy(scale), torch.from_numpy(bias),
                      eps=1e-6)
    np.testing.assert_allclose(np.asarray(y),
                               yt.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_layer_norm_matches_torch(np_rng):
    x = np_rng.standard_normal((2, 5, 16), dtype=np.float32)
    scale = np_rng.standard_normal(16, dtype=np.float32)
    bias = np_rng.standard_normal(16, dtype=np.float32)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    y = L.layer_norm(p, jnp.asarray(x))
    yt = F.layer_norm(torch.from_numpy(x), (16,),
                      torch.from_numpy(scale), torch.from_numpy(bias))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_torch(np_rng):
    x = np_rng.standard_normal((2, 7, 9, 6), dtype=np.float32)
    y = L.instance_norm(None, jnp.asarray(x))
    yt = F.instance_norm(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(y),
                               yt.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_timestep_embedding_cos_sin_order():
    # reference concatenates [cos|sin] (util.py:154-174)
    t = jnp.asarray([0.0, 100.0])
    emb = L.timestep_embedding(t, 8)
    assert emb.shape == (2, 8)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0, atol=1e-6)


def test_avg_pool_and_upsample(np_rng):
    x = np_rng.standard_normal((1, 4, 4, 3), dtype=np.float32)
    y = L.avg_pool2d(jnp.asarray(x), 2)
    yt = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    np.testing.assert_allclose(np.asarray(y),
                               yt.permute(0, 2, 3, 1).numpy(), rtol=1e-5)
    up = L.nearest_upsample2x(jnp.asarray(x))
    upt = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        scale_factor=2, mode="nearest")
    np.testing.assert_allclose(np.asarray(up),
                               upt.permute(0, 2, 3, 1).numpy(), rtol=1e-6)


def test_upsample2x_conv_matches_upsample_then_conv(np_rng):
    # the fused subpixel form must reproduce conv2d(nearest_upsample2x(x))
    # (sums of pre-added weights — exact modulo f32 rounding)
    import jax
    x = np_rng.standard_normal((2, 5, 7, 6), dtype=np.float32)
    p = L.conv2d_init(jax.random.PRNGKey(3), 6, 4, 3)
    ref = L.conv2d(p, L.nearest_upsample2x(jnp.asarray(x)))
    out = L.upsample2x_conv(p, jnp.asarray(x))
    assert out.shape == ref.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
