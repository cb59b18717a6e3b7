"""ControlNet model + sampler wiring tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.models import controlnet as CN
from sd_animation_optical_flow_tpu.models import unet as U


@pytest.fixture(scope="module")
def small():
    cfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                       attention_resolutions=(1,), num_heads=2,
                       context_dim=32)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    return (cfg, U.unet_init(k1, cfg), CN.controlnet_init(k2, cfg))


def test_controlnet_residual_shapes(small):
    cfg, _, cn = small
    x = jnp.zeros((2, 8, 8, 4))
    hint = jnp.zeros((2, 64, 64, 3))      # stride-8 hint encoder
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, 32))
    res = CN.controlnet_apply(cn, cfg, x, hint, t, ctx)
    # blocks: conv, res, res, down, res, res -> 6 zero convs + middle = 7
    assert len(res) == 7
    assert res[0].shape == (2, 8, 8, 16)
    assert res[-1].shape == (2, 4, 4, 32)     # middle at ds=2


def test_zero_init_controlnet_residuals_are_zero(small):
    cfg, _, cn = small
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    res = CN.controlnet_apply(cn, cfg, x, hint, jnp.zeros((2,), jnp.int32),
                              jax.random.normal(jax.random.PRNGKey(3),
                                                (2, 7, 32)))
    # zero convs are zero-initialized -> residuals are exactly zero until
    # trained/ported (the ControlNet "do no harm at init" property)
    for r in res:
        np.testing.assert_allclose(np.asarray(r), 0.0)


def test_unet_consumes_control_residuals(small):
    cfg, unet_p, cn = small
    # the UNet out-conv is zero-init (SD convention) -> randomize it so
    # internal changes are visible at the output
    unet_p = jax.tree.map(lambda v: v, unet_p)
    unet_p["out"] = dict(unet_p["out"])
    unet_p["out"]["conv"] = {
        "w": jax.random.normal(jax.random.PRNGKey(42),
                               unet_p["out"]["conv"]["w"].shape) * 0.02,
        "b": jnp.zeros_like(unet_p["out"]["conv"]["b"]),
    }
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4))
    t = jnp.full((2,), 10, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 32))
    base, _ = U.unet_apply(unet_p, cfg, x, t, ctx)
    # matching-shape nonzero residuals must change the output
    hs_shapes = [(2, 8, 8, 16), (2, 8, 8, 16), (2, 8, 8, 16),
                 (2, 4, 4, 16), (2, 4, 4, 32), (2, 4, 4, 32)]
    control = tuple(jnp.ones(s) * 0.1 for s in hs_shapes) + \
        (jnp.ones((2, 4, 4, 32)) * 0.1,)
    out, _ = U.unet_apply(unet_p, cfg, x, t, ctx, control=control)
    assert np.abs(np.asarray(out - base)).max() > 1e-4


def test_control_step_weights_windowing(small):
    cfg, _, cn = small
    specs = [CN.ControlSpec(cn, cfg, np.zeros((1, 8, 8, 3)), weight=0.7,
                            guidance_start=0.0, guidance_end=0.5),
             CN.ControlSpec(cn, cfg, np.zeros((1, 8, 8, 3)), weight=0.3)]
    prog = np.asarray([0.2, 0.4, 0.6, 0.9])
    w = CN.control_step_weights(specs, prog)
    np.testing.assert_allclose(w[:, 0], [0.7, 0.7, 0.0, 0.0])
    np.testing.assert_allclose(w[:, 1], [0.3, 0.3, 0.3, 0.3])


def test_preprocessors():
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = 255
    c = CN.canny_hint(img, 100, 200, batch=2)
    assert c.shape == (2, 32, 32, 3) and c.max() == 1.0
    h = CN.hed_hint(img, None, batch=2)
    assert h.shape == (2, 32, 32, 3) and 0 <= h.min() and h.max() <= 1.0
    mask = np.zeros((32, 32), np.uint8)
    mask[:16] = 255
    ip = CN.inpaint_hint(img, mask, batch=1)
    assert ip.shape == (1, 32, 32, 3)
    assert ip.min() == -1.0


def test_facade_with_controlnet(small):
    from tests.test_pipeline import _tiny_bundle
    from sd_animation_optical_flow_tpu.pipelines import facades as F
    cfg, _, cn = small
    sd = _tiny_bundle(jax.random.PRNGKey(9))
    img = jax.random.uniform(jax.random.PRNGKey(6), (1, 32, 32, 3)) * 2 - 1
    # hint must be 8x the latent resolution (stride-8 hint encoder); the
    # tiny test VAE downscales /2, so latent 16x16 -> hint 128x128
    hint = np.zeros((2, 128, 128, 3), np.float32)
    spec = CN.ControlSpec(cn, cfg, hint, weight=0.7, guidance_start=0.0,
                          guidance_end=1.0)
    out, _ = F.img2img(sd, img, "a", "b", 0.3, ddim_steps=8, seed=1,
                       control_specs=[spec])
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_hed_network_and_port_roundtrip():
    """In-repo HED annotator (reference controlnet.py:339,349 external
    dep): forward shapes, apply_hed uint8 contract, and a port round-trip
    from a synthetic torch-layout state dict."""
    import numpy as np
    import jax
    from sd_animation_optical_flow_tpu.models import hed as HED

    params = HED.hed_init(jax.random.PRNGKey(0))
    img = (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8)
    edge = HED.hed_edges(params, img)
    assert edge.shape == (64, 96) and edge.dtype == np.uint8

    # synthetic torch-layout state dict -> port -> identical output
    rng = np.random.RandomState(1)
    sd = {"norm": rng.randn(1, 3, 1, 1).astype(np.float32)}
    blocks = ((3, 64, 2), (64, 128, 2), (128, 256, 3),
              (256, 512, 3), (512, 512, 3))
    for i, (cin, cout, n) in enumerate(blocks, start=1):
        ch = cin
        for j in range(n):
            sd[f"block{i}.convs.{j}.weight"] = \
                rng.randn(cout, ch, 3, 3).astype(np.float32) * 0.05
            sd[f"block{i}.convs.{j}.bias"] = \
                rng.randn(cout).astype(np.float32) * 0.05
            ch = cout
        sd[f"block{i}.projection.weight"] = \
            rng.randn(1, cout, 1, 1).astype(np.float32) * 0.05
        sd[f"block{i}.projection.bias"] = rng.randn(1).astype(np.float32)
    ported = HED.port_hed(sd)
    edge2 = HED.hed_edges(ported, img)
    assert edge2.shape == (64, 96)
    # hed_fn plumbs into the hint builder
    from sd_animation_optical_flow_tpu.models.controlnet import hed_hint
    hint = hed_hint(img, HED.make_hed_fn(ported), batch=2)
    assert hint.shape[0] == 2
