"""Tests for the LatentDiffusion specialization facades
(pipelines/specializations.py): depth2img and latent upscaling, plus
the UNet class/adm conditioning they rely on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.models import clip as CL
from sd_animation_optical_flow_tpu.models import depth as DP
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models import vae as V
from sd_animation_optical_flow_tpu.pipelines import facades as F
from sd_animation_optical_flow_tpu.pipelines import specializations as SP
from sd_animation_optical_flow_tpu.pipelines.tokenizer import PromptTokenizer


def _tiny_bundle(rng, in_channels=4, num_classes=None):
    kv, ku, kc = jax.random.split(rng, 3)
    vcfg = V.VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)
    ucfg = U.UNetConfig(in_channels=in_channels, model_channels=16,
                        channel_mult=(1, 2), attention_resolutions=(1,),
                        num_heads=2, context_dim=32,
                        num_classes=num_classes)
    ccfg = CL.CLIPTextConfig(vocab_size=49408, width=32, layers=1, heads=2)
    return F.StableDiffusionBundle(
        unet_params=U.unet_init(ku, ucfg), unet_cfg=ucfg,
        vae_params=V.vae_init(kv, vcfg), vae_cfg=vcfg,
        clip_params=CL.clip_text_init(kc, ccfg), clip_cfg=ccfg,
        tokenizer=PromptTokenizer(hf_name_or_path=None))


def _tiny_depth(rng):
    cfg = DP.DPTConfig(patch=8, width=32, layers=4, heads=4,
                       hooks=(0, 1, 2, 3), reassemble_ch=(8, 16, 32, 32),
                       features=8, img_size=64)
    return SP.DepthConditioner(params=DP.dpt_init(rng, cfg), cfg=cfg)


# ---------------------------------------------------------------------------
# UNet class conditioning
# ---------------------------------------------------------------------------

def _dezero(params, seed=0):
    """SD zero-inits its output convs, which silences every residual
    path (including the emb pathway) at random init; fill zeros with
    small randoms so conditioning effects are observable."""
    leaves, treedef = jax.tree.flatten(params)
    out, key = [], jax.random.PRNGKey(seed)
    for leaf in leaves:
        key, k = jax.random.split(key)
        out.append(jnp.where(jnp.all(leaf == 0),
                             jax.random.normal(k, leaf.shape) * 0.02, leaf))
    return jax.tree.unflatten(treedef, out)


def test_unet_class_conditioning_changes_output(rng):
    # model_channels must exceed 32 here: smaller widths make GroupNorm
    # degenerate to 1-channel groups, which exactly cancel the
    # per-channel time/label embedding shift
    cfg = U.UNetConfig(in_channels=4, model_channels=64, channel_mult=(1,),
                       attention_resolutions=(), num_heads=2,
                       context_dim=32, num_classes=10)
    params = _dezero(U.unet_init(rng, cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    t = jnp.array([5])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32))
    y0, _ = U.unet_apply(params, cfg, x, t, ctx, y=jnp.array([0]))
    y1, _ = U.unet_apply(params, cfg, x, t, ctx, y=jnp.array([7]))
    assert y0.shape == (1, 8, 8, 4)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-6


def test_unet_class_conditioning_requires_y(rng):
    cfg = U.UNetConfig(in_channels=4, model_channels=16, channel_mult=(1,),
                       attention_resolutions=(), num_heads=2,
                       context_dim=32, num_classes=4)
    params = U.unet_init(rng, cfg)
    x = jnp.zeros((1, 8, 8, 4))
    with pytest.raises(AssertionError):
        U.unet_apply(params, cfg, x, jnp.array([1]),
                     jnp.zeros((1, 4, 32)))


def test_unet_unconditional_has_no_label_table(rng):
    cfg = U.UNetConfig(in_channels=4, model_channels=16, channel_mult=(1,),
                       attention_resolutions=(), num_heads=2, context_dim=32)
    params = U.unet_init(rng, cfg)
    assert "label_emb" not in params


# ---------------------------------------------------------------------------
# depth2img
# ---------------------------------------------------------------------------

def test_depth2img_end_to_end(rng):
    k1, k2 = jax.random.split(rng)
    sd = _tiny_bundle(k1, in_channels=5)
    depth = _tiny_depth(k2)
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 2 - 1
    out, kv = SP.img2img_depth2img(sd, depth, img, "a girl", "bad",
                                   denoising_strength=0.3, ddim_steps=6)
    assert out.shape == (1, 32, 32, 3)
    assert float(jnp.abs(out).max()) <= 1.0
    assert np.isfinite(np.asarray(out)).all()


def test_depth2img_rejects_4ch_unet(rng):
    k1, k2 = jax.random.split(rng)
    sd = _tiny_bundle(k1, in_channels=4)
    depth = _tiny_depth(k2)
    img = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(AssertionError):
        SP.img2img_depth2img(sd, depth, img, "a", "b")


def test_depth2img_depth_sensitivity(rng):
    """Different input content -> different depth concat -> different
    output (the conditioning is actually wired through)."""
    k1, k2 = jax.random.split(rng)
    sd = _tiny_bundle(k1, in_channels=5)
    depth = _tiny_depth(k2)
    # a tiny random-init DPT's relu head can clip to a constant; bias it
    # positive so the depth map actually varies with the input
    depth.params["head"][2]["b"] = jnp.array([0.5])
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 2 - 1
    grad_img = jnp.broadcast_to(
        jnp.linspace(-1, 1, 32)[None, :, None, None], (1, 32, 32, 3))
    cc1 = SP._depth_concat_jit(depth.params, depth.cfg, img, (16, 16))
    cc2 = SP._depth_concat_jit(depth.params, depth.cfg, grad_img, (16, 16))
    assert cc1.shape == (1, 16, 16, 1)
    assert np.abs(np.asarray(cc1) - np.asarray(cc2)).max() > 1e-4


# ---------------------------------------------------------------------------
# latent upscaling
# ---------------------------------------------------------------------------

def test_upscale_end_to_end(rng):
    sd = _tiny_bundle(rng, in_channels=7, num_classes=1000)
    x_low = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3)) * 2 - 1
    out, lvl = SP.upscale(sd, x_low, "a", "b", ddim_steps=4,
                          max_noise_level=100)
    # tiny VAE here is x2, so 16 -> 32 (SD's real VAE gives x8)
    assert out.shape == (1, 32, 32, 3)
    assert lvl.shape == (1,)
    assert 0 <= int(lvl[0]) < 100
    assert np.isfinite(np.asarray(out)).all()


def test_upscale_fixed_noise_level_deterministic(rng):
    sd = _tiny_bundle(rng, in_channels=7, num_classes=1000)
    x_low = jax.random.uniform(jax.random.PRNGKey(4), (1, 16, 16, 3)) * 2 - 1
    lvl = jnp.array([42], jnp.int32)
    o1, l1 = SP.upscale(sd, x_low, "a", "b", noise_level=lvl, ddim_steps=4)
    o2, l2 = SP.upscale(sd, x_low, "a", "b", noise_level=lvl, ddim_steps=4)
    assert int(l1[0]) == 42 and int(l2[0]) == 42
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_upscale_guard_rails(rng):
    sd4 = _tiny_bundle(rng, in_channels=4)
    with pytest.raises(AssertionError):
        SP.upscale(sd4, jnp.zeros((1, 8, 8, 3)), "a", "b")
    sd7 = _tiny_bundle(rng, in_channels=7)   # not class-conditional
    with pytest.raises(AssertionError):
        SP.upscale(sd7, jnp.zeros((1, 8, 8, 3)), "a", "b")
