"""Facades + pixel-inpaint pipeline integration tests (tiny models)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.models import clip as CL
from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models import vae as V
from sd_animation_optical_flow_tpu.pipelines import facades as F
from sd_animation_optical_flow_tpu.pipelines import pixel_inpaint as PI
from sd_animation_optical_flow_tpu.pipelines.keyframes import (
    FrameGenConfig, array_frame_generator)
from sd_animation_optical_flow_tpu.pipelines.tokenizer import PromptTokenizer


def _tiny_bundle(rng, in_channels=4):
    kv, ku, kc = jax.random.split(rng, 3)
    vcfg = V.VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)
    ucfg = U.UNetConfig(in_channels=in_channels, model_channels=16,
                        channel_mult=(1, 2), attention_resolutions=(1,),
                        num_heads=2, context_dim=32)
    ccfg = CL.CLIPTextConfig(vocab_size=49408, width=32, layers=1, heads=2)
    return F.StableDiffusionBundle(
        unet_params=U.unet_init(ku, ucfg), unet_cfg=ucfg,
        vae_params=V.vae_init(kv, vcfg), vae_cfg=vcfg,
        clip_params=CL.clip_text_init(kc, ccfg), clip_cfg=ccfg,
        tokenizer=PromptTokenizer(hf_name_or_path=None))


@pytest.fixture(scope="module")
def bundles():
    rng = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(rng)
    return _tiny_bundle(k1), _tiny_bundle(k2, in_channels=9)


def test_img2img_shape_and_determinism(bundles):
    sd, _ = bundles
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3)) * 2 - 1
    out1, kv = F.img2img(sd, img, "a girl", "bad", 0.2, ddim_steps=10,
                         seed=1234, capture_kv=True)
    out2, _ = F.img2img(sd, img, "a girl", "bad", 0.2, ddim_steps=10,
                        seed=1234)
    assert out1.shape == (1, 32, 32, 3)
    assert float(jnp.abs(out1).max()) <= 1.0
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    # kv_hist: 6 transformer layers for this config (2 enc + 1 mid + 3 dec)
    assert kv is not None and len(kv) == 6
    out3, _ = F.img2img(sd, img, "a girl", "bad", 0.2, ddim_steps=10,
                        seed=999)
    assert np.abs(np.asarray(out3) - np.asarray(out1)).max() > 1e-5


def test_img2img_with_guidance(bundles):
    sd, _ = bundles
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    tgt = -img
    out, _ = F.img2img(sd, img, "x", "y", 0.3, ddim_steps=10,
                       target_img=tgt,
                       guidance_schedule_func=lambda p: 0.5, seed=1)
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_img2img_inpaint_contract(bundles):
    _, sd9 = bundles
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 2 - 1
    ref = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 2 - 1
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out, composited, init_dec, kv = F.img2img_inpaint(
        sd9, img, "x", "y", denoising_strength=0.3, ddim_steps=10,
        reference_img=ref, mask=mask, mask_blur=0, seed=1234,
        capture_kv=True)
    assert out.shape == (1, 32, 32, 3)
    assert composited.shape == (1, 32, 32, 3)
    assert init_dec.shape == (1, 32, 32, 3)
    assert kv is not None
    # compositing puts reference into masked region pre-encode
    center = np.asarray(composited[0, 14:18, 14:18])
    np.testing.assert_allclose(center, np.asarray(ref[0, 14:18, 14:18]),
                               atol=0.05)


def test_img2img_latent_inpaint(bundles):
    _, sd9 = bundles
    ref = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3)) * 2 - 1
    # this tiny VAE has 2 levels -> /2 downscale: 32x32 image -> 16x16 latent
    warped_latent = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 4))
    mask = np.ones((32, 32), np.float32)
    mask[:16] = 0.0
    out, decoded, init_dec, _ = F.img2img_latent_inpaint(
        sd9, warped_latent, ref, mask, "x", "y",
        denoising_strength=0.3, ddim_steps=10, mask_blur=2, seed=1)
    assert out.shape == (1, 32, 32, 3)
    # unmasked latent rows come from the warped latent
    np.testing.assert_allclose(np.asarray(decoded[:, :3]),
                               np.asarray(warped_latent[:, :3]), atol=1e-5)


def _synthetic_frames(n=8, h=64, w=64):
    """Moving square over gradient background, BGR uint8."""
    rng = np.random.default_rng(0)
    bg = (np.linspace(0, 255, w)[None, :, None]
          * np.ones((h, 1, 3))).astype(np.uint8)
    frames = []
    for i in range(n):
        f = bg.copy()
        x = 8 + 3 * i
        f[20:40, x:x + 12] = np.array([200, 50, 50], np.uint8)
        if i == n // 2:
            f = 255 - f          # hard scene cut -> keyframe
        frames.append(f)
    return np.stack(frames)


def test_pixel_inpaint_pipeline_end_to_end(bundles, tmp_path):
    sd, sd9 = bundles
    rng = jax.random.PRNGKey(11)
    fcfg = FC.FlowConfidenceConfig(
        raft=RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2))
    flow_est = FC.FlowConfidenceEstimator(RF.raft_init(rng, fcfg.raft), fcfg)

    frames = _synthetic_frames()
    cfg = PI.PixelInpaintConfig(size=(64, 64), keep_every=1,
                                key_frame_thres=24.0,
                                denoising_strength=0.3, ddim_steps=10)
    gen = array_frame_generator(frames, FrameGenConfig(
        size=cfg.size, keep_every=1, threshold=cfg.key_frame_thres))
    out_dir = PI.run(gen, str(tmp_path / "out"), sd, sd9, flow_est,
                     tagger=None, cfg=cfg)

    converted = sorted(p for p in os.listdir(out_dir)
                       if p.startswith("converted_"))
    assert len(converted) == len(frames)
    import cv2
    img = cv2.imread(os.path.join(out_dir, converted[0]))
    assert img.shape == (64, 64, 3)
    # vis strips and confidence maps written too
    assert any(p.startswith("vis_") for p in os.listdir(out_dir))
    assert any(p.startswith("pixel_confidence_")
               for p in os.listdir(out_dir))


def test_generate_mask_polarity():
    conf = np.ones((20, 20), np.float32)
    conf[:5] = 0.1
    logc = np.full((20, 20), -0.5, np.float32)
    mask, logc2 = PI.generate_mask(conf, logc, thres=0.95, dilate_size=3)
    assert mask.dtype == np.uint8
    assert (mask[:5] == 255).all()          # low confidence -> inpaint
    assert (mask[8:] == 0).all()            # high confidence kept
    assert (logc2[:5] == 0).all()           # reset where inpainted


def test_mix_propagated_weights():
    raw = np.full((4, 4, 3), 100, np.uint8)
    warped = np.full((4, 4, 3), 200, np.uint8)
    mask = np.zeros((4, 4), np.uint8)
    out = PI.mix_propagated_ai_frame(raw, warped, mask, weight=1.0)
    assert (out == 200).all()               # unmasked -> propagated pixels
    out0 = PI.mix_propagated_ai_frame(raw, warped, mask, weight=0.0)
    assert (out0 == 100).all()              # weight 0 -> raw frame


def test_img2img_inpaint_batch_matches_sequential(bundles):
    """The batched facade must reproduce B sequential fixed-seed calls
    (noise tiling + identical key splits)."""
    _, sd9 = bundles
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)) * 2 - 1
    refs = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)) * 2 - 1
    masks = np.zeros((2, 32, 32), np.float32)
    masks[0, 8:20, 4:28] = 1.0
    masks[1, 2:10, 2:30] = 1.0
    prompts = ["a girl", "a boy"]

    batched = F.img2img_inpaint_batch(
        sd9, imgs, prompts, "bad", jnp.asarray(masks), refs,
        denoising_strength=0.3, ddim_steps=10, mask_blur=4, seed=1234)

    for i in range(2):
        out_i, _, _, _ = F.img2img_inpaint(
            sd9, imgs[i:i + 1], prompts[i], "bad",
            denoising_strength=0.3, ddim_steps=10,
            reference_img=refs[i:i + 1], mask=jnp.asarray(masks[i]),
            mask_blur=4, seed=1234)
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(out_i[0]), atol=2e-5,
                                   err_msg=f"frame {i}")


def test_run_batched_matches_run(bundles, tmp_path):
    """Segment-batched pipeline writes the same converted frames as the
    sequential pipeline."""
    import cv2
    sd, sd9 = bundles
    rng = jax.random.PRNGKey(11)
    fcfg = FC.FlowConfidenceConfig(
        raft=RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2))
    flow_est = FC.FlowConfidenceEstimator(RF.raft_init(rng, fcfg.raft), fcfg)
    frames = _synthetic_frames()
    cfg = PI.PixelInpaintConfig(size=(64, 64), keep_every=1,
                                denoising_strength=0.3, ddim_steps=10,
                                write_vis=False, frame_batch=2)
    mk_gen = lambda: array_frame_generator(frames, FrameGenConfig(
        size=cfg.size, keep_every=1, threshold=cfg.key_frame_thres))
    d_seq = PI.run(mk_gen(), str(tmp_path / "seq"), sd, sd9, flow_est,
                   None, cfg)
    d_bat = PI.run_batched(mk_gen(), str(tmp_path / "bat"), sd, sd9,
                           flow_est, None, cfg)
    names = sorted(p for p in os.listdir(d_seq)
                   if p.startswith("converted_"))
    assert names == sorted(p for p in os.listdir(d_bat)
                           if p.startswith("converted_"))
    for n in names:
        a = cv2.imread(os.path.join(d_seq, n)).astype(np.int16)
        b = cv2.imread(os.path.join(d_bat, n)).astype(np.int16)
        # identical math modulo one uint8 rounding step
        assert np.abs(a - b).max() <= 1, n


def test_img2img_pixel_space_guidance(bundles):
    """noised_blending pixel-space guidance (guided_ldm.py:92-118):
    runs, stays finite/bounded, and actually differs from latent-space
    guidance with the same inputs."""
    sd, _ = bundles
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32)) * 2 - 1
    tgt = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32)) * 2 - 1
    kw = dict(denoising_strength=0.3, ddim_steps=10, seed=1234,
              target_img=tgt, guidance_schedule_func=lambda p: 0.4)
    out_px, _ = F.img2img(sd, img, "a girl", "bad",
                          guidance_space="pixel", **kw)
    out_lat, _ = F.img2img(sd, img, "a girl", "bad",
                           guidance_space="latent", **kw)
    assert out_px.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out_px)).all()
    assert float(jnp.abs(out_px).max()) <= 1.0
    assert np.abs(np.asarray(out_px) - np.asarray(out_lat)).max() > 1e-4


def test_img2img_dpmpp_sampler(bundles):
    sd, sd9 = bundles
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32)) * 2 - 1
    out_dpm, _ = F.img2img(sd, img, "a girl", "bad", 0.3, ddim_steps=10,
                           seed=1234, sampler="dpmpp")
    out_ddim, _ = F.img2img(sd, img, "a girl", "bad", 0.3, ddim_steps=10,
                            seed=1234)
    assert out_dpm.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out_dpm)).all()
    assert np.abs(np.asarray(out_dpm) - np.asarray(out_ddim)).max() > 1e-5

    # inpaint path with dpmpp: runs and preserves the known region
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    ref = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32)) * 2 - 1
    out_i, comp, _, _ = F.img2img_inpaint(
        sd9, img, "a girl", "bad", denoising_strength=0.3, ddim_steps=10,
        reference_img=ref, mask=jnp.asarray(mask), mask_blur=0,
        sampler="dpmpp", want_init_decoded=False)
    assert np.isfinite(np.asarray(out_i)).all()


def test_txt2img_and_inversion(bundles):
    """txt2img generates from pure noise (full ddim chain); inversion
    (ddim.py:253-298 encode) round-trips an image to a finite latent of
    the same shape."""
    sd, _ = bundles
    img = F.txt2img(sd, "a b c", "", height=64, width=64, ddim_steps=4,
                    cfg_scale=3.0, seed=7)
    assert img.shape == (1, 64, 64, 3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.min() >= -1.0 and a.max() <= 1.0
    # determinism under the same seed
    img2 = F.txt2img(sd, "a b c", "", height=64, width=64, ddim_steps=4,
                     cfg_scale=3.0, seed=7)
    np.testing.assert_array_equal(a, np.asarray(img2))

    src = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 2 - 1,
                      jnp.float32)
    lat = F.img2img_invert(sd, src, "a b c", t_enc=3, ddim_steps=4)
    assert lat.shape == (1, 32, 32, 4)   # tiny VAE is /2
    assert np.isfinite(np.asarray(lat)).all()


def test_img2img_deepcache_knob(bundles):
    """Facade-level DeepCache: interval=1 equals the default path (the
    split forward is the identical function); interval=2 runs and stays
    finite."""
    sd, _ = bundles
    img = jnp.asarray(np.random.RandomState(5).rand(1, 64, 64, 3) * 2 - 1,
                      jnp.float32)
    base, _ = F.img2img(sd, img, "a b", "", 0.5, ddim_steps=8, seed=3)
    dc1, _ = F.img2img(sd, img, "a b", "", 0.5, ddim_steps=8, seed=3,
                       deepcache_interval=1)
    np.testing.assert_allclose(np.asarray(base), np.asarray(dc1),
                               rtol=3e-5, atol=3e-5)
    dc2, _ = F.img2img(sd, img, "a b", "", 0.5, ddim_steps=8, seed=3,
                       deepcache_interval=2)
    assert np.isfinite(np.asarray(dc2)).all()


def test_cfg_stem_dedup_unet_parity(bundles):
    """context_pair (CFG stem dedup) must reproduce the doubled-batch
    forward: the [uncond|cond] halves are bit-identical until the first
    cross-attention, so running the stem once is exact math, not an
    approximation."""
    sd, _ = bundles
    rng = jax.random.PRNGKey(11)
    kx, ku, kc = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (2, 8, 8, 4), jnp.float32)
    ctx_u = jax.random.normal(ku, (2, 5, 32), jnp.float32)
    ctx_c = jax.random.normal(kc, (2, 5, 32), jnp.float32)
    t = jnp.full((2,), 421, jnp.int32)

    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0)
    ref, _ = U.unet_apply(sd.unet_params, sd.unet_cfg, x2, t2, ctx2)
    out, _ = U.unet_apply(sd.unet_params, sd.unet_cfg, x, t, None,
                          context_pair=(ctx_u, ctx_c))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cfg_stem_dedup_strip_parity(bundles):
    """Stem dedup under an MFR strip must reproduce the doubled-batch
    strip forward: the band bias is purely positional, so the CFG
    halves stay bit-identical through the stem (the config-5 win — at
    512x1536 strips the stem holds the largest L0 self-attention)."""
    sd, _ = bundles
    rng = jax.random.PRNGKey(13)
    kx, ku, kc, kp = jax.random.split(rng, 4)
    # perturb the zero-init output convs: a raw random UNet's attention
    # contributes exactly 0, which would hide the band bias (see the
    # verify-skill note on MFR probes)
    up = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(kp, a.shape, a.dtype),
        sd.unet_params)
    x = jax.random.normal(kx, (1, 8, 16, 4), jnp.float32)  # 2-tile strip
    ctx_u = jax.random.normal(ku, (1, 5, 32), jnp.float32)
    ctx_c = jax.random.normal(kc, (1, 5, 32), jnp.float32)
    t = jnp.full((1,), 377, jnp.int32)
    strip = U.StripConfig(n_tiles=2, mode="target")

    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0)
    ref, _ = U.unet_apply(up, sd.unet_cfg, x2, t2, ctx2, strip=strip)
    out, _ = U.unet_apply(up, sd.unet_cfg, x, t, None,
                          strip=strip, context_pair=(ctx_u, ctx_c))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and the bias actually biased something: differs from no-strip
    plain, _ = U.unet_apply(up, sd.unet_cfg, x, t, None,
                            context_pair=(ctx_u, ctx_c))
    assert not np.allclose(np.asarray(out), np.asarray(plain))


def test_cfg_stem_dedup_facade_parity(bundles):
    """The facade auto-enables dedup; the full decode must match a run
    with dedup force-disabled (via a knob that falls back: cfg_interval
    keeps plain doubling... so compare against capture_kv run which also
    dedups — instead compare img2img against the dpmpp-free explicit
    doubled path by monkeypatching)."""
    sd, _ = bundles
    from sd_animation_optical_flow_tpu.diffusion import ddim as D

    img = jnp.asarray(np.random.RandomState(9).rand(1, 64, 64, 3) * 2 - 1,
                      jnp.float32)
    out_dedup, _ = F.img2img(sd, img, "a b", "", 0.5, ddim_steps=6, seed=3)

    orig = D.cfg_model_call

    def no_dedup(*args, **kw):
        kw["dedup"] = False
        return orig(*args, **kw)

    try:
        D.cfg_model_call = no_dedup
        F._img2img_core.clear_cache()
        out_plain, _ = F.img2img(sd, img, "a b", "", 0.5, ddim_steps=6,
                                 seed=3)
    finally:
        D.cfg_model_call = orig
        F._img2img_core.clear_cache()
    np.testing.assert_allclose(np.asarray(out_dedup), np.asarray(out_plain),
                               rtol=2e-4, atol=2e-4)
