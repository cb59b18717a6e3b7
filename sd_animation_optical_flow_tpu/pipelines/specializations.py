"""LatentDiffusion specializations: depth2img and latent upscaling.

Capabilities-parity with the reference's dormant LatentDiffusion
subclasses (reference: ldm/models/diffusion/ddpm.py:1426-1869 —
LatentUpscaleDiffusion, LatentFinetuneDiffusion concat machinery,
LatentDepth2ImageDiffusion, LatentUpscaleFinetuneDiffusion;
LatentInpaintDiffusion's masked-image+mask concat keys are already the
inpaint facades' ``build_inpaint_conditioning``).

TPU shapes: both facades compile to one scanned program each; the depth
model runs in the same jit island as the sampler so the whole
frame stays on-device.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..diffusion import ddim as D
from ..diffusion.schedule import make_ddim_params_traced
from ..diffusion import upscaling as UP
from ..models import depth as DP
from ..models import unet as U
from ..models import vae as V
from .facades import StableDiffusionBundle, _img2img_core, _t_enc


# ---------------------------------------------------------------------------
# depth2img (LatentDepth2ImageDiffusion, ddpm.py:1756-1807)
# ---------------------------------------------------------------------------

@dataclass
class DepthConditioner:
    """The depth stage (instantiate_from_config(depth_stage_config)
    equivalent): a DPT model whose output becomes the 5th UNet input
    channel."""
    params: dict
    cfg: DP.DPTConfig


@functools.partial(jax.jit, static_argnames=("cfg", "latent_hw"))
def _depth_concat_jit(params, cfg, img, latent_hw):
    img01 = (img + 1.0) * 0.5
    depth = DP.dpt_apply(params, cfg, DP.midas_normalize(img01, cfg))
    return DP.depth_to_concat(depth, latent_hw)


def img2img_depth2img(sd: StableDiffusionBundle, depth: DepthConditioner,
                      img, c_text: str, uc_text: str,
                      denoising_strength: float = 0.5,
                      ddim_steps: int = 50, cfg_scale: float = 7.0,
                      seed: int = 1234, capture_kv: bool = False):
    """Depth-conditioned img2img: run the DPT stage on the input frame,
    min-max normalize + resize its depth to latent res (ddpm.py:1782-1790)
    and concat it as the hybrid conditioning channel. Requires a 5-channel
    UNet (in_channels = 4 latent + 1 depth). Returns (image, kv_hist)."""
    assert sd.unet_cfg.in_channels == 5, \
        "depth2img needs a 5-channel UNet (4 latent + 1 depth)"
    rng = jax.random.PRNGKey(seed)
    k_enc, k_core = jax.random.split(rng)
    ctx_c = sd.get_learned_conditioning(c_text)
    ctx_u = sd.get_learned_conditioning(uc_text)
    init_latent = sd.encode_image(img, k_enc)
    lat_hw = tuple(init_latent.shape[1:3])
    c_concat = _depth_concat_jit(depth.params, depth.cfg,
                                 jnp.asarray(img, jnp.float32), lat_hw)
    t_enc = _t_enc(denoising_strength, ddim_steps)
    out, _, kv = _img2img_core(
        sd.unet_params, sd.unet_cfg, sd.vae_params, sd.vae_cfg, sd.sched,
        init_latent, ctx_c, ctx_u, c_concat.astype(sd.dtype),
        jnp.zeros_like(init_latent),
        jnp.zeros((max(t_enc, 1), 1, 1, 1, 1), jnp.float32),
        None, None, None, k_core, None, None,
        t_enc=t_enc, ddim_steps=ddim_steps,
        parameterization=sd.parameterization, cfg_scale=cfg_scale,
        capture_kv=capture_kv, use_inpaint=False, use_guidance=False,
        final_composite=False)
    return out, kv


# ---------------------------------------------------------------------------
# latent upscaling (LatentUpscaleDiffusion, ddpm.py:1426-1524)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "vae_cfg", "ddim_steps",
                     "parameterization", "cfg_scale", "max_noise_level"))
def _upscale_core(unet_params, unet_cfg, vae_params, vae_cfg, sched,
                  low_sched, x_low, ctx_cond, ctx_uncond, noise_level, rng,
                  *, ddim_steps, parameterization, cfg_scale,
                  max_noise_level):
    """Sample an HR latent from the prior, conditioned on the
    noise-augmented low-res image (c_concat) and its noise level
    (c_adm -> UNet class embedding). The latent grid equals the low-res
    pixel grid, so the VAE decode gives the x4 upscale."""
    k_aug, k_prior, k_dec = jax.random.split(rng, 3)
    zx, lvl = UP.noise_augment(low_sched, x_low, k_aug, noise_level,
                               max_noise_level=max_noise_level)
    b, h, w, _ = x_low.shape
    x_T = jax.random.normal(k_prior, (b, h, w, 4), x_low.dtype)

    y_cfg = jnp.concatenate([lvl, lvl], axis=0)   # CFG batch doubling

    def model_fn(x, t, ctx, control=None):
        out, _ = U.unet_apply(unet_params, unet_cfg, x, t, ctx, y=y_cfg)
        return out

    ddim = make_ddim_params_traced(sched, ddim_steps)
    cond = D.CondBundle(crossattn=ctx_cond, concat=zx)
    uncond = D.CondBundle(crossattn=ctx_uncond, concat=zx)
    z = D.ddim_decode(model_fn, sched, ddim, x_T, cond, uncond,
                      ddim_steps, cfg_scale=cfg_scale,
                      parameterization=parameterization, rng=k_dec)
    img = V.decode(vae_params, vae_cfg, z)
    return jnp.clip(img, -1.0, 1.0), lvl


def upscale(sd: StableDiffusionBundle, x_low, c_text: str, uc_text: str,
            noise_level=None, ddim_steps: int = 50,
            cfg_scale: float = 7.0, seed: int = 1234,
            max_noise_level: int = 350,
            low_scale_cfg: UP.LowScaleConfig = UP.LowScaleConfig()):
    """x4 latent upscaling: x_low [B, h, w, 3] in [-1, 1] -> image
    [B, 8h, 8w, 3] (the VAE's x8 on a latent that matched the low-res
    grid; SD's x4 upscaler feeds a 2x-downsampled LR for a net x4).

    ``noise_level``: optional [B] int levels; drawn uniformly below
    ``max_noise_level`` when None (upscaling.py:73-76). The UNet must be
    class-conditional (num_classes >= max timestep) and take
    in_channels = 4 + 3. Returns (image, noise_level_used)."""
    assert sd.unet_cfg.in_channels == 7, \
        "upscaler needs a 7-channel UNet (4 latent + 3 low-res)"
    assert sd.unet_cfg.num_classes is not None, \
        "upscaler UNet must be class-conditional on the noise level"
    rng = jax.random.PRNGKey(seed)
    ctx_c = sd.get_learned_conditioning(c_text)
    ctx_u = sd.get_learned_conditioning(uc_text)
    low_sched = UP.make_low_scale_schedule(low_scale_cfg)
    if noise_level is not None:
        noise_level = jnp.asarray(noise_level, jnp.int32)
    return _upscale_core(
        sd.unet_params, sd.unet_cfg, sd.vae_params, sd.vae_cfg, sd.sched,
        low_sched, jnp.asarray(x_low, sd.dtype), ctx_c, ctx_u,
        noise_level, rng, ddim_steps=ddim_steps,
        parameterization=sd.parameterization, cfg_scale=cfg_scale,
        max_noise_level=max_noise_level)
