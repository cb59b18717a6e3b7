"""Model facades: img2img / img2img_inpaint / img2img_latent_inpaint.

TPU re-design of the reference's GuidedLDM facades
(reference: guided_ldm.py:160-219, guided_ldm_inpainting.py:178-414).
Differences by design:

  * No GPU<->CPU model swapping (guided_ldm.py:179-217) — everything is
    HBM-resident; each facade compiles to a handful of jitted programs
    (text encode / encode+scan+decode) cached per shape.
  * The denoise loop is the scanned guided DDIM (diffusion/ddim.py).
  * PRNG is explicit: pass seed=1234 to reproduce the reference's
    torch.manual_seed(1234) determinism contract (ofgen_pixel_inpaint.py:235).
  * The K/V surface the reference left uncommitted (SURVEY §7 hard part 7)
    is canonical here: facades return ``kv_hist`` (a 16-layer pytree of
    self-attention K/V captured at the final denoise step) and accept
    ``reference_kv`` for cross-frame attention injection.

All images are NHWC float32 in [-1, 1]; masks are [H, W] float in [0, 1].
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import ddim as D
from ..diffusion.schedule import (DiffusionSchedule,
                                  make_ddim_params_traced,
                                  make_linear_schedule)
from ..models import clip as CL
from ..models import unet as U
from ..models import vae as V
from ..ops.filters import gaussian_blur
from ..ops.resize import resize
from .tokenizer import PromptTokenizer


@dataclass
class StableDiffusionBundle:
    """One SD model stack (the reference's GuidedLDM object equivalent)."""
    unet_params: dict
    unet_cfg: U.UNetConfig
    vae_params: dict
    vae_cfg: V.VAEConfig
    clip_params: dict
    clip_cfg: CL.CLIPTextConfig
    sched: DiffusionSchedule = field(default_factory=make_linear_schedule)
    parameterization: str = "eps"
    tokenizer: PromptTokenizer = field(default_factory=PromptTokenizer)
    clip_skip: int = 0
    dtype: object = jnp.float32

    def __post_init__(self):
        self._text_cache: dict = {}

    # -- conditioning ------------------------------------------------------
    def get_learned_conditioning(self, text: str):
        """Chunked CLIP encode with a tiny host-side cache (prompts repeat
        across frames)."""
        if text not in self._text_cache:
            ids = self.tokenizer.chunked(text)
            ctx = _encode_text_jit(self.clip_params, self.clip_cfg,
                                   jnp.asarray(ids[None]), self.clip_skip)
            self._text_cache[text] = ctx.astype(self.dtype)
        return self._text_cache[text]

    # -- vae helpers -------------------------------------------------------
    def encode_image(self, img, rng):
        return _vae_encode_jit(self.vae_params, self.vae_cfg,
                               img.astype(self.dtype), rng)

    def decode_latent(self, lat):
        return _vae_decode_jit(self.vae_params, self.vae_cfg,
                               lat.astype(self.dtype))


@functools.partial(jax.jit, static_argnames=("cfg", "clip_skip"))
def _encode_text_jit(params, cfg, ids, clip_skip):
    return CL.encode_chunked(params, cfg, ids, clip_skip=clip_skip)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _vae_encode_jit(params, cfg, img, rng):
    return V.encode(params, cfg, img, rng=rng, sample=True)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _vae_decode_jit(params, cfg, lat):
    return V.decode(params, cfg, lat)


def _t_enc(denoising_strength: float, steps: int) -> int:
    return int(min(denoising_strength, 0.999) * steps)


def _latent_hw(img_shape):
    return img_shape[-3] // 8, img_shape[-2] // 8


# ---------------------------------------------------------------------------
# core jitted decode program (shared by all facades)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "vae_cfg", "t_enc", "ddim_steps",
                     "parameterization", "cfg_scale", "capture_kv",
                     "use_inpaint", "use_guidance", "final_composite",
                     "control_cfgs", "tile_noise", "guidance_space",
                     "sampler", "cfg_interval", "deepcache_interval",
                     "strip", "sp"))
def _img2img_core(unet_params, unet_cfg, vae_params, vae_cfg, sched,
                  init_latent, ctx_cond, ctx_uncond, c_concat,
                  guidance_latent, guidance_strength, nmask, renoise_gate,
                  ref_kv, rng, controls=None, control_weights=None, *,
                  t_enc, ddim_steps, parameterization,
                  cfg_scale, capture_kv, use_inpaint, use_guidance,
                  final_composite, control_cfgs=(), tile_noise=False,
                  guidance_space="latent", sampler="ddim",
                  cfg_interval=1, deepcache_interval=0, strip=None,
                  sp=None):
    """stochastic_encode -> scanned guided DDIM -> (final composite) ->
    VAE decode. One compiled program per static signature.

    ``sched`` is a DiffusionSchedule pytree; the DDIM sub-schedule is
    derived on-trace (pure gathers over schedule arrays)."""
    ddim = make_ddim_params_traced(sched, ddim_steps)
    k_noise, k_decode, k_kv = jax.random.split(rng, 3)
    nshape = (1,) + init_latent.shape[1:] if tile_noise \
        else init_latent.shape
    noise = jnp.broadcast_to(
        jax.random.normal(k_noise, nshape, init_latent.dtype),
        init_latent.shape)
    x1 = D.stochastic_encode(ddim, init_latent, t_enc, noise)

    def model_fn(x, t, ctx, control=None):
        pair = ctx if isinstance(ctx, tuple) else None
        out, _ = U.unet_apply(unet_params, unet_cfg, x, t,
                              None if pair is not None else ctx,
                              ref_kv=ref_kv, control=control, strip=strip,
                              sp=sp, context_pair=pair)
        return out

    # CFG stem dedup (exact): the [uncond|cond] halves are identical
    # until the first cross-attention, so run the stem once on the half
    # batch. Preconditions: plain DDIM, no injected KV / sequence
    # parallelism (their CFG halves differ). The MFR strip band bias is
    # CFG-half-independent (purely positional), so strips dedup too —
    # at config-5 shapes the stem holds the largest (12288-token) L0
    # self-attention, the strip workload's dominant quadratic term.
    cfg_dedup = (ref_kv is None and sp is None
                 and sampler == "ddim" and cfg_interval == 1
                 and deepcache_interval == 0)

    cond = D.CondBundle(crossattn=ctx_cond, concat=c_concat)
    uncond = D.CondBundle(crossattn=ctx_uncond, concat=c_concat)

    # ControlNet residuals: evaluated once from the entry latent at the
    # first step's timestep (controlnet.py:412-432 first-call cache),
    # re-weighted per step inside the scan.
    control_residuals = None
    if controls:
        from ..models.controlnet import controlnet_apply
        b = init_latent.shape[0]
        x_ctrl = jnp.concatenate([x1, x1], axis=0)
        t_ctrl = jnp.full((2 * b,), ddim.timesteps[max(t_enc - 1, 0)],
                          jnp.int32)
        ctx_ctrl = jnp.concatenate([ctx_uncond, ctx_cond], axis=0)
        control_residuals = [
            controlnet_apply(cp, ccfg, x_ctrl, hint, t_ctrl, ctx_ctrl)
            for (cp, hint), ccfg in zip(controls, control_cfgs)]

    if sampler.startswith("dpmpp"):
        # DPM-Solver++(2M): same UNet evals per step, usable with ~half
        # the steps of DDIM at comparable quality (SURVEY §7 rec.).
        # "dpmpp" runs t_enc second-order steps; "dpmpp:N" pins the
        # step count independently of the DDIM schedule — "dpmpp:10"
        # at denoising strength 0.4 / 50 ddim_steps is the bench's
        # >=4 f/s/chip north-star operating point (BASELINE.md): same
        # entry noise level as the 20-step DDIM path, 10 solver steps.
        assert not use_guidance, "dpmpp sampler has no guidance hooks"
        from .. diffusion.dpm_solver import (dpmpp_2m_decode,
                                             uniform_timesteps_desc)
        n_solver = int(sampler.split(":", 1)[1]) if ":" in sampler \
            else max(t_enc, 1)
        dts = uniform_timesteps_desc(sched, ddim.timesteps[t_enc],
                                     max(n_solver, 1))
        decoded = dpmpp_2m_decode(
            model_fn, sched, dts, x1, cond, uncond, cfg_scale=cfg_scale,
            parameterization=parameterization, rng=k_decode,
            init_latent=init_latent if use_inpaint else None,
            nmask=nmask if use_inpaint else None,
            renoise_gate=renoise_gate if use_inpaint else None)
        if final_composite and nmask is not None:
            decoded = init_latent * (1.0 - nmask) + decoded * nmask
        kv_hist = None
        if capture_kv:
            ts = jnp.full((init_latent.shape[0],), 1, jnp.int32)
            x_cap = decoded if c_concat is None else \
                jnp.concatenate([decoded, c_concat.astype(decoded.dtype)],
                                -1)
            _, kv_hist = U.unet_apply(unet_params, unet_cfg, x_cap, ts,
                                      ctx_cond, ref_kv=None)
        img = V.decode(vae_params, vae_cfg, decoded)
        return jnp.clip(img, -1.0, 1.0), decoded, kv_hist

    pixel_fns = None
    if use_guidance and guidance_space == "pixel":
        pixel_fns = (
            lambda xp, k: V.encode(vae_params, vae_cfg, xp, rng=k,
                                   sample=True),
            lambda z: V.decode(vae_params, vae_cfg, z))

    decoded = D.ddim_decode(
        model_fn, sched, ddim, x1, cond, uncond, t_enc,
        cfg_scale=cfg_scale, parameterization=parameterization,
        rng=k_decode,
        guidance_latent=guidance_latent if use_guidance else None,
        guidance_strength=guidance_strength if use_guidance else None,
        guidance_space=guidance_space, pixel_fns=pixel_fns,
        init_latent=init_latent if use_inpaint else None,
        nmask=nmask if use_inpaint else None,
        renoise_gate=renoise_gate if use_inpaint else None,
        cfg_interval=cfg_interval,
        **_deepcache_kwargs(unet_params, unet_cfg, init_latent,
                            deepcache_interval, ref_kv, controls,
                            c_concat),
        control_residuals=control_residuals,
        control_weights=control_weights,
        tile_noise=tile_noise, cfg_dedup=cfg_dedup)

    if final_composite and nmask is not None:
        # cast the mask: f32 nmask would promote the composited latent —
        # and the whole KV-capture UNet pass below — to f32 (2x cost,
        # and the fused-FF kernel's VMEM budget is sized for bf16)
        nm_c = nmask.astype(decoded.dtype)
        decoded = init_latent * (1.0 - nm_c) + decoded * nm_c

    kv_hist = None
    if capture_kv:
        # capture K/V from the finished latent at the terminal timestep —
        # the canonical completion of the reference's dropped capture path
        # (ddpm.py:934-935 discards kv_hists; we keep them)
        ts = jnp.full((init_latent.shape[0],), 1, jnp.int32)
        x_cap = decoded if c_concat is None else \
            jnp.concatenate([decoded, c_concat.astype(decoded.dtype)], -1)
        _, kv_hist = U.unet_apply(unet_params, unet_cfg, x_cap, ts,
                                  ctx_cond, ref_kv=None)

    img = V.decode(vae_params, vae_cfg, decoded)
    return jnp.clip(img, -1.0, 1.0), decoded, kv_hist


# ---------------------------------------------------------------------------
# fused inpainting program: mask blur -> composite -> VAE encodes ->
# conditioning -> scanned decode, ONE compiled unit. On remote-runtime
# links every chained dispatch costs a round trip (measured ~1s each),
# so the 4-program chain of the unfused path dominated per-frame time.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "vae_cfg", "mask_blur", "t_enc",
                     "ddim_steps", "parameterization", "cfg_scale",
                     "capture_kv", "final_composite", "has_reference",
                     "tile_noise", "want_init_decoded", "sampler",
                     "cfg_interval", "strip", "sp"))
def _inpaint_fused(unet_params, unet_cfg, vae_params, vae_cfg, sched,
                   image, reference_img, mask01, ctx_c, ctx_u, gates,
                   ref_kv, rng, *, mask_blur, t_enc, ddim_steps,
                   parameterization, cfg_scale, capture_kv,
                   final_composite, has_reference, tile_noise,
                   want_init_decoded, sampler="ddim", cfg_interval=1,
                   strip=None, sp=None):
    """image/reference_img [B, H, W, 3]; mask01 [B, H, W]. RNG splits and
    noise draws exactly mirror the unfused path (split(rng, 4); tiled
    [1,...] posterior noise broadcast over B — identical at B=1), so
    outputs are bitwise-stable across the fusion."""
    k_enc, k_cdt, k_rand, k_core = jax.random.split(rng, 4)
    dtype = image.dtype

    m = mask01.astype(jnp.float32)
    if mask_blur > 0:
        image_mask = jax.vmap(
            lambda mm: gaussian_blur(mm, float(mask_blur)))(m)
    else:
        image_mask = m
    image_mask = jnp.clip(image_mask, 0.0, 1.0)
    m4 = image_mask[..., None].astype(dtype)
    if has_reference:
        composited = image * (1.0 - m4) + reference_img * m4
    else:
        # fill path: seed masked pixels with multi-radius blurred colors
        # before encoding (fill_mask_input, inpainting.py:161-176,310-312)
        from ..ops.filters import fill_masked
        composited = fill_masked(image, jnp.round(image_mask)).astype(dtype)

    init_latent = _vae_encode_tiled(vae_params, vae_cfg, composited, k_enc)
    h, w = init_latent.shape[1:3]
    nmask = jnp.round(resize(image_mask[..., None].astype(jnp.float32),
                             (h, w), "linear"))
    if not has_reference:
        # fill path: randomize the masked latent (inpainting.py:310-312)
        noise = jax.random.normal(k_rand, init_latent.shape,
                                  init_latent.dtype)
        init_latent = (1.0 - nmask) * init_latent + nmask * noise

    # 5-ch inpaint conditioning (guided_ldm_inpainting.py:139-154)
    cmask = jnp.round(image_mask)[..., None]
    cond_latent = _vae_encode_tiled(
        vae_params, vae_cfg,
        composited * (1.0 - cmask.astype(dtype)), k_cdt)
    cmask_lat = resize(cmask, (h, w), "nearest")
    c_concat = jnp.concatenate([cmask_lat.astype(dtype), cond_latent],
                               axis=-1)

    out, decoded, kv = _img2img_core(
        unet_params, unet_cfg, vae_params, vae_cfg, sched,
        init_latent, ctx_c, ctx_u, c_concat, jnp.zeros_like(init_latent),
        jnp.zeros((max(t_enc, 1), 1, 1, 1, 1), jnp.float32),
        nmask, gates, ref_kv, k_core, None, None,
        t_enc=t_enc, ddim_steps=ddim_steps,
        parameterization=parameterization, cfg_scale=cfg_scale,
        capture_kv=capture_kv, use_inpaint=True, use_guidance=False,
        final_composite=final_composite, tile_noise=tile_noise,
        sampler=sampler, cfg_interval=cfg_interval, strip=strip, sp=sp)
    init_decoded = jnp.clip(V.decode(vae_params, vae_cfg, init_latent),
                            -1, 1) if want_init_decoded else None
    return out, composited, init_decoded, kv


def _vae_encode_tiled(params, cfg, img, rng):
    """Posterior sample with noise drawn once and broadcast over batch
    (bit-identical to a per-frame fixed-seed encode)."""
    mean, logvar = V.encode_moments(params, cfg, img)
    std = jnp.exp(0.5 * logvar)
    noise = jnp.broadcast_to(
        jax.random.normal(rng, (1,) + mean.shape[1:], mean.dtype),
        mean.shape)
    return (mean + std * noise) * cfg.scale_factor


# ---------------------------------------------------------------------------
# facades
# ---------------------------------------------------------------------------

def _prep_controls(control_specs, t_enc, ddim_steps):
    """ControlSpec list -> (controls pytree, static cfgs, step weights)."""
    if not control_specs:
        return None, (), None
    from ..models.controlnet import control_step_weights
    controls = tuple((s.params, jnp.asarray(s.hint, jnp.float32))
                     for s in control_specs)
    cfgs = tuple(s.cfg for s in control_specs)
    progress = D.guidance_progress(max(t_enc, 1), ddim_steps)
    weights = jnp.asarray(control_step_weights(control_specs, progress))
    return controls, cfgs, weights


def img2img(sd: StableDiffusionBundle, img, c_text: str, uc_text: str,
            denoising_strength: float = 0.3, ddim_steps: int = 50,
            target_img=None, guidance_schedule_func=None,
            guidance_weight=None, cfg_scale: float = 7.0,
            seed: int = 1234, reference_kv=None, capture_kv: bool = False,
            control_specs=(), guidance_space: str = "latent",
            sampler: str = "ddim", cfg_interval: int = 1,
            deepcache_interval: int = 0,
            strip: Optional[U.StripConfig] = None,
            sp: Optional[U.SeqParallelConfig] = None):
    """Plain guided img2img (guided_ldm.py:165-219).

    img: [1, H, W, 3] in [-1, 1]. Returns (image, kv_hist).

    ``guidance_space``: 'latent' (default, pred_x0 lerp) or 'pixel'
    (the reference's noised_blending, guided_ldm.py:92-118: noise the
    guidance latent to the next step, predict its x0 with the same CFG
    model, decode both x0s, blend in pixel space, re-encode — costs one
    extra CFG UNet eval + 3 VAE passes per step).
    """
    rng = jax.random.PRNGKey(seed)
    k_enc, k_tgt, k_core = jax.random.split(rng, 3)
    ctx_c = sd.get_learned_conditioning(c_text)
    ctx_u = sd.get_learned_conditioning(uc_text)
    init_latent = sd.encode_image(img, k_enc)
    t_enc = _t_enc(denoising_strength, ddim_steps)

    use_guidance = target_img is not None and t_enc > 0
    guidance_latent = jnp.zeros_like(init_latent)
    gs = jnp.zeros((max(t_enc, 1), 1, 1, 1, 1), jnp.float32)
    if use_guidance:
        guidance_latent = sd.encode_image(target_img, k_tgt)
        gs = _guidance_strength_array(
            guidance_schedule_func, guidance_weight, t_enc, ddim_steps,
            init_latent.shape)

    controls, ccfgs, cweights = _prep_controls(control_specs, t_enc,
                                               ddim_steps)
    out, _, kv = _img2img_core(
        sd.unet_params, sd.unet_cfg, sd.vae_params, sd.vae_cfg, sd.sched,
        init_latent, ctx_c, ctx_u, None, guidance_latent, gs,
        None, None, reference_kv, k_core, controls, cweights,
        t_enc=t_enc, ddim_steps=ddim_steps,
        parameterization=sd.parameterization, cfg_scale=cfg_scale,
        capture_kv=capture_kv, use_inpaint=False,
        use_guidance=use_guidance, final_composite=False,
        control_cfgs=ccfgs, guidance_space=guidance_space,
        sampler=sampler, cfg_interval=cfg_interval,
        deepcache_interval=deepcache_interval, strip=strip, sp=sp)
    return out, kv


def _deepcache_kwargs(unet_params, unet_cfg, init_latent,
                      deepcache_interval, ref_kv, controls, c_concat):
    """Build the ddim_decode deepcache kwargs when the turbo knob is on
    (plain crossattn img2img only — the split forward has no
    ref_kv/ControlNet/hybrid support)."""
    if deepcache_interval <= 0:
        return {}
    assert ref_kv is None and not controls and c_concat is None, \
        "deepcache supports only plain crossattn img2img"
    b, h, w = init_latent.shape[0], init_latent.shape[1], init_latent.shape[2]

    def full_fn(xx, tt, cc):
        return U.unet_apply_deepcache(unet_params, unet_cfg, xx, tt, cc,
                                      want_deep_cache=True)

    def cached_fn(xx, tt, cc, deep):
        return U.unet_apply_deepcache(unet_params, unet_cfg, xx, tt, cc,
                                      deep_cache=deep)[0]

    dc0 = jnp.zeros(U.deepcache_feat_shape(unet_cfg, 2 * b, h, w),
                    init_latent.dtype)
    return {"deepcache_interval": deepcache_interval,
            "deepcache_fns": (full_fn, cached_fn),
            "deepcache_init": dc0}


def _guidance_strength_array(schedule_func, weight_map, t_enc, total_steps,
                             latent_shape):
    """Build the per-step guidance strengths [t_enc, 1, h, w, 1] from a
    host schedule function (p -> float | HxW map) and an optional
    per-pixel weight map (ofgen.py:157-167 semantics)."""
    h, w = latent_shape[-3], latent_shape[-2]
    ps = D.guidance_progress(t_enc, total_steps)
    rows = []
    for p in ps:
        g = schedule_func(p) if schedule_func is not None else 0.1
        g = np.asarray(g, np.float32)
        if g.ndim == 0:
            g = np.full((h, w), float(g), np.float32)
        else:
            import cv2
            g = cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
        rows.append(g[None, :, :, None])
    gs = jnp.asarray(np.stack(rows))            # [t_enc, 1, h, w, 1]
    if weight_map is not None:
        wm = jnp.asarray(np.asarray(weight_map, np.float32))
        wm = resize(wm[:, :, None], (h, w), "linear")[None, None, :, :, 0]
        gs = gs * wm
    return gs


def build_inpaint_conditioning(sd: StableDiffusionBundle, image, mask01,
                               rng):
    """5-channel inpaint conditioning (guided_ldm_inpainting.py:139-154):
    rounded mask (1ch, latent res, nearest) + VAE latent of the
    mask-zeroed image (4ch). image [1,H,W,3]; mask01 [H,W]."""
    cmask = jnp.round(mask01)[None, :, :, None]
    cond_image = image * (1.0 - cmask)
    cond_latent = sd.encode_image(cond_image, rng)
    h, w = cond_latent.shape[1:3]
    cmask_lat = resize(cmask[0], (h, w), "nearest")[None]
    return jnp.concatenate([cmask_lat, cond_latent], axis=-1)


def img2img_inpaint(sd: StableDiffusionBundle, image, c_text: str,
                    uc_text: str, denoising_strength: float = 0.05,
                    ddim_steps: int = 50, reference_img=None, mask=None,
                    mask_blur: int = 16, guidance_schedule_func=None,
                    cfg_scale: float = 7.0, seed: int = 1234,
                    reference_kv=None, capture_kv: bool = False,
                    control_specs=(), want_init_decoded: bool = True,
                    sampler: str = "ddim", cfg_interval: int = 1,
                    strip: Optional[U.StripConfig] = None,
                    sp: Optional[U.SeqParallelConfig] = None):
    """Masked inpainting img2img (guided_ldm_inpainting.py:261-345).

    image/reference_img: [1, H, W, 3] in [-1, 1]; mask: [H, W] in {0, 1}
    (1 = inpaint). Returns (image, composited_input, init_latent_decoded,
    kv_hist). ``want_init_decoded=False`` skips the extra VAE decode of
    the init latent (a debug output the reference always computes,
    guided_ldm_inpainting.py:344; an avoidable dispatch per frame on
    remote-runtime links) and returns None in its place.
    """
    rng = jax.random.PRNGKey(seed)
    ctx_c = sd.get_learned_conditioning(c_text)
    ctx_u = sd.get_learned_conditioning(uc_text)

    assert mask is not None, "img2img_inpaint requires a mask"
    mask01 = jnp.asarray(mask, jnp.float32)
    has_reference = reference_img is not None
    if not has_reference:
        denoising_strength = 1.0   # fill path (inpainting.py:310-312)

    t_enc = _t_enc(denoising_strength, ddim_steps)
    ps = D.guidance_progress(t_enc, ddim_steps)
    fn = guidance_schedule_func or (lambda p: 0.1)
    gates = jnp.asarray([float(fn(p)) for p in ps], jnp.float32) \
        if t_enc > 0 else jnp.zeros((1,), jnp.float32)
    last_gs = float(gates[-1]) if t_enc > 0 else 1.0

    if not control_specs:
        # the fused single-program path (the common pipeline shape)
        img_d = jnp.asarray(image, sd.dtype)
        ref_d = img_d if not has_reference \
            else jnp.asarray(reference_img, sd.dtype)
        out, composited, init_latent_decoded, kv = _inpaint_fused(
            sd.unet_params, sd.unet_cfg, sd.vae_params, sd.vae_cfg,
            sd.sched, img_d, ref_d, mask01[None], ctx_c, ctx_u, gates,
            reference_kv, rng, mask_blur=mask_blur, t_enc=t_enc,
            ddim_steps=ddim_steps, parameterization=sd.parameterization,
            cfg_scale=cfg_scale, capture_kv=capture_kv,
            final_composite=last_gs > 0, has_reference=has_reference,
            tile_noise=False, want_init_decoded=want_init_decoded,
            sampler=sampler, cfg_interval=cfg_interval, strip=strip,
            sp=sp)
        return out, composited, init_latent_decoded, kv

    # ControlNet path (unfused: residuals need host-prepped hints)
    k_enc, k_cdt, k_rand, k_core = jax.random.split(rng, 4)
    # PIL GaussianBlur(mask_blur) on the 0-255 mask (inpainting.py:293)
    image_mask = gaussian_blur(mask01, float(mask_blur)) if mask_blur > 0 \
        else mask01
    image_mask = jnp.clip(image_mask, 0.0, 1.0)

    if has_reference:
        # Image.composite(reference, image, mask) (inpainting.py:298)
        composited = image * (1.0 - image_mask[None, :, :, None]) + \
            reference_img * image_mask[None, :, :, None]
    else:
        composited = image        # fill_mask_input approximation
    init_latent = sd.encode_image(composited, k_enc)
    h, w = init_latent.shape[1:3]
    # binarized latent mask (inpainting.py:304-309: bilinear resize+round)
    nmask = jnp.round(resize(image_mask[:, :, None], (h, w), "linear"))[None]
    if not has_reference:
        noise = jax.random.normal(k_rand, init_latent.shape,
                                  init_latent.dtype)
        init_latent = (1.0 - nmask) * init_latent + nmask * noise
    c_concat = build_inpaint_conditioning(sd, composited, image_mask, k_cdt)

    controls, ccfgs, cweights = _prep_controls(control_specs, t_enc,
                                               ddim_steps)
    out, decoded, kv = _img2img_core(
        sd.unet_params, sd.unet_cfg, sd.vae_params, sd.vae_cfg, sd.sched,
        init_latent, ctx_c, ctx_u, c_concat, jnp.zeros_like(init_latent),
        jnp.zeros((max(t_enc, 1), 1, 1, 1, 1), jnp.float32),
        nmask, gates, reference_kv, k_core, controls, cweights,
        t_enc=t_enc, ddim_steps=ddim_steps,
        parameterization=sd.parameterization, cfg_scale=cfg_scale,
        capture_kv=capture_kv, use_inpaint=True, use_guidance=False,
        final_composite=last_gs > 0, control_cfgs=ccfgs, strip=strip,
        sp=sp)

    init_latent_decoded = jnp.clip(sd.decode_latent(init_latent), -1, 1) \
        if want_init_decoded else None
    return out, composited, init_latent_decoded, kv


def img2img_latent_inpaint(sd: StableDiffusionBundle, warped_latent,
                           reference_img, mask, c_text: str, uc_text: str,
                           denoising_strength: float = 0.05,
                           ddim_steps: int = 50, mask_blur: int = 16,
                           guidance_schedule_func=None,
                           cfg_scale: float = 7.0, seed: int = 1234,
                           reference_kv=None, capture_kv: bool = False,
                           control_specs=()):
    """Latent-space inpaint (guided_ldm_inpainting.py:347-414): blend the
    warped latent with the encoded reference by the latent mask, then
    inpaint-condition on its decode. Returns (image, decoded_latent,
    init_latent_decoded, kv_hist)."""
    rng = jax.random.PRNGKey(seed)
    k_enc, k_cdt, k_core = jax.random.split(rng, 3)
    ctx_c = sd.get_learned_conditioning(c_text)
    ctx_u = sd.get_learned_conditioning(uc_text)

    mask01 = jnp.asarray(mask, jnp.float32)
    image_mask = gaussian_blur(mask01, float(mask_blur)) if mask_blur > 0 \
        else mask01
    image_mask = jnp.clip(image_mask, 0.0, 1.0)

    ref_latent = sd.encode_image(reference_img, k_enc)
    h, w = ref_latent.shape[1:3]
    nmask = jnp.round(resize(image_mask[:, :, None], (h, w), "linear"))[None]
    init_latent = (1.0 - nmask) * warped_latent + nmask * ref_latent
    init_latent_decoded = jnp.clip(sd.decode_latent(init_latent), -1, 1)
    c_concat = build_inpaint_conditioning(sd, init_latent_decoded,
                                          image_mask, k_cdt)

    t_enc = _t_enc(denoising_strength, ddim_steps)
    ps = D.guidance_progress(t_enc, ddim_steps)
    fn = guidance_schedule_func or (lambda p: 0.1)
    gates = jnp.asarray([float(fn(p)) for p in ps], jnp.float32) \
        if t_enc > 0 else jnp.zeros((1,), jnp.float32)
    last_gs = float(gates[-1]) if t_enc > 0 else 1.0

    controls, ccfgs, cweights = _prep_controls(control_specs, t_enc,
                                               ddim_steps)
    out, decoded, kv = _img2img_core(
        sd.unet_params, sd.unet_cfg, sd.vae_params, sd.vae_cfg, sd.sched,
        init_latent, ctx_c, ctx_u, c_concat, jnp.zeros_like(init_latent),
        jnp.zeros((max(t_enc, 1), 1, 1, 1, 1), jnp.float32),
        nmask, gates, reference_kv, k_core, controls, cweights,
        t_enc=t_enc, ddim_steps=ddim_steps,
        parameterization=sd.parameterization, cfg_scale=cfg_scale,
        capture_kv=capture_kv, use_inpaint=True, use_guidance=False,
        final_composite=False, control_cfgs=ccfgs)
    if last_gs > 0:
        # composite against the WARPED latent (inpainting.py:404-405)
        decoded = warped_latent * (1.0 - nmask) + decoded * nmask
        out = jnp.clip(sd.decode_latent(decoded), -1, 1)
    return out, decoded, init_latent_decoded, kv


# ---------------------------------------------------------------------------
# batched inpainting (TPU throughput shape)
# ---------------------------------------------------------------------------

def img2img_inpaint_batch(sd: StableDiffusionBundle, images, c_texts,
                          uc_text: str, masks, reference_imgs,
                          denoising_strength: float = 0.05,
                          ddim_steps: int = 50, mask_blur: int = 16,
                          guidance_schedule_func=None,
                          cfg_scale: float = 7.0, seed: int = 1234,
                          sampler: str = "ddim", cfg_interval: int = 1,
                          mesh=None, reference_kv=None,
                          capture_kv: bool = False):
    """B independent masked-inpainting frames in ONE compiled program.

    TPU-first throughput design with no reference counterpart: inside a
    keyframe segment every non-key frame depends only on the keyframe,
    so frames batch trivially; batch=B multiplies MXU utilization of the
    whole denoise scan. Randomness is drawn once and tiled over the
    batch, so outputs are bitwise-equal to B sequential
    ``img2img_inpaint`` calls with the same fixed seed (the reference
    reseeds 1234 per frame, ofgen_pixel_inpaint.py:235-236).

    images/reference_imgs: [B, H, W, 3] in [-1, 1]; masks [B, H, W] in
    {0, 1}; c_texts: list of B prompts. Returns images [B, H, W, 3].

    ``mesh``: optional jax.sharding.Mesh with a 'dp' axis — frames shard
    over dp (data-parallel inference; BASELINE config 2 scale-out). The
    same program, same noise tiling: outputs match the single-device run.

    ``reference_kv``: per-layer tuple of (k, v) with batch dim B — each
    frame injects its OWN references' K/V (the batched level back-fill
    shape; batch dim 1 broadcasts one reference set over all frames).
    ``capture_kv``: also return the batch's terminal-step K/V pytree
    (split it per frame with ``split_kv_batch``).
    """
    b = images.shape[0]
    assert len(c_texts) == b
    rng = jax.random.PRNGKey(seed)
    ctx_c = jnp.concatenate(
        [sd.get_learned_conditioning(t) for t in c_texts], axis=0)
    ctx_u = jnp.tile(sd.get_learned_conditioning(uc_text), (b, 1, 1))

    if mesh is not None:
        from ..parallel.mesh import batch_sharding
        images = jax.device_put(jnp.asarray(images, sd.dtype),
                                batch_sharding(mesh))
        reference_imgs = jax.device_put(
            jnp.asarray(reference_imgs, sd.dtype), batch_sharding(mesh))
        masks = jax.device_put(jnp.asarray(masks, jnp.float32),
                               batch_sharding(mesh, ndim=3))
        ctx_c = jax.device_put(ctx_c, batch_sharding(mesh, ndim=3))
        ctx_u = jax.device_put(ctx_u, batch_sharding(mesh, ndim=3))

    t_enc = _t_enc(denoising_strength, ddim_steps)
    ps = D.guidance_progress(t_enc, ddim_steps)
    fn = guidance_schedule_func or (lambda p: 0.1)
    gates = jnp.asarray([float(fn(p)) for p in ps], jnp.float32) \
        if t_enc > 0 else jnp.zeros((1,), jnp.float32)
    last_gs = float(gates[-1]) if t_enc > 0 else 1.0

    out, _, _, kv = _inpaint_fused(
        sd.unet_params, sd.unet_cfg, sd.vae_params, sd.vae_cfg, sd.sched,
        jnp.asarray(images, sd.dtype), jnp.asarray(reference_imgs, sd.dtype),
        jnp.asarray(masks, jnp.float32), ctx_c, ctx_u, gates,
        reference_kv, rng,
        mask_blur=mask_blur, t_enc=t_enc, ddim_steps=ddim_steps,
        parameterization=sd.parameterization, cfg_scale=cfg_scale,
        capture_kv=capture_kv, final_composite=last_gs > 0,
        has_reference=True, tile_noise=True, want_init_decoded=False,
        sampler=sampler, cfg_interval=cfg_interval)
    if capture_kv:
        return out, kv
    return out


def split_kv_batch(kv_hist, b: int):
    """Split a captured batch-B kv_hist into B per-frame kv_hist tuples
    (each layer's k/v sliced to batch 1, the store/injection shape)."""
    if kv_hist is None:
        return [None] * b
    return [tuple((k[i:i + 1], v[i:i + 1]) for k, v in kv_hist)
            for i in range(b)]


# ---------------------------------------------------------------------------
# txt2img — the base sampler's full-chain sample() surface
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "vae_cfg", "ddim_steps", "shape",
                     "parameterization", "cfg_scale", "eta"))
def _txt2img_core(unet_params, unet_cfg, vae_params, vae_cfg, sched,
                  ctx_cond, ctx_uncond, rng, *, shape, ddim_steps,
                  parameterization, cfg_scale, eta=0.0):
    ddim = make_ddim_params_traced(sched, ddim_steps, eta=eta)

    def model_fn(x, t, ctx, control=None):
        return U.unet_apply(unet_params, unet_cfg, x, t, ctx)[0]

    lat = D.ddim_sample(
        model_fn, sched, ddim,
        D.CondBundle(crossattn=ctx_cond), D.CondBundle(crossattn=ctx_uncond),
        shape=shape, rng=rng, cfg_scale=cfg_scale,
        parameterization=parameterization)
    return jnp.clip(V.decode(vae_params, vae_cfg, lat), -1.0, 1.0)


def txt2img(sd: StableDiffusionBundle, c_text: str, uc_text: str = "",
            height: int = 512, width: int = 768, ddim_steps: int = 50,
            cfg_scale: float = 7.0, eta: float = 0.0, seed: int = 1234,
            batch: int = 1):
    """Generation from pure noise — the DDIMSampler.sample surface the
    reference vendors but its video pipelines never call directly
    (reference: ddim.py:54-126). Returns [batch, H, W, 3] in [-1, 1]."""
    rng = jax.random.PRNGKey(seed)
    ctx_c = sd.get_learned_conditioning(c_text)
    ctx_u = sd.get_learned_conditioning(uc_text)
    if batch > 1:
        ctx_c = jnp.tile(ctx_c, (batch, 1, 1))
        ctx_u = jnp.tile(ctx_u, (batch, 1, 1))
    f = 2 ** (len(sd.vae_cfg.ch_mult) - 1)      # VAE spatial factor (8 for SD)
    shape = (batch, height // f, width // f, sd.vae_cfg.z_channels)
    return _txt2img_core(
        sd.unet_params, sd.unet_cfg, sd.vae_params, sd.vae_cfg, sd.sched,
        ctx_c, ctx_u, rng, shape=shape, ddim_steps=ddim_steps,
        parameterization=sd.parameterization, cfg_scale=cfg_scale, eta=eta)


def img2img_invert(sd: StableDiffusionBundle, img, c_text: str,
                   uc_text: str = "", t_enc: Optional[int] = None,
                   ddim_steps: int = 50, cfg_scale: float = 1.0,
                   seed: int = 1234, timestep_indexing: str = "index"):
    """Deterministic DDIM inversion of an image into the noise chain
    (reference: ddim.py:253-298 encode). Returns the encoded latent."""
    rng = jax.random.PRNGKey(seed)
    ctx_c = sd.get_learned_conditioning(c_text)
    ctx_u = sd.get_learned_conditioning(uc_text)
    lat = sd.encode_image(img, rng)
    ddim = make_ddim_params_traced(sd.sched, ddim_steps)

    def model_fn(x, t, ctx, control=None):
        return U.unet_apply(sd.unet_params, sd.unet_cfg, x, t, ctx)[0]

    return D.ddim_encode(model_fn, sd.sched, ddim, lat,
                         D.CondBundle(crossattn=ctx_c),
                         D.CondBundle(crossattn=ctx_u), t_enc,
                         cfg_scale=cfg_scale,
                         timestep_indexing=timestep_indexing)
