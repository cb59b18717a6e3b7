"""Guided DDIM sampling as a single `lax.scan`.

Re-designs the reference's per-step Python loops
(reference: ldm/models/diffusion/ddim.py:300-336,
guided_ldm.py:26-158, guided_ldm_inpainting.py:28-137) as pure scanned
step functions: all per-step scalars (timesteps, alphas, sigmas,
guidance strengths) are precomputed arrays gathered by step index, CFG
runs as a doubled batch through one model call, and the PRNG is threaded
explicitly (replacing torch.manual_seed(1234)).

Three composable behaviors, matching the reference facades:
  * plain img2img decode (stochastic_encode -> t_enc denoise steps),
  * latent/pixel guidance blending of pred_x0 (guided_ldm.py:79-123),
  * masked re-noising inpainting: before each step the known region is
    re-imposed as q_sample(init_latent, t) (guided_ldm_inpainting.py:127-129).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .schedule import (DDIMParams, DiffusionSchedule, predict_eps_from_z_and_v,
                       q_sample)


class CondBundle(NamedTuple):
    """Conditioning for one CFG pass. ``concat`` is the 5-channel inpaint
    conditioning appended on the channel axis ('hybrid' mode,
    ddpm.py:1392-1423); None means pure cross-attention conditioning."""
    crossattn: jnp.ndarray                 # [B, L, D]
    concat: Optional[jnp.ndarray] = None   # [B, h, w, Cc] or None


def cfg_model_call(model_fn: Callable, x, t, cond: CondBundle,
                   uncond: CondBundle, scale: float, control=None,
                   dedup: bool = False):
    """Classifier-free guidance with batch doubling ([uncond|cond] order,
    matching guided_ldm.py:41-63). ``control`` is an optional 13-tuple of
    ControlNet residuals (already CFG-batched) forwarded to the model.

    ``dedup``: CFG stem dedup — pass the model the HALF-batch latent and
    the (ctx_u, ctx_c) pair instead of doubling here; the UNet runs its
    stem (input conv, first resblock, first self-attention — the halves
    are bit-identical there) once and doubles the batch at the first
    cross-attention (models.unet context_pair). Requires a model_fn that
    understands a tuple ctx, and identical (or absent) concat
    conditioning across the halves — else falls back to plain doubling.
    """
    if dedup and (cond.concat is uncond.concat or cond.concat is None):
        x_in = x
        if cond.concat is not None:
            x_in = jnp.concatenate(
                [x, cond.concat.astype(x.dtype)], axis=-1)
        out = model_fn(x_in, t, (uncond.crossattn, cond.crossattn), control)
        out_u, out_c = jnp.split(out, 2, axis=0)
        return out_u + scale * (out_c - out_u)
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    ctx = jnp.concatenate([uncond.crossattn, cond.crossattn], axis=0)
    if cond.concat is not None:
        cc = jnp.concatenate([uncond.concat, cond.concat], axis=0)
        x_in = jnp.concatenate([x_in, cc.astype(x_in.dtype)], axis=-1)
    out = model_fn(x_in, t_in, ctx, control)
    out_u, out_c = jnp.split(out, 2, axis=0)
    return out_u + scale * (out_c - out_u)


def stochastic_encode(ddim: DDIMParams, x0, t_enc: int, noise):
    """Noise x0 to DDIM step t_enc (ddim.py:300-314 indexing preserved:
    alphas are gathered at index t_enc, one past the first decode index)."""
    a = jnp.sqrt(ddim.alphas[t_enc]).astype(x0.dtype)
    s = ddim.sqrt_one_minus_alphas[t_enc].astype(x0.dtype)
    return a * x0 + s * noise


def ddim_decode(
    model_fn: Callable,
    sched: DiffusionSchedule,
    ddim: DDIMParams,
    x_latent: jnp.ndarray,
    cond: CondBundle,
    uncond: CondBundle,
    t_enc: int,
    *,
    cfg_scale: float = 7.0,
    parameterization: str = "eps",
    rng: Optional[jax.Array] = None,
    # --- guidance blending (guided_ldm.py path) ---
    guidance_latent: Optional[jnp.ndarray] = None,
    guidance_strength: Optional[jnp.ndarray] = None,  # [t_enc, ...] bcast to x
    guidance_space: str = "latent",      # or "pixel" (noised_blending)
    pixel_fns=None,                      # (vae_encode(x,key), vae_decode(z))
    # --- inpainting re-noise (guided_ldm_inpainting.py path) ---
    init_latent: Optional[jnp.ndarray] = None,
    nmask: Optional[jnp.ndarray] = None,              # [h, w, 1] or [B,h,w,1]
    renoise_gate: Optional[jnp.ndarray] = None,       # [t_enc] floats (gs)
    # --- ControlNet (controlnet.py:412-432 semantics) ---
    control_residuals=None,        # list over nets of 13-tuples (CFG batch)
    control_weights=None,          # [t_enc, n_nets]
    tile_noise: bool = False,      # draw noise once, tile over batch
    dynamic_threshold: Optional[float] = None,  # ddim.py:242-243
    temperature: float = 1.0,      # noise multiplier (ddim.py:247)
    noise_dropout: float = 0.0,    # dropout on the sigma noise (ddim.py:248-249)
    cfg_schedule=None,             # per-step CFG scale [t_enc] (ucg_schedule,
                                   # ddim.py:158-160); overrides cfg_scale
    score_fn: Optional[Callable] = None,  # score corrector hook:
                                   # e_t = score_fn(e_t, x, ts, i)
                                   # (ddim.py:219-221 modify_score)
    quantize_fn: Optional[Callable] = None,  # quantize_denoised hook:
                                   # pred_x0 -> first-stage quantizer
                                   # output (ddim.py:239-240; VQ models)
    cfg_interval: int = 1,         # >1: recompute the uncond branch only
                                   # every k-th step; between, reuse the
                                   # cached (cond - uncond) difference and
                                   # run the model at HALF batch. An
                                   # approximation (turbo knob, off by
                                   # default) — the uncond direction
                                   # drifts slowly across adjacent steps.
    # --- DeepCache (turbo knob, off by default) ---
    deepcache_interval: int = 0,   # >0: full UNet every k-th step; between,
                                   # reuse the deep-segment feature and run
                                   # only the shallow blocks (the deep UNet
                                   # drifts slowly across adjacent steps)
    deepcache_fns=None,            # (full_fn(x,t,ctx)->(out,deep),
                                   #  cached_fn(x,t,ctx,deep)->out), both
                                   # over the CFG-doubled batch
    deepcache_init=None,           # zeros of the deep feature shape
    cfg_dedup: bool = False,       # CFG stem dedup (exact, not a turbo
                                   # knob): run the UNet stem once on the
                                   # half batch and double at the first
                                   # cross-attention; requires a
                                   # tuple-ctx-aware model_fn (see
                                   # cfg_model_call)
):
    """Run t_enc guided DDIM steps from x_latent. Returns final x0 latent.

    The decode walks ddim steps index t_enc-1 .. 0 (timesteps flipped),
    exactly the reference's `decode` loop (guided_ldm.py:133-158).

    ``tile_noise``: draw each stochastic term with batch 1 and broadcast
    over the batch — makes a batched call bit-replicate B independent
    single-frame calls with the same fixed seed (the reference reseeds
    1234 per frame, so every frame sees identical noise;
    ofgen_pixel_inpaint.py:235-236).
    """
    if t_enc == 0:
        return x_latent
    b = x_latent.shape[0]
    idxs = jnp.arange(t_enc - 1, -1, -1, dtype=jnp.int32)       # [t_enc]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_keys = jax.random.split(rng, t_enc)

    use_guidance = guidance_latent is not None and guidance_strength is not None
    use_inpaint = init_latent is not None and nmask is not None
    if use_inpaint and renoise_gate is None:
        renoise_gate = jnp.ones((t_enc,), jnp.float32)

    use_deepcache = deepcache_interval > 0
    if use_deepcache:
        assert deepcache_fns is not None and deepcache_init is not None
        assert cfg_interval == 1, "deepcache and cfg caching don't compose"

    def step(carry, scan_in):
        x, cfg_diff, dc = carry
        i, key, index = scan_in["i"], scan_in["key"], scan_in["index"]
        ts = jnp.full((b,), ddim.timesteps[index], jnp.int32)

        if use_inpaint:
            k_noise, key = jax.random.split(key)
            gate = renoise_gate[i] > 0
            nshape = (1,) + x.shape[1:] if tile_noise else x.shape
            noise = jnp.broadcast_to(
                jax.random.normal(k_noise, nshape, x.dtype), x.shape)
            noised_init = q_sample(sched, init_latent, ts, noise)
            nm = nmask.astype(x.dtype)
            x = jnp.where(gate, (1.0 - nm) * noised_init + nm * x, x)

        control = None
        if control_residuals is not None:
            w = control_weights[i]
            control = None
            for j, res in enumerate(control_residuals):
                scaled = tuple(r * w[j].astype(r.dtype) for r in res)
                control = scaled if control is None else \
                    tuple(a + b for a, b in zip(control, scaled))

        scale_i = cfg_schedule[i] if cfg_schedule is not None else cfg_scale
        new_dc = dc
        if use_deepcache:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([ts, ts], axis=0)
            ctx2 = jnp.concatenate([uncond.crossattn, cond.crossattn], 0)
            if cond.concat is not None:
                cc = jnp.concatenate([uncond.concat, cond.concat], 0)
                x_in = jnp.concatenate([x_in, cc.astype(x_in.dtype)], -1)
            full_fn, cached_fn = deepcache_fns

            def _full(_):
                return full_fn(x_in, t_in, ctx2)

            def _cached(_):
                return cached_fn(x_in, t_in, ctx2, dc), dc

            out2, new_dc = jax.lax.cond(i % deepcache_interval == 0,
                                        _full, _cached, None)
            o_u, o_c = jnp.split(out2, 2, axis=0)
            model_out = o_u + scale_i * (o_c - o_u)
            new_diff = cfg_diff
        elif cfg_interval > 1:
            # CFG caching: e = e_u + s(e_c - e_u) = e_c + (s-1)(e_c - e_u);
            # full steps refresh the cached difference, cached steps run
            # only the cond branch (half batch through the UNet).
            def _full(_):
                x_in = jnp.concatenate([x, x], axis=0)
                t_in = jnp.concatenate([ts, ts], axis=0)
                ctx = jnp.concatenate([uncond.crossattn, cond.crossattn], 0)
                if cond.concat is not None:
                    cc = jnp.concatenate([uncond.concat, cond.concat], 0)
                    x_in = jnp.concatenate([x_in, cc.astype(x_in.dtype)], -1)
                out = model_fn(x_in, t_in, ctx, control)
                o_u, o_c = jnp.split(out, 2, axis=0)
                return o_c, o_c - o_u

            def _cached(_):
                x_in = x
                if cond.concat is not None:
                    x_in = jnp.concatenate(
                        [x, cond.concat.astype(x.dtype)], -1)
                ctrl_c = None if control is None else \
                    tuple(r[r.shape[0] // 2:] for r in control)
                o_c = model_fn(x_in, ts, cond.crossattn, ctrl_c)
                return o_c, cfg_diff

            o_c, new_diff = jax.lax.cond(i % cfg_interval == 0,
                                         _full, _cached, None)
            model_out = o_c + (scale_i - 1.0) * new_diff
        else:
            new_diff = cfg_diff
            model_out = cfg_model_call(model_fn, x, ts, cond, uncond,
                                       scale_i, control=control,
                                       dedup=cfg_dedup)
        if parameterization == "v":
            e_t = predict_eps_from_z_and_v(sched, x, ts, model_out)
        else:
            e_t = model_out
        if score_fn is not None:
            e_t = score_fn(e_t, x, ts, i)

        a_t = ddim.alphas[index].astype(x.dtype)
        a_prev = ddim.alphas_prev[index].astype(x.dtype)
        sqrt_1m_at = ddim.sqrt_one_minus_alphas[index].astype(x.dtype)
        sigma_t = ddim.sigmas[index].astype(x.dtype)

        pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)

        if quantize_fn is not None:
            pred_x0 = quantize_fn(pred_x0)

        if dynamic_threshold is not None:
            # thresholds pred_x0 only; dir_xt keeps the raw e_t
            # (plms.py:216-219 semantics; base ddim.py:242 left this
            # NotImplementedError — implemented here)
            from .sampling_util import norm_thresholding
            pred_x0 = norm_thresholding(pred_x0, dynamic_threshold)

        if use_guidance and guidance_space == "latent":
            gs = guidance_strength[i].astype(x.dtype)
            pred_x0 = pred_x0 * (1.0 - gs) + guidance_latent.astype(x.dtype) * gs
            e_t = (x - jnp.sqrt(a_t) * pred_x0) / sqrt_1m_at
        elif use_guidance and guidance_space == "pixel":
            # noised_blending (guided_ldm.py:105-117): noise the guidance
            # latent to the NEXT index, predict ITS x0 with the same CFG
            # model, decode both x0s, blend in pixel space, re-encode.
            assert pixel_fns is not None, "pixel guidance needs vae fns"
            vae_encode, vae_decode = pixel_fns
            k_g, k_e, key = jax.random.split(key, 3)
            g_noise = jax.random.normal(k_g, x.shape, x.dtype)
            idx1 = jnp.minimum(index + 1, ddim.timesteps.shape[0] - 1)
            a_g = jnp.sqrt(ddim.alphas[idx1]).astype(x.dtype)
            s_g = ddim.sqrt_one_minus_alphas[idx1].astype(x.dtype)
            g_noised = a_g * guidance_latent.astype(x.dtype) + s_g * g_noise
            g_out = cfg_model_call(model_fn, g_noised, ts, cond, uncond,
                                   scale_i, control=control,
                                   dedup=cfg_dedup)
            if parameterization == "v":
                e_g = predict_eps_from_z_and_v(sched, g_noised, ts, g_out)
            else:
                e_g = g_out
            pred_x0_g = (g_noised - sqrt_1m_at * e_g) / jnp.sqrt(a_t)
            dec = vae_decode(pred_x0)
            dec_g = vae_decode(pred_x0_g)
            gs = guidance_strength[i].astype(x.dtype)
            # pixel-space strength broadcast: latent-res maps upsample by
            # the VAE's spatial factor (8 for SD; derived from shapes)
            if gs.ndim >= 3 and gs.shape[-3] > 1 \
                    and gs.shape[-3] != dec.shape[-3]:
                f = dec.shape[-3] // gs.shape[-3]
                gs = jnp.repeat(jnp.repeat(gs, f, axis=-3), f, axis=-2)
            blended = jnp.clip(dec * (1.0 - gs) + dec_g * gs, -1.0, 1.0)
            pred_x0 = vae_encode(blended, k_e)
            e_t = (x - jnp.sqrt(a_t) * pred_x0) / sqrt_1m_at

        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t ** 2, 0.0)) * e_t
        k_sig, k_drop = jax.random.split(key)
        nshape = (1,) + x.shape[1:] if tile_noise else x.shape
        noise = sigma_t * jnp.broadcast_to(
            jax.random.normal(k_sig, nshape, x.dtype), x.shape) * temperature
        if noise_dropout > 0.0:
            keep = jax.random.bernoulli(k_drop, 1.0 - noise_dropout,
                                        noise.shape)
            noise = jnp.where(keep, noise / (1.0 - noise_dropout), 0.0)
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
        return (x_prev, new_diff, new_dc), None

    scan_ins = {"i": jnp.arange(t_enc, dtype=jnp.int32),
                "key": step_keys, "index": idxs}
    diff0 = jnp.zeros_like(x_latent)    # refreshed at i=0 (always full)
    dc0 = deepcache_init if deepcache_init is not None \
        else jnp.zeros((1,), x_latent.dtype)
    (x_final, _, _), _ = jax.lax.scan(step, (x_latent, diff0, dc0),
                                      scan_ins)
    return x_final


def ddim_sample(
    model_fn: Callable,
    sched: DiffusionSchedule,
    ddim: DDIMParams,
    cond: CondBundle,
    uncond: CondBundle,
    *,
    shape=None,                     # [B, h, w, C] latent shape (x_T drawn)
    x_T: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    cfg_scale: float = 7.0,
    parameterization: str = "eps",
    mask: Optional[jnp.ndarray] = None,   # 1 = KEEP (re-noised) x0
    x0: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    noise_dropout: float = 0.0,
    dynamic_threshold: Optional[float] = None,
    cfg_schedule=None,
    score_fn: Optional[Callable] = None,
    tile_noise: bool = False,
    dtype=None,
):
    """Full-chain DDIM sampling from pure noise — the base sampler's
    ``sample``/``ddim_sampling`` surface (reference: ddim.py:54-179) as
    one scan over every DDIM step.

    Mask polarity matches ``sample`` (ddim.py:154-157:
    ``img = q_sample(x0, ts) * mask + (1 - mask) * img`` — mask 1 keeps
    the re-noised known region), which is the INVERSE of the inpaint
    facade's nmask (guided_ldm_inpainting.py:127-129); the conversion is
    nmask = 1 - mask.
    """
    if x_T is None:
        assert shape is not None and rng is not None
        k_T, rng = jax.random.split(rng)
        x_T = jax.random.normal(k_T, tuple(shape),
                                dtype or jnp.float32)
    n_steps = int(ddim.timesteps.shape[0])
    nmask = None if mask is None else (1.0 - mask)
    return ddim_decode(
        model_fn, sched, ddim, x_T, cond, uncond, n_steps,
        cfg_scale=cfg_scale, parameterization=parameterization, rng=rng,
        init_latent=x0, nmask=nmask,
        dynamic_threshold=dynamic_threshold, temperature=temperature,
        noise_dropout=noise_dropout, cfg_schedule=cfg_schedule,
        score_fn=score_fn, tile_noise=tile_noise)


def ddim_encode(
    model_fn: Callable,
    sched: DiffusionSchedule,
    ddim: DDIMParams,
    x0: jnp.ndarray,
    cond: CondBundle,
    uncond: Optional[CondBundle] = None,
    t_enc: Optional[int] = None,
    *,
    cfg_scale: float = 1.0,
    timestep_indexing: str = "index",
):
    """Deterministic DDIM inversion: run x0 UP the chain for ``t_enc``
    steps (reference: ddim.py:253-298 ``encode``).

    Recurrence (ddim.py:283-286):
      x_{i+1} = sqrt(a_next/a) * x_i
                + sqrt(a_next) * (sqrt(1/a_next - 1) - sqrt(1/a - 1)) * e_t
    with a = ddim_alphas_prev[i], a_next = ddim_alphas[i].

    ``timestep_indexing``: the reference feeds the LOOP INDEX ``i`` to the
    model as the timestep (ddim.py:273 ``torch.full(..., i)``), not the
    ddim timestep — 'index' preserves that quirk bit-for-bit; 'timestep'
    feeds ddim.timesteps[i] (the arguably-intended schedule).
    """
    t_enc = t_enc if t_enc is not None else int(ddim.timesteps.shape[0])
    b = x0.shape[0]
    use_cfg = cfg_scale != 1.0 and uncond is not None

    def step(x, i):
        if timestep_indexing == "index":
            ts = jnp.broadcast_to(i.astype(jnp.int32), (b,))
        else:
            ts = jnp.full((b,), ddim.timesteps[i], jnp.int32)
        if use_cfg:
            e_t = cfg_model_call(model_fn, x, ts, cond, uncond, cfg_scale)
        else:
            e_t = model_fn(x, ts, cond.crossattn, None)
        a = ddim.alphas_prev[i].astype(x.dtype)
        a_next = ddim.alphas[i].astype(x.dtype)
        x_w = jnp.sqrt(a_next / a) * x
        noise_w = jnp.sqrt(a_next) * (
            jnp.sqrt(1.0 / a_next - 1.0) - jnp.sqrt(1.0 / a - 1.0)) * e_t
        return x_w + noise_w, None

    x_next, _ = jax.lax.scan(step, x0, jnp.arange(t_enc, dtype=jnp.int32))
    return x_next


def guidance_progress(t_enc: int, total_steps: int):
    """Per-step denoise progress p handed to guidance schedules
    (guided_ldm.py:148-151): p_i = (i + (S - t_enc) + 1) / S."""
    import numpy as np
    i = np.arange(t_enc)
    return (i + (total_steps - t_enc) + 1) / total_steps
