"""DDPM ancestral sampling — the reference's p_sample machinery.

Parity surface of DDPM.q_mean_variance / q_posterior / p_mean_variance /
p_sample / p_sample_loop (reference: ldm/models/diffusion/ddpm.py:272-354)
and the CFG-batched LatentDiffusion variant (ddpm.py:1026-1382), as pure
scanned step functions. Posterior coefficients are derived on the fly
from the schedule (ddpm.py:170-192 buffer registration, v_posterior=0):

  posterior_variance   = beta_t (1 - acp_{t-1}) / (1 - acp_t)
  posterior_mean_coef1 = beta_t sqrt(acp_{t-1}) / (1 - acp_t)
  posterior_mean_coef2 = (1 - acp_{t-1}) sqrt(alpha_t) / (1 - acp_t)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ddim import CondBundle, cfg_model_call
from .schedule import DiffusionSchedule, predict_start_from_z_and_v


class PosteriorCoefs(NamedTuple):
    variance: jnp.ndarray                 # [T]
    log_variance_clipped: jnp.ndarray     # [T]
    mean_coef1: jnp.ndarray               # [T]
    mean_coef2: jnp.ndarray               # [T]
    sqrt_recip_acp: jnp.ndarray           # [T]
    sqrt_recipm1_acp: jnp.ndarray         # [T]


def posterior_coefs(sched: DiffusionSchedule,
                    v_posterior: float = 0.0) -> PosteriorCoefs:
    """ddpm.py:170-192 buffers (v_posterior mixes in beta_t directly)."""
    betas = sched.betas
    acp = sched.alphas_cumprod
    acp_prev = sched.alphas_cumprod_prev
    alphas = 1.0 - betas
    var = ((1.0 - v_posterior) * betas * (1.0 - acp_prev) / (1.0 - acp)
           + v_posterior * betas)
    return PosteriorCoefs(
        variance=var,
        log_variance_clipped=jnp.log(jnp.maximum(var, 1e-20)),
        mean_coef1=betas * jnp.sqrt(acp_prev) / (1.0 - acp),
        mean_coef2=(1.0 - acp_prev) * jnp.sqrt(alphas) / (1.0 - acp),
        sqrt_recip_acp=jnp.sqrt(1.0 / acp),
        sqrt_recipm1_acp=jnp.sqrt(1.0 / acp - 1.0),
    )


def _gather(a, t, ndim):
    return a[t].reshape((t.shape[0],) + (1,) * (ndim - 1))


def q_mean_variance(sched: DiffusionSchedule, x0, t):
    """q(x_t | x_0) moments (ddpm.py:272-281)."""
    mean = _gather(sched.sqrt_alphas_cumprod, t, x0.ndim) * x0
    var = _gather(1.0 - sched.alphas_cumprod, t, x0.ndim)
    log_var = jnp.log(var)
    return mean, var, log_var


def predict_start_from_noise(pc: PosteriorCoefs, x_t, t, noise):
    """x0-hat from eps (ddpm.py:283-287)."""
    return (_gather(pc.sqrt_recip_acp, t, x_t.ndim) * x_t
            - _gather(pc.sqrt_recipm1_acp, t, x_t.ndim) * noise)


def q_posterior(pc: PosteriorCoefs, x0, x_t, t):
    """q(x_{t-1} | x_t, x_0) moments (ddpm.py:296-302)."""
    mean = (_gather(pc.mean_coef1, t, x0.ndim) * x0
            + _gather(pc.mean_coef2, t, x0.ndim) * x_t)
    var = _gather(pc.variance, t, x0.ndim)
    log_var = _gather(pc.log_variance_clipped, t, x0.ndim)
    return mean, var, log_var


def p_mean_variance(model_fn: Callable, sched: DiffusionSchedule,
                    pc: PosteriorCoefs, x, t, cond: CondBundle,
                    uncond: Optional[CondBundle] = None, *,
                    cfg_scale: float = 1.0,
                    parameterization: str = "eps",
                    clip_denoised: bool = True):
    """Model -> x0-hat -> posterior moments (ddpm.py:304-315 and the
    CFG-batched LatentDiffusion form, ddpm.py:1026-1044)."""
    if cfg_scale != 1.0 and uncond is not None:
        out = cfg_model_call(model_fn, x, t, cond, uncond, cfg_scale)
    else:
        x_in = x
        if cond.concat is not None:
            x_in = jnp.concatenate([x, cond.concat.astype(x.dtype)], -1)
        out = model_fn(x_in, t, cond.crossattn, None)
    if parameterization == "v":
        x0 = predict_start_from_z_and_v(sched, x, t, out)
    elif parameterization == "x0":
        x0 = out
    else:
        x0 = predict_start_from_noise(pc, x, t, out)
    if clip_denoised:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return q_posterior(pc, x0, x, t)


def p_sample(model_fn: Callable, sched: DiffusionSchedule,
             pc: PosteriorCoefs, x, t, cond: CondBundle,
             uncond: Optional[CondBundle] = None, *, rng,
             cfg_scale: float = 1.0, parameterization: str = "eps",
             clip_denoised: bool = True, temperature: float = 1.0):
    """One ancestral step (ddpm.py:317-325): mean + mask * std * noise,
    with the noise zeroed at t == 0."""
    mean, _var, log_var = p_mean_variance(
        model_fn, sched, pc, x, t, cond, uncond, cfg_scale=cfg_scale,
        parameterization=parameterization, clip_denoised=clip_denoised)
    noise = jax.random.normal(rng, x.shape, x.dtype) * temperature
    nonzero = (t > 0).astype(x.dtype).reshape((x.shape[0],)
                                              + (1,) * (x.ndim - 1))
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise


def p_sample_loop(model_fn: Callable, sched: DiffusionSchedule,
                  cond: CondBundle, uncond: Optional[CondBundle] = None, *,
                  shape=None, x_T: Optional[jnp.ndarray] = None,
                  rng, cfg_scale: float = 1.0,
                  parameterization: str = "eps",
                  clip_denoised: bool = True, temperature: float = 1.0,
                  v_posterior: float = 0.0,
                  return_intermediates: int = 0):
    """Full T-step ancestral chain from noise (ddpm.py:327-345;
    LatentDiffusion.p_sample_loop ddpm.py:1046-1081) as one scan.

    ``return_intermediates`` > 0 additionally returns that many evenly
    spaced x_t snapshots (log_every_t contract, oldest first)."""
    pc = posterior_coefs(sched, v_posterior)
    if x_T is None:
        assert shape is not None
        k0, rng = jax.random.split(rng)
        x_T = jax.random.normal(k0, tuple(shape))
    T = sched.num_timesteps
    b = x_T.shape[0]
    keys = jax.random.split(rng, T)
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

    def step(x, scan_in):
        t_scalar, key = scan_in
        t = jnp.full((b,), t_scalar, jnp.int32)
        x = p_sample(model_fn, sched, pc, x, t, cond, uncond, rng=key,
                     cfg_scale=cfg_scale, parameterization=parameterization,
                     clip_denoised=clip_denoised, temperature=temperature)
        return x, x if return_intermediates else None

    x, inter = jax.lax.scan(step, x_T, (ts, keys))
    if return_intermediates:
        n = return_intermediates
        idx = jnp.linspace(0, T - 1, n).astype(jnp.int32)
        return x, inter[idx]
    return x
