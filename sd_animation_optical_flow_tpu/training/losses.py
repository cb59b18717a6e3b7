"""Diffusion training losses.

The reference carries the full LatentDiffusion training machinery,
dormant at runtime (reference: ldm/models/diffusion/ddpm.py:367-463,
957-993 — p_losses with eps/x0/v parameterizations). Here the same
objective is a pure function used by the sharded train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..diffusion.schedule import DiffusionSchedule, get_v, q_sample
from ..models import unet as U


def p_losses(unet_params, unet_cfg: U.UNetConfig, sched: DiffusionSchedule,
             x0, context, rng, *, parameterization: str = "eps",
             c_concat=None, y=None):
    """Simple diffusion loss (ddpm.py:957-993 without the learned-logvar
    and ELBO extras): sample t ~ U[0, T), noise x0, predict, MSE.

    ``c_concat``: hybrid channel-concat conditioning (mask+masked-image
    for LatentInpaintDiffusion, depth for LatentDepth2ImageDiffusion,
    low-res for the upscalers — the LatentFinetuneDiffusion family,
    ddpm.py:1532-1754). Noised latent channels carry the noise; the
    conditioning channels are concatenated clean each step.
    ``y``: int class/adm labels (e.g. the upscaler's noise level)."""
    b = x0.shape[0]
    k_t, k_noise = jax.random.split(rng)
    t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
    noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
    x_noisy = q_sample(sched, x0, t, noise)
    if c_concat is not None:
        x_noisy = jnp.concatenate(
            [x_noisy, c_concat.astype(x_noisy.dtype)], axis=-1)
    pred, _ = U.unet_apply(unet_params, unet_cfg, x_noisy, t, context, y=y)
    if parameterization == "eps":
        target = noise
    elif parameterization == "v":
        target = get_v(sched, x0, t, noise)
    elif parameterization == "x0":
        target = x0
    else:
        raise ValueError(parameterization)
    return jnp.mean((pred - target) ** 2)
