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
             x0, context, rng, *, parameterization: str = "eps"):
    """Simple diffusion loss (ddpm.py:957-993 without the learned-logvar
    and ELBO extras): sample t ~ U[0, T), noise x0, predict, MSE."""
    b = x0.shape[0]
    k_t, k_noise = jax.random.split(rng)
    t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
    noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
    x_noisy = q_sample(sched, x0, t, noise)
    pred, _ = U.unet_apply(unet_params, unet_cfg, x_noisy, t, context)
    if parameterization == "eps":
        target = noise
    elif parameterization == "v":
        target = get_v(sched, x0, t, noise)
    elif parameterization == "x0":
        target = x0
    else:
        raise ValueError(parameterization)
    return jnp.mean((pred - target) ** 2)
