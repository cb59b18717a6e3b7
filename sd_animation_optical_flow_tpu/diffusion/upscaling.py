"""Low-res conditioning for latent upscaling diffusion.

Capabilities-parity with the reference's low-scale conditioning stack
(reference: ldm/modules/diffusionmodules/upscaling.py:10-81 and
LatentUpscaleDiffusion.get_input, ddpm.py:1426-1460): a downsampled
image is (optionally) noise-augmented with its own beta schedule and
concatenated to the latent, with the drawn noise level fed to the model
as adm-style conditioning.

Functional form: no modules, just schedule + pure functions so the
whole thing lives inside a jitted sampler step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule, make_linear_schedule, q_sample


@dataclass(frozen=True)
class LowScaleConfig:
    """Defaults mirror AbstractLowScaleModel.register_schedule
    (upscaling.py:17-18: linear 1e-4 -> 2e-2 over 1000 steps)."""
    timesteps: int = 1000
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    max_noise_level: int = 1000


def make_low_scale_schedule(cfg: LowScaleConfig = LowScaleConfig()
                            ) -> DiffusionSchedule:
    return make_linear_schedule(cfg.timesteps, cfg.linear_start,
                                cfg.linear_end)


def simple_image_concat(x_low):
    """SimpleImageConcat: no noise augmentation, constant level 0
    (upscaling.py:57-64)."""
    return x_low, jnp.zeros((x_low.shape[0],), jnp.int32)


def noise_augment(sched: DiffusionSchedule, x_low, rng,
                  noise_level=None, *, max_noise_level: int = 1000):
    """ImageConcatWithNoiseAugmentation.forward (upscaling.py:67-79):
    draw a per-sample noise level (or take the given one), q-sample the
    low-res image to that level, return (z, noise_level)."""
    k_lvl, k_noise = jax.random.split(rng)
    if noise_level is None:
        noise_level = jax.random.randint(
            k_lvl, (x_low.shape[0],), 0, max_noise_level, jnp.int32)
    noise = jax.random.normal(k_noise, x_low.shape, x_low.dtype)
    z = q_sample(sched, x_low, noise_level, noise)
    return z, noise_level


def upscale_conditioning(sched: DiffusionSchedule, x_low, rng,
                         noise_level=None, *,
                         max_noise_level: int = 1000,
                         augment: bool = True):
    """Build the LatentUpscaleDiffusion conditioning dict pieces
    (ddpm.py:1445-1457): c_concat = (noise-augmented) low-res image,
    c_adm = the noise level. Returns (c_concat, c_adm)."""
    if augment:
        return noise_augment(sched, x_low, rng, noise_level,
                             max_noise_level=max_noise_level)
    return simple_image_concat(x_low)
