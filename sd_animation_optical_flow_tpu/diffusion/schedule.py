"""Diffusion beta schedules and DDIM sub-schedules.

Numerical parity with the reference's schedule registration
(reference: ldm/models/diffusion/ddpm.py:138-192,
ldm/modules/diffusionmodules/util.py:21-74): linear betas
sqrt-spaced from linear_start to linear_end, uniform DDIM timestep
selection with the +1 shift, and eta-scaled DDIM sigmas.

Everything is precomputed into plain arrays so samplers can gather
per-step scalars inside a `lax.scan` without recomputation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DiffusionSchedule:
    betas: jnp.ndarray                    # [T]
    alphas_cumprod: jnp.ndarray           # [T]
    alphas_cumprod_prev: jnp.ndarray      # [T]
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_linear_schedule(timesteps: int = 1000,
                         linear_start: float = 0.00085,
                         linear_end: float = 0.0120) -> DiffusionSchedule:
    betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5, timesteps,
                        dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
    )


def q_sample(sched: DiffusionSchedule, x0, t, noise):
    """Forward noising q(x_t | x_0) (ddpm.py:356-359). t: [B] int."""
    a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1).astype(x0.dtype)
    s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1).astype(x0.dtype)
    return a * x0 + s * noise


def predict_eps_from_z_and_v(sched: DiffusionSchedule, x_t, t, v):
    """v-parameterization -> eps (ddpm.py:290-302)."""
    a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1).astype(x_t.dtype)
    s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1).astype(x_t.dtype)
    return a * v + s * x_t


def predict_start_from_z_and_v(sched: DiffusionSchedule, x_t, t, v):
    a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1).astype(x_t.dtype)
    s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1).astype(x_t.dtype)
    return a * x_t - s * v


def get_v(sched: DiffusionSchedule, x0, t, noise):
    a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1).astype(x0.dtype)
    s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1).astype(x0.dtype)
    return a * noise - s * x0


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DDIMParams:
    timesteps: jnp.ndarray      # [S] int32 ddpm timesteps (shifted by +1)
    alphas: jnp.ndarray         # [S] alpha_cumprod at those timesteps
    alphas_prev: jnp.ndarray    # [S]
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray         # [S] (0 for eta=0)

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def make_ddim_params(sched: DiffusionSchedule, num_steps: int,
                     eta: float = 0.0,
                     discretize: str = "uniform") -> DDIMParams:
    T = sched.num_timesteps
    if discretize == "uniform":
        c = T // num_steps
        ts = np.arange(0, T, c)
    elif discretize == "quad":
        ts = (np.linspace(0, np.sqrt(T * 0.8), num_steps) ** 2).astype(int)
    else:
        raise ValueError(f"unknown ddim discretization {discretize!r}")
    ts = ts + 1   # the reference's +1 shift (util.py:56)

    ac = np.asarray(sched.alphas_cumprod)
    alphas = ac[ts]
    alphas_prev = np.concatenate([[ac[0]], ac[ts[:-1]]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas)
                           * (1 - alphas / alphas_prev))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return DDIMParams(
        timesteps=jnp.asarray(ts, jnp.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        sigmas=f32(sigmas),
    )


def make_ddim_params_traced(sched: DiffusionSchedule, num_steps: int,
                            eta: float = 0.0) -> DDIMParams:
    """Trace-safe uniform DDIM params (usable inside jit where ``sched``
    arrays are traced): pure gathers over schedule arrays."""
    T = sched.num_timesteps
    c = T // num_steps
    ts = jnp.arange(0, T, c, dtype=jnp.int32)[:num_steps] + 1
    ac = sched.alphas_cumprod
    alphas = ac[ts]
    alphas_prev = jnp.concatenate([ac[0:1], ac[ts[:-1]]])
    sigmas = eta * jnp.sqrt((1 - alphas_prev) / (1 - alphas)
                            * (1 - alphas / alphas_prev))
    return DDIMParams(
        timesteps=ts,
        alphas=alphas.astype(jnp.float32),
        alphas_prev=alphas_prev.astype(jnp.float32),
        sqrt_one_minus_alphas=jnp.sqrt(1.0 - alphas).astype(jnp.float32),
        sigmas=sigmas.astype(jnp.float32),
    )
