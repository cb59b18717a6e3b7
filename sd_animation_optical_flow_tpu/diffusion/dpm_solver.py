"""DPM-Solver++(2M) sampler as a single `lax.scan`.

The reference vendors PLMS and DPM-Solver samplers unused
(reference: ldm/models/diffusion/plms.py, dpm_solver/ — SURVEY §7
recommends DPM-Solver as the cheap step-count win). This is the
data-prediction multistep variant (DPM-Solver++ 2M): second-order in
the log-SNR domain, deterministic, ~2x fewer steps than DDIM at equal
quality. Supports the same CFG + masked re-noising inpaint hooks as
diffusion/ddim.py so facades can swap samplers.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ddim import CondBundle, cfg_model_call
from .schedule import DiffusionSchedule, predict_eps_from_z_and_v, q_sample


def _coeffs(sched: DiffusionSchedule, timesteps):
    ac = sched.alphas_cumprod[timesteps]
    alpha = jnp.sqrt(ac)
    sigma = jnp.sqrt(1.0 - ac)
    lam = jnp.log(alpha) - jnp.log(sigma)
    return alpha, sigma, lam


def dpmpp_2m_decode(
    model_fn: Callable,
    sched: DiffusionSchedule,
    timesteps: jnp.ndarray,          # [S+1] descending ddpm timesteps;
                                     # x enters at noise level timesteps[0]
    x: jnp.ndarray,
    cond: CondBundle,
    uncond: CondBundle,
    *,
    cfg_scale: float = 7.0,
    parameterization: str = "eps",
    rng: Optional[jax.Array] = None,
    init_latent: Optional[jnp.ndarray] = None,
    nmask: Optional[jnp.ndarray] = None,
    renoise_gate: Optional[jnp.ndarray] = None,   # [S]
):
    """Run S = len(timesteps)-1 second-order steps. Returns x0 latent."""
    n_steps = int(timesteps.shape[0]) - 1
    if n_steps <= 0:
        return x
    b = x.shape[0]
    alpha, sigma, lam = _coeffs(sched, timesteps)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_keys = jax.random.split(rng, n_steps)
    use_inpaint = init_latent is not None and nmask is not None
    if use_inpaint and renoise_gate is None:
        renoise_gate = jnp.ones((n_steps,), jnp.float32)

    def predict_x0(x, i):
        ts = jnp.full((b,), timesteps[i], jnp.int32)
        out = cfg_model_call(model_fn, x, ts, cond, uncond, cfg_scale)
        if parameterization == "v":
            eps = predict_eps_from_z_and_v(sched, x, ts, out)
        else:
            eps = out
        return (x - sigma[i].astype(x.dtype) * eps) \
            / alpha[i].astype(x.dtype)

    def step(carry, scan_in):
        x, x0_prev, has_prev = carry
        i, key = scan_in["i"], scan_in["key"]

        if use_inpaint:
            ts = jnp.full((b,), timesteps[i], jnp.int32)
            gate = renoise_gate[i] > 0
            noise = jax.random.normal(key, x.shape, x.dtype)
            noised = q_sample(sched, init_latent, ts, noise)
            nm = nmask.astype(x.dtype)
            x = jnp.where(gate, (1.0 - nm) * noised + nm * x, x)

        x0 = predict_x0(x, i)
        h = lam[i + 1] - lam[i]
        h_prev = lam[i] - lam[jnp.maximum(i - 1, 0)]
        r = h_prev / jnp.where(h == 0, 1.0, h)
        # 2M correction only when a previous x0 exists and r is sane.
        # Combine in f32 (r spans decades) and cast back so the scan
        # carry keeps x's dtype under bf16 inference.
        use2 = has_prev & (jnp.abs(r) > 1e-5)
        x0f = x0.astype(jnp.float32)
        d = jnp.where(use2,
                      (1 + 1 / (2 * r)) * x0f
                      - (1 / (2 * r)) * x0_prev.astype(jnp.float32),
                      x0f).astype(x.dtype)
        x_next = (sigma[i + 1] / sigma[i]).astype(x.dtype) * x \
            - (alpha[i + 1] * jnp.expm1(-h)).astype(x.dtype) * d
        return (x_next, x0, jnp.asarray(True)), None

    idxs = jnp.arange(n_steps, dtype=jnp.int32)
    (x, x0_last, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x), jnp.asarray(False)),
        {"i": idxs, "key": step_keys})
    return x0_last   # final x carries sigma[last]≈0; x0 is the sample


def uniform_timesteps_desc(sched: DiffusionSchedule, t_start: int,
                           num_steps: int):
    """[num_steps+1] descending ddpm timesteps from t_start down to ~1,
    matching the img2img t_enc entry point."""
    ts = jnp.linspace(t_start, 1, num_steps + 1)
    return jnp.round(ts).astype(jnp.int32)
