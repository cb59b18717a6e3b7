"""Unified multistep sampler engine: one compiled scan, many samplers.

DDIM (eta=0) and DPM-Solver++(2M) steps are both affine updates in
(x, x0, x0_prev):

    x0     = (x - s1m_i * eps_theta(x, t_i)) / sa_i
    d      = (1 + w_i) * x0 - w_i * x0_prev          (w_i = 0 for DDIM /
                                                      first 2M step)
    x_next = c_x_i * x + c_0_i * d

with per-step scalars (t_i, sa_i, s1m_i, c_x_i, c_0_i, w_i) computable
on the host from the noise schedule alone.  This module materializes
those scalars as runtime *data* (`MultistepCoeffs`) consumed by ONE
jitted scan (`multistep_decode`), so switching sampler — or step count,
via inactive padding slots — reuses the same compiled executable.

Why this matters on TPU: each distinct compiled program is a ~140 MB
executable whose first dispatch pays a full load (minutes through a
remote-device link, and real milliseconds even attached).  The
reference instantiates a fresh Python sampler object per choice
(ldm/models/diffusion/ddim.py:300-336, dpm_solver/sampler.py) and pays
a separate CUDA graph/dispatch path per sampler; here every sampler in
the affine-multistep family is the *same* program fed different
coefficient arrays.

Exactness: `make_ddim_coeffs` reproduces `ddim.ddim_decode` (eta=0, no
hooks) and `make_dpmpp_coeffs` reproduces `dpm_solver.dpmpp_2m_decode`
— parity-pinned by tests/test_multistep.py.  The full hook set
(inpaint re-noising, guidance blending, ControlNet windows, KV
capture) stays in ddim.ddim_decode; this engine is the hook-free batch
generation hot path.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import CondBundle, cfg_model_call
from .schedule import DDIMParams, DiffusionSchedule


class MultistepCoeffs(NamedTuple):
    """Per-slot sampler scalars ([S] arrays; runtime data, not trace
    constants). Slots with ``active == 0`` are identity steps that skip
    the model call (`lax.cond` on a scalar predicate executes one
    branch on TPU), so shorter schedules pad to a shared S."""
    timesteps: jnp.ndarray   # [S] int32 ddpm timestep fed to the model
    sa: jnp.ndarray          # [S] f32 sqrt(alpha_cumprod) at the slot
    s1m: jnp.ndarray         # [S] f32 sqrt(1 - alpha_cumprod)
    c_x: jnp.ndarray         # [S] f32 weight of x in the update
    c_0: jnp.ndarray         # [S] f32 weight of d in the update
    w: jnp.ndarray           # [S] f32 previous-x0 mix weight
    active: jnp.ndarray      # [S] bool
    out_x: jnp.ndarray       # scalar f32: weight of final x in output
    out_x0: jnp.ndarray      # scalar f32: weight of last x0 in output

    @property
    def num_slots(self) -> int:
        return int(self.timesteps.shape[0])


def _pad(arrs, n_active, pad_to):
    """Append identity slots (ts 0, sa 1, s1m 0, c_x 1, c_0 0, w 0)."""
    if pad_to is None or pad_to == n_active:
        active = np.ones((n_active,), bool)
        return arrs + (active,)
    assert pad_to > n_active
    k = pad_to - n_active
    ts, sa, s1m, c_x, c_0, w = arrs
    pad1 = lambda a, v: np.concatenate([a, np.full((k,), v, a.dtype)])
    return (pad1(ts, 0), pad1(sa, 1.0), pad1(s1m, 0.0), pad1(c_x, 1.0),
            pad1(c_0, 0.0), pad1(w, 0.0),
            np.concatenate([np.ones((n_active,), bool),
                            np.zeros((k,), bool)]))


def make_ddim_coeffs(ddim: DDIMParams, t_enc: int,
                     pad_to: Optional[int] = None) -> MultistepCoeffs:
    """Exact eta=0 DDIM decode (indices t_enc-1 .. 0, the reference's
    `decode` walk, guided_ldm.py:133-158) as engine coefficients:
    x' = sqrt(a_prev)*x0 + sqrt(1-a_prev)*e  rewritten with
    c_x = sqrt((1-a_prev)/(1-a_t)), c_0 = sqrt(a_prev) - c_x*sqrt(a_t).
    """
    idx = np.arange(t_enc - 1, -1, -1)
    ts = np.asarray(ddim.timesteps)[idx].astype(np.int32)
    a_t = np.asarray(ddim.alphas, np.float64)[idx]
    a_prev = np.asarray(ddim.alphas_prev, np.float64)[idx]
    sa = np.sqrt(a_t)
    s1m = np.asarray(ddim.sqrt_one_minus_alphas, np.float64)[idx]
    c_x = np.sqrt(1.0 - a_prev) / s1m
    c_0 = np.sqrt(a_prev) - c_x * sa
    w = np.zeros((t_enc,))
    arrs = _pad((ts, sa.astype(np.float32), s1m.astype(np.float32),
                 c_x.astype(np.float32), c_0.astype(np.float32),
                 w.astype(np.float32)), t_enc, pad_to)
    return MultistepCoeffs(*(jnp.asarray(a) for a in arrs),
                           out_x=jnp.float32(1.0), out_x0=jnp.float32(0.0))


def make_dpmpp_coeffs(sched: DiffusionSchedule, timesteps,
                      pad_to: Optional[int] = None) -> MultistepCoeffs:
    """DPM-Solver++(2M) (dpm_solver.dpmpp_2m_decode math: data
    prediction, second order in log-SNR) as engine coefficients.
    ``timesteps``: [S+1] descending ddpm timesteps (x enters at
    timesteps[0]); S steps. Output is the last x0 (final sigma ~ 0)."""
    ts_all = np.asarray(timesteps).astype(np.int64)
    n = len(ts_all) - 1
    ac = np.asarray(sched.alphas_cumprod, np.float64)[ts_all]
    alpha = np.sqrt(ac)
    sigma = np.sqrt(1.0 - ac)
    lam = np.log(alpha) - np.log(sigma)
    h = lam[1:] - lam[:-1]                       # [n]
    h_prev = np.concatenate([[0.0], h[:-1]])
    r = h_prev / np.where(h == 0, 1.0, h)
    w = np.where((np.arange(n) >= 1) & (np.abs(r) > 1e-5),
                 1.0 / (2.0 * np.where(r == 0, 1.0, r)), 0.0)
    c_x = sigma[1:] / sigma[:-1]
    c_0 = -alpha[1:] * np.expm1(-h)
    arrs = _pad((ts_all[:n].astype(np.int32), alpha[:n].astype(np.float32),
                 sigma[:n].astype(np.float32), c_x.astype(np.float32),
                 c_0.astype(np.float32), w.astype(np.float32)), n, pad_to)
    return MultistepCoeffs(*(jnp.asarray(a) for a in arrs),
                           out_x=jnp.float32(0.0), out_x0=jnp.float32(1.0))


def multistep_decode(
    model_fn: Callable,
    coeffs: MultistepCoeffs,
    x: jnp.ndarray,
    cond: CondBundle,
    uncond: CondBundle,
    *,
    cfg_scale: float = 7.0,
    cfg_dedup: bool = False,
) -> jnp.ndarray:
    """Run the coefficient schedule over x. Deterministic (eta=0 family;
    no PRNG threading). The prev-x0 mix is combined in f32 and cast back
    so a bf16 carry stays bf16 (dpm_solver bf16-carry lesson,
    tests/test_diffusion.py::test_dpmpp_bf16_carry_dtype_stable)."""
    b = x.shape[0]

    def step(carry, sin):
        def run(ops):
            xc, x0p = ops
            ts = jnp.full((b,), sin["ts"], jnp.int32)
            e = cfg_model_call(model_fn, xc, ts, cond, uncond, cfg_scale,
                               dedup=cfg_dedup)
            x0 = (xc - sin["s1m"].astype(xc.dtype) * e) \
                / sin["sa"].astype(xc.dtype)
            d = ((1.0 + sin["w"]) * x0.astype(jnp.float32)
                 - sin["w"] * x0p.astype(jnp.float32)).astype(xc.dtype)
            xn = sin["c_x"].astype(xc.dtype) * xc \
                + sin["c_0"].astype(xc.dtype) * d
            return xn, x0
        return jax.lax.cond(sin["active"], run, lambda ops: ops,
                            carry), None

    sins = {"ts": coeffs.timesteps, "sa": coeffs.sa, "s1m": coeffs.s1m,
            "c_x": coeffs.c_x, "c_0": coeffs.c_0, "w": coeffs.w,
            "active": coeffs.active}
    (xf, x0f), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), sins)
    return coeffs.out_x.astype(x.dtype) * xf \
        + coeffs.out_x0.astype(x.dtype) * x0f
