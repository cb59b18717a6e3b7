"""PLMS (pseudo linear multistep) sampler as a `lax.scan`.

Parity with the vendored PLMS sampler (reference: ldm/models/diffusion/
plms.py — present but unused by the entry points): Adams-Bashforth
multistep over eps predictions with the standard warm-up (2nd eval at
t_prev for step 0), eta=0 only, CFG batch doubling.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ddim import CondBundle, cfg_model_call
from .schedule import DDIMParams, DiffusionSchedule, predict_eps_from_z_and_v


def plms_decode(model_fn: Callable, sched: DiffusionSchedule,
                ddim: DDIMParams, x: jnp.ndarray, cond: CondBundle,
                uncond: CondBundle, t_enc: int, *,
                cfg_scale: float = 7.0, parameterization: str = "eps",
                rng: Optional[jax.Array] = None,
                dynamic_threshold: Optional[float] = None):
    """Run t_enc PLMS steps from DDIM index t_enc-1 down to 0."""
    if t_enc == 0:
        return x
    b = x.shape[0]

    def eps_at(x, index):
        ts = jnp.full((b,), ddim.timesteps[index], jnp.int32)
        out = cfg_model_call(model_fn, x, ts, cond, uncond, cfg_scale)
        if parameterization == "v":
            return predict_eps_from_z_and_v(sched, x, ts, out)
        return out

    def x_prev_from(x, e_t, index):
        a_t = ddim.alphas[index].astype(x.dtype)
        a_prev = ddim.alphas_prev[index].astype(x.dtype)
        s1m = ddim.sqrt_one_minus_alphas[index].astype(x.dtype)
        pred_x0 = (x - s1m * e_t) / jnp.sqrt(a_t)
        if dynamic_threshold is not None:
            # pred_x0-only rescale; dir_xt keeps raw e_t (plms.py:216-219)
            from .sampling_util import norm_thresholding
            pred_x0 = norm_thresholding(pred_x0, dynamic_threshold)
        dir_xt = jnp.sqrt(1.0 - a_prev) * e_t
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt

    def step(carry, i):
        x, old = carry               # old: [4, ...] ring of past eps
        index = t_enc - 1 - i
        e_t = eps_at(x, index)
        n_old = jnp.minimum(i, 3)

        # Adams-Bashforth blend orders 1..4 (plms.py warm-up semantics;
        # step 0 uses the 2-eval predictor-corrector below)
        e1 = e_t
        e2 = (3 * e_t - old[0]) / 2
        e3 = (23 * e_t - 16 * old[0] + 5 * old[1]) / 12
        e4 = (55 * e_t - 59 * old[0] + 37 * old[1] - 9 * old[2]) / 24
        e_prime = jax.lax.switch(n_old, [lambda: e1, lambda: e2,
                                         lambda: e3, lambda: e4])

        def first_step():
            # predictor-corrector: eval at x_prev with index-1
            x_prev0 = x_prev_from(x, e_t, index)
            e_next = eps_at(x_prev0, jnp.maximum(index - 1, 0))
            return (e_t + e_next) / 2

        e_use = jax.lax.cond(i == 0, first_step, lambda: e_prime)
        x_new = x_prev_from(x, e_use, index)
        old = jnp.roll(old, 1, axis=0).at[0].set(e_t)
        return (x_new, old), None

    old0 = jnp.zeros((4,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(step, (x, old0),
                             jnp.arange(t_enc, dtype=jnp.int32))
    return x
