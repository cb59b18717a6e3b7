"""Exponential moving average of parameters (training aux).

Parity with LitEma (reference: ldm/modules/ema.py:5-80): shadow pytree,
warm-up decay min(decay, (1+updates)/(10+updates)), swap-in context for
evaluation (the reference's ema_scope, ddpm.py:194-205) — functional:
state in, state out."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    shadow: dict
    num_updates: jnp.ndarray      # int32 scalar


def ema_init(params) -> EMAState:
    return EMAState(shadow=jax.tree.map(jnp.asarray, params),
                    num_updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, params, decay: float = 0.9999) -> EMAState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    shadow = jax.tree.map(lambda s, p: s - (1.0 - d) * (s - p),
                          state.shadow, params)
    return EMAState(shadow=shadow, num_updates=n)


def ema_params(state: EMAState):
    """The evaluation weights (ema_scope equivalent — just use these)."""
    return state.shadow
