"""Optimizers: AdamW with EMA "wings".

Capabilities-parity with the reference's AdamWwithEMAandWings
(reference: ldm/util.py:90-196): AdamW whose state additionally carries
an exponential moving average of the parameters, with the warmup-capped
decay ``min(ema_decay, 1 - step^-ema_power)``.

Implemented as an optax GradientTransformation so it composes with the
sharded train step — the EMA lives in the optimizer state pytree and is
updated on-device inside the same jitted program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class EMAWingsState(NamedTuple):
    inner: optax.OptState
    ema_params: dict
    step: jnp.ndarray


def adamw_with_ema_wings(lr: float = 1e-3, b1: float = 0.9,
                         b2: float = 0.999, eps: float = 1e-8,
                         weight_decay: float = 1e-2,
                         ema_decay: float = 0.9999,
                         ema_power: float = 1.0
                         ) -> optax.GradientTransformation:
    """AdamW + parameter-EMA wings. ``update`` must be called with
    ``params`` (like optax.adamw with weight decay)."""
    inner = optax.adamw(lr, b1=b1, b2=b2, eps=eps,
                        weight_decay=weight_decay)

    def init_fn(params):
        return EMAWingsState(
            inner=inner.init(params),
            ema_params=jax.tree.map(
                lambda p: p.astype(jnp.float32), params),
            step=jnp.zeros((), jnp.int32))

    def update_fn(grads, state, params=None):
        assert params is not None, "adamw_with_ema_wings needs params"
        updates, inner_state = inner.update(grads, state.inner, params)
        step = state.step + 1
        # warmup-capped decay (ldm/util.py:194)
        decay = jnp.minimum(ema_decay,
                            1.0 - step.astype(jnp.float32) ** -ema_power)
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p.astype(jnp.float32),
            state.ema_params, new_params)
        return updates, EMAWingsState(inner=inner_state, ema_params=ema,
                                      step=step)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params_of(opt_state) -> dict:
    """Pull the EMA shadow parameters out of a (possibly nested)
    optimizer state containing an EMAWingsState."""
    found = []

    def visit(s):
        if isinstance(s, EMAWingsState):
            found.append(s.ema_params)
        elif isinstance(s, tuple):
            for x in s:
                visit(x)

    visit(opt_state)
    if not found:
        raise ValueError("no EMAWingsState in optimizer state")
    return found[0]
