"""Diagonal Gaussian posterior utilities.

Parity with DiagonalGaussianDistribution (reference:
ldm/modules/distributions/distributions.py:24-63): sample / mode / KL /
NLL over (mean, logvar) moment pairs with the clamped logvar convention
(clamping happens at encode time, models/vae.py encode_moments).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def sample(mean, logvar, rng):
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def mode(mean, logvar):
    return mean


def kl(mean, logvar, other_mean=None, other_logvar=None,
       axes=(1, 2, 3)):
    """KL(this || other); other defaults to N(0, I)."""
    var = jnp.exp(logvar)
    if other_mean is None:
        return 0.5 * jnp.sum(mean ** 2 + var - 1.0 - logvar, axis=axes)
    other_var = jnp.exp(other_logvar)
    return 0.5 * jnp.sum(
        (mean - other_mean) ** 2 / other_var + var / other_var
        - 1.0 - logvar + other_logvar, axis=axes)


def nll(mean, logvar, x, axes=(1, 2, 3)):
    logtwopi = math.log(2.0 * math.pi)
    return 0.5 * jnp.sum(
        logtwopi + logvar + (x - mean) ** 2 / jnp.exp(logvar), axis=axes)
