"""Flash dispatch with non-aligned head dims must match XLA attention."""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from sd_animation_optical_flow_tpu.ops import attention as A


def test_padded_head_dim_flash_matches_xla(np_rng):
    q = np_rng.standard_normal((1, 2048, 2, 40)).astype(np.float32)
    k = np_rng.standard_normal((1, 2048, 2, 40)).astype(np.float32)
    v = np_rng.standard_normal((1, 2048, 2, 40)).astype(np.float32)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    ref = A.xla_attention(qj, kj, vj)
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call,
                                             interpret=True)):
        out = A.attention(qj, kj, vj, use_flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
