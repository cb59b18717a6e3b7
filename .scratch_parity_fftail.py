"""Probe: full-UNet on-chip parity, fused FF-tail route vs unfused.
Run twice: SDAOF_FUSED_FF=1 / =0, each saves its output; second run
compares. See DECISIONS round-3 kernel record for the methodology."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from profile_ops import get_unet, CFGB, DT

tag = os.environ.get("SDAOF_FUSED_FF", "1")
U, p, ucfg = get_unet()
# the SD UNet zero-inits its output conv (and every block's last conv),
# which makes a zero-input parity probe vacuous — perturb all params
_nprng = np.random.default_rng(0)
p = jax.tree.map(
    lambda a: a + jnp.asarray(
        _nprng.standard_normal(a.shape) * 0.02, a.dtype), p)
rng = jax.random.PRNGKey(7)
x = jax.random.normal(rng, (CFGB, 64, 96, 4), DT)
t = jnp.full((CFGB,), 500, jnp.int32)
ctx = jax.random.normal(jax.random.PRNGKey(8), (CFGB, 231, 768), DT)
out = np.asarray(jax.jit(
    lambda p, x, t, c: U.unet_apply(p, ucfg, x, t, c)[0])(
        p, x, t, ctx), np.float32)
np.save(f"/tmp/fftail_out_{tag}.npy", out)
if tag == "0":
    a = np.load("/tmp/fftail_out_1.npy")
    d = np.abs(a - out)
    print(f"max abs diff {d.max():.6f} at scale {np.abs(out).max():.3f}",
          flush=True)
