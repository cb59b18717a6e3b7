"""Probe: fused LN+GEGLU+residual tail vs the unfused chain (round 3).
In-program differenced timing (see profile_ops.py)."""
import jax
import jax.numpy as jnp

from profile_ops import timed, CFGB, DT, get_unet
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models.layers import (cast_tree,
                                                         layer_norm,
                                                         linear_init,
                                                         norm_init,
                                                         numpy_init)
from sd_animation_optical_flow_tpu.ops.ffn import geglu_ff_fused

rng = jax.random.PRNGKey(0)
dev = jax.devices()[0]
print(f"# backend={jax.default_backend()} cfgb={CFGB}", flush=True)

for din, ntok, bm in ((320, 6144, 1024), (640, 1536, 512)):
    dff = 4 * din
    with jax.default_device(jax.local_devices(backend="cpu")[0]), \
            numpy_init(DT):
        p = {"ff_proj": linear_init(rng, din, 2 * dff),
             "ff_out": linear_init(rng, dff, din),
             "norm3": norm_init(din)}
    p = jax.device_put(cast_tree(p, DT), dev)
    x = jax.random.normal(rng, (CFGB, ntok, din), DT)

    def chain(p, x):
        return x + U._geglu_ff(p, layer_norm(p["norm3"], x))

    def fused(p, x):
        return geglu_ff_fused(x, p["ff_proj"]["w"], p["ff_proj"]["b"],
                              p["ff_out"]["w"], p["ff_out"]["b"],
                              p["norm3"]["scale"], p["norm3"]["bias"],
                              residual=True, block_m=bm, block_ff=dff)

    timed(f"tail chain  {ntok}x{din}", chain, p, x)
    timed(f"tail fused  {ntok}x{din}", fused, p, x)
