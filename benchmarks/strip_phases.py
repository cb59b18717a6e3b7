"""Config-5 phase decomposition (VERDICT r4 ask #5): where do the 4.49
s/frame of the 2-tile ControlNet MFR strip go?

Measures each device component at the exact config-5 shapes with
in-program differencing (profile_ops.timed: 3*N vs N iterations inside
one compiled program — dispatch + readback cancel), then reconstructs
the banked benchmarks/strip_config5.py number:

    frame ~= 20 * strip_unet_step + 2 * controlnet_eval + hed + canny
             + vae_enc + vae_dec + kv_capture_pass

The candidate harvested win (round 5): CFG stem dedup at strip shapes
— the MFR band bias is purely positional so the CFG halves share the
stem, which at 64x192 latents contains the LARGEST (12288-token) L0
self-attention (models/unet.py context_pair + strip).

Usage: python benchmarks/strip_phases.py
"""
import os
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
_CACHE = os.path.join(_ROOT, ".jax_cache")
from sd_animation_optical_flow_tpu.utils.compile_cache import \
    enable_tpu_compile_cache

enable_tpu_compile_cache(_CACHE)

import jax
import jax.numpy as jnp

from profile_ops import timed
from sd_animation_optical_flow_tpu.models import controlnet as CN
from sd_animation_optical_flow_tpu.models import hed as HED
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models import vae as V
from sd_animation_optical_flow_tpu.models.layers import cast_tree, numpy_init
from sd_animation_optical_flow_tpu.utils.staging import device_put_tree_packed

DT = jnp.bfloat16
H, W = 512, 768
NT = 2                        # [target | reference] tiles
SW = W * NT                   # strip width 1536
LH, LW = H // 8, SW // 8      # 64 x 192 latent
dev = jax.devices()[0]
cast_put = lambda p: device_put_tree_packed(cast_tree(p, DT), dev,
                                            force=True)

with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    ucfg = U.UNetConfig(in_channels=9)
    vcfg = V.VAEConfig()
    cn_cfg = U.UNetConfig()
    unet_p = cast_put(U.unet_init(k[0], ucfg))
    vae_p = cast_put(V.vae_init(k[1], vcfg))
    cn_p = cast_put(CN.controlnet_init(k[2], cn_cfg))
    hed_p = cast_put(HED.hed_init(k[3]))
print("# init done", flush=True)

strip = U.StripConfig(n_tiles=NT, mode="target")
ctx = jnp.zeros((2, 231, 768), DT)
ctx_u = jnp.zeros((1, 231, 768), DT)
ctx_c = jnp.ones((1, 231, 768), DT)
x2 = jnp.zeros((2, LH, LW, 9), DT)
x1 = jnp.zeros((1, LH, LW, 9), DT)
t2 = jnp.full((2,), 500, jnp.int32)
t1 = jnp.full((1,), 500, jnp.int32)

# 13-tuple of zero residuals at the strip's encoder shapes (the real
# ones are cached once per frame; per-step they are adds) — shapes via
# eval_shape so they track the real controlnet_apply contract
hint = jnp.zeros((2, H, SW, 3), DT)
res_sd = jax.eval_shape(
    lambda p, x, hh, t, c: CN.controlnet_apply(p, cn_cfg, x, hh, t, c),
    cn_p, jnp.zeros((2, LH, LW, 4), DT), hint, t2, ctx)
control = tuple(jnp.zeros(s.shape, DT) for s in res_sd)


def step_doubled(p, t, c, ctrl, x):
    out, _ = U.unet_apply(p, ucfg, x, t, c, strip=strip, control=ctrl)
    # out is 4-ch, x is the 9-ch inpaint latent: thread a real scalar
    # dependency instead of an elementwise add
    return x + jnp.mean(out.astype(jnp.float32)).astype(x.dtype) * 1e-6


def step_dedup(p, t, cu, cc, ctrl, x):
    out, _ = U.unet_apply(p, ucfg, x, t, None, strip=strip, control=ctrl,
                          context_pair=(cu, cc))
    o_u, o_c = jnp.split(out, 2, axis=0)
    e = o_u + 7.0 * (o_c - o_u)
    return x + jnp.mean(e.astype(jnp.float32)).astype(x.dtype) * 1e-6


t_step2 = timed("strip unet step doubled (cfg 2, 64x192)", step_doubled,
                unet_p, t2, ctx, control, x2)
t_step1 = timed("strip unet step DEDUP  (half 1, 64x192)", step_dedup,
                unet_p, t1, ctx_u, ctx_c, control, x1)

def cn_eval(p, t, c, hint, x):
    res = CN.controlnet_apply(p, cn_cfg, x, hint, t, c)
    return x + res[-1].mean().astype(x.dtype) * 1e-6


t_cn = timed("controlnet eval (cfg 2, 512x1536 hint)", cn_eval, cn_p,
             t2, ctx, hint, jnp.zeros((2, LH, LW, 4), DT))

img = jnp.zeros((1, H, SW, 3), DT)
hed_fn = HED.make_hed_fn(hed_p)


# hed_fn syncs to host uint8 internally — wall-clock it directly
_hu8 = np.zeros((H, SW, 3), np.uint8)
hed_fn(_hu8)
t_hed = float("inf")
for _ in range(3):
    _t0 = time.perf_counter()
    hed_fn(_hu8)
    t_hed = min(t_hed, time.perf_counter() - _t0)
print(f"hed hint (512x1536, incl host pull)       {t_hed*1e3:8.3f} ms",
      flush=True)


def vae_enc(p, img, x):
    # inject the carry into the input: a loop-invariant body gets
    # hoisted out of the fori differencing loop (measured -0.03 ms)
    img = img + jnp.mean(x.astype(jnp.float32)).astype(img.dtype) * 1e-6
    z = V.encode(p, vcfg, img, rng=jax.random.PRNGKey(0), sample=False)
    return x + jnp.mean(z.astype(jnp.float32)).astype(x.dtype) * 1e-6


def vae_dec(p, z, x):
    z = z + jnp.mean(x.astype(jnp.float32)).astype(z.dtype) * 1e-6
    d = V.decode(p, vcfg, z)
    return x + jnp.mean(d.astype(jnp.float32)).astype(x.dtype) * 1e-6


t_enc = timed("vae encode 512x1536", vae_enc, vae_p, img,
              jnp.zeros((8, 128), DT))
t_dec = timed("vae decode 512x1536", vae_dec, vae_p,
              jnp.zeros((1, LH, LW, 4), DT), jnp.zeros((8, 128), DT))

# canny is host-side cv2
import cv2

rngh = np.random.default_rng(0)
u8 = (rngh.random((H, SW, 3)) * 255).astype(np.uint8)
t0 = time.perf_counter()
for _ in range(10):
    cv2.Canny(cv2.cvtColor(u8, cv2.COLOR_BGR2GRAY), 100, 200)
t_canny = (time.perf_counter() - t0) / 10

steps = 20
# img2img_inpaint encodes image AND reference (2 encodes), decodes once;
# one extra UNet pass is the KV capture at the terminal step
recon2 = steps * t_step2 + 2 * t_cn + t_hed + t_canny + 2 * t_enc \
    + t_dec + t_step2
recon1 = steps * t_step1 + 2 * t_cn + t_hed + t_canny + 2 * t_enc \
    + t_dec + t_step1
print(f"# canny host: {t_canny*1e3:.1f} ms", flush=True)
print(f"RESULT config5 reconstruction: doubled {recon2:.2f} s/frame "
      f"({1/recon2:.3f} f/s) | dedup {recon1:.2f} s/frame "
      f"({1/recon1:.3f} f/s) | banked e2e r4: 4.49 s/frame", flush=True)
print(f"# step share: doubled {steps*t_step2:.2f}s, dedup "
      f"{steps*t_step1:.2f}s; controlnets {2*t_cn:.2f}s; hed {t_hed:.3f}s;"
      f" vae {2*t_enc+t_dec:.2f}s", flush=True)
