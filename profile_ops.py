"""Per-op profiling harness (real TPU chip; rounds 2-3).

Every measured op runs ITERS times inside ONE compiled program
(lax.fori_loop with a data dependency threaded through), because a
dependent dispatch through the axon tunnel costs ~165ms of RTT —
host-side rep loops measure the tunnel, not the chip. The per-op time
is the DIFFERENCE between a 3*ITERS and an ITERS program divided by
2*ITERS, which cancels the dispatch + readback overhead entirely
(round 2's single-program timing spread ~165ms/ITERS over every op).

Usage: python profile_ops.py [unet|unet_parts|vae|vae_parts|warp|all]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from sd_animation_optical_flow_tpu.models.layers import cast_tree

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
# TPU-scoped: foreign-host CPU AOT entries can SIGILL (utils/compile_cache.py)
from sd_animation_optical_flow_tpu.utils.compile_cache import enable_tpu_compile_cache
enable_tpu_compile_cache(_CACHE)

DT = jnp.bfloat16
ITERS = int(os.environ.get("PROF_ITERS", "10"))
# CFG batch at frame batch 8 (the bench's best batch)
CFGB = int(os.environ.get("PROF_CFGB", "16"))


def timed(name, fn, *args, iters=ITERS, flops=None):
    """fn(*args) -> array; last arg is threaded through the loop
    (fn must accept it as its last positional and return something of
    the same shape, OR we thread a scalar dependency)."""
    import functools

    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, *a):
        def body(i, x):
            out = fn(*a[:-1], x)
            if out.shape == x.shape and out.dtype == x.dtype:
                return out
            # cheap dependency: fold a scalar of the output back in
            return x + jnp.mean(out).astype(x.dtype) * 0
        final = lax.fori_loop(0, n, body, a[-1])
        # return a SCALAR: device_get of a big tensor would drag the
        # ~80MB/s host link into the measurement
        return jnp.sum(final.astype(jnp.float32))

    # NOTE: block_until_ready does NOT block through the axon tunnel —
    # device_get is the only reliable completion barrier here. Time
    # t(3*iters) - t(iters): dispatch + readback overhead cancels.
    jax.device_get(many(iters, *args))          # compile + warm
    jax.device_get(many(3 * iters, *args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_get(many(iters, *args))
        tlo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(many(3 * iters, *args))
        thi = time.perf_counter() - t0
        best = min(best, (thi - tlo) / (2 * iters))
    dt = best
    extra = ""
    if flops:
        extra = f"  {flops / dt / 1e12:.1f} TF/s"
    print(f"{name:<44s} {dt * 1e3:8.3f} ms{extra}", flush=True)
    return dt


def get_unet():
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.models.layers import numpy_init
    ucfg = U.UNetConfig()
    with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
        p = U.unet_init(jax.random.PRNGKey(0), ucfg)
    p = jax.device_put(cast_tree(p, DT), jax.devices()[0])
    return U, p, ucfg


def prof_unet():
    U, p, ucfg = get_unet()
    x = jnp.zeros((CFGB, 64, 96, 4), DT)
    t = jnp.full((CFGB,), 500, jnp.int32)
    ctx = jnp.zeros((CFGB, 231, 768), DT)

    def step(p, t, ctx, x):
        out, _ = U.unet_apply(p, ucfg, x, t, ctx)
        return x + out * 0.001
    timed(f"unet step (cfg batch {CFGB})", step, p, t, ctx, x)


def prof_unet_dedup():
    U, p, ucfg = get_unet()
    hb = CFGB // 2
    x = jnp.zeros((hb, 64, 96, 4), DT)
    t = jnp.full((hb,), 500, jnp.int32)
    ctx_u = jnp.zeros((hb, 231, 768), DT)
    ctx_c = jnp.ones((hb, 231, 768), DT)

    def step(p, t, cu, cc, x):
        out, _ = U.unet_apply(p, ucfg, x, t, None, context_pair=(cu, cc))
        o_u, o_c = jnp.split(out, 2, axis=0)
        return x + (o_u + 7.0 * (o_c - o_u)) * 0.001
    timed(f"unet step dedup (cfg batch {CFGB})", step, p, t, ctx_u,
          ctx_c, x)


def prof_unet_parts():
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.models.layers import numpy_init
    rng = jax.random.PRNGKey(0)
    ted = 1280
    emb = jnp.zeros((CFGB, ted), DT)
    ctx = jnp.zeros((CFGB, 231, 768), DT)

    # (name, h, w, ch, tokens)
    levels = [("L0 64x96x320", 64, 96, 320),
              ("L1 32x48x640", 32, 48, 640),
              ("L2 16x24x1280", 16, 24, 1280),
              ("L3 8x12x1280", 8, 12, 1280)]
    with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
        res_ps = {ch: U._resblock_init(rng, ch, ch, ted)
                  for _, _, _, ch in levels}
        tfm_ps = {ch: U._spatial_transformer_init(rng, ch, 8, 768, 1)
                  for _, _, _, ch in levels[:3]}
    dev = jax.devices()[0]
    cast = lambda t: jax.device_put(
        cast_tree(t, DT), dev)
    res_ps = cast(res_ps); tfm_ps = cast(tfm_ps)

    for name, h, w, ch in levels:
        x = jnp.zeros((CFGB, h, w, ch), DT)
        # conv3x3 flops: 2 convs/resblock
        fl = 2 * CFGB * h * w * 9 * ch * ch * 2
        timed(f"resblock {name}", lambda p, e, x: U._resblock(p, x, e),
              res_ps[ch], emb, x, flops=fl)
    for name, h, w, ch in levels[:3]:
        x = jnp.zeros((CFGB, h, w, ch), DT)
        def tf(p, c, x):
            out, _ = U._spatial_transformer(p, x, c, 8, None)
            return out
        timed(f"transformer {name}", tf, tfm_ps[ch], ctx, x)

    # groupnorm+swish alone at the big shape
    from sd_animation_optical_flow_tpu.models.layers import (group_norm,
                                                             norm_init, swish,
                                                             conv2d_init,
                                                             conv2d,
                                                             nearest_upsample2x)
    for name, h, w, ch in levels[:2]:
        x = jnp.zeros((CFGB, h, w, ch), DT)
        npm = cast(norm_init(ch))
        timed(f"groupnorm+swish {name}",
              lambda p, x: swish(group_norm(p, x)), npm, x)

    # bare conv3x3 at L0
    with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
        cp = conv2d_init(rng, 320, 320, 3)
    cp = cast(cp)
    x = jnp.zeros((CFGB, 64, 96, 320), DT)
    fl = CFGB * 64 * 96 * 9 * 320 * 320 * 2
    timed("conv3x3 64x96 320->320", lambda p, x: conv2d(p, x), cp, x,
          flops=fl)

    # upsample+conv (decoder up block at L1->L0 size)
    with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
        up = conv2d_init(rng, 640, 640, 3)
    up = cast(up)
    x = jnp.zeros((CFGB, 32, 48, 640), DT)
    fl = CFGB * 64 * 96 * 9 * 640 * 640 * 2
    timed("upsample2x+conv3x3 32x48x640",
          lambda p, x: conv2d(p, nearest_upsample2x(x)), up, x, flops=fl)

    # attention alone at every UNet level shape (8 heads; d = ch/8)
    from sd_animation_optical_flow_tpu.ops.attention import attention
    for lname, ntok, d in (("L0", 6144, 40), ("L1", 1536, 80),
                           ("L2", 384, 160)):
        q = jax.random.normal(rng, (CFGB, ntok, 8, d), DT)
        fl = 2 * 2 * CFGB * 8 * ntok * ntok * d
        timed(f"self-attn {lname} {ntok} tok d{d} (routed)",
              lambda q, k, x: attention(q, k, x), q, q, q, flops=fl)
        kc = jax.random.normal(rng, (CFGB, 231, 8, d), DT)
        fl = 2 * 2 * CFGB * 8 * ntok * 231 * d
        timed(f"cross-attn {lname} {ntok}x231 (routed)",
              lambda q, k, v: attention(q, k, v), q, kc, kc, flops=fl)

    # GEGLU ff at L0
    from sd_animation_optical_flow_tpu.models.layers import linear_init
    with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
        ffp = {"ff_proj": linear_init(rng, 320, 2560),
               "ff_out": linear_init(rng, 1280, 320)}
    ffp = cast(ffp)
    x = jnp.zeros((CFGB, 6144, 320), DT)
    fl = CFGB * 6144 * (320 * 2560 + 1280 * 320) * 2
    timed("GEGLU ff 6144x320", lambda p, x: U._geglu_ff(p, x), ffp, x,
          flops=fl)


def get_vae():
    from sd_animation_optical_flow_tpu.models import vae as V
    from sd_animation_optical_flow_tpu.models.layers import numpy_init
    vcfg = V.VAEConfig()
    with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
        p = V.vae_init(jax.random.PRNGKey(0), vcfg)
    p = jax.device_put(cast_tree(p, DT), jax.devices()[0])
    return V, p, vcfg


def prof_vae():
    V, p, vcfg = get_vae()
    B = CFGB // 2
    img = jnp.zeros((B, 512, 768, 3), DT)
    z = jnp.zeros((B, 64, 96, 4), DT)
    timed(f"vae encode b{B}", lambda p, x: V.encode(p, vcfg, x, sample=False),
          p, img)
    timed(f"vae decode b{B}", lambda p, z: V.decode(p, vcfg, z), p, z)
    B1 = 1
    timed("vae decode b1", lambda p, z: V.decode(p, vcfg, z), p,
          jnp.zeros((B1, 64, 96, 4), DT))


def prof_vae_parts():
    from sd_animation_optical_flow_tpu.models import vae as V
    from sd_animation_optical_flow_tpu.models.layers import (numpy_init,
                                                             conv2d,
                                                             conv2d_init,
                                                             nearest_upsample2x)
    rng = jax.random.PRNGKey(0)
    B = CFGB // 2
    dev = jax.devices()[0]
    cast = lambda t: jax.device_put(
        cast_tree(t, DT), dev)
    # decoder level shapes: (h, w, ch)
    shapes = [("D-mid 64x96x512", 64, 96, 512),
              ("D-L2 128x192x512", 128, 192, 512),
              ("D-L1 256x384x256", 256, 384, 256),
              ("D-L0 512x768x128", 512, 768, 128)]
    with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
        ps = {ch: V._resblock_init(rng, ch, ch) for _, _, _, ch in shapes}
        att = V._attnblock_init(rng, 512)
    ps = cast(ps); att = cast(att)
    for name, h, w, ch in shapes:
        x = jnp.zeros((B, h, w, ch), DT)
        fl = 2 * B * h * w * 9 * ch * ch * 2
        timed(f"vae resblock {name}", lambda p, x: V._resblock(p, x),
              ps[ch], x, flops=fl)
    x = jnp.zeros((B, 64, 96, 512), DT)
    timed("vae attnblock 64x96x512", lambda p, x: V._attnblock(p, x), att, x)
    with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
        up = conv2d_init(rng, 512, 512, 3)
    up = cast(up)
    x = jnp.zeros((B, 128, 192, 512), DT)
    fl = B * 256 * 384 * 9 * 512 * 512 * 2
    timed("vae upsample+conv 128x192x512",
          lambda p, x: conv2d(p, nearest_upsample2x(x)), up, x, flops=fl)


def prof_warp():
    from sd_animation_optical_flow_tpu.ops.warp import warp_frame
    img = jnp.zeros((512, 768, 3), jnp.float32)
    flow = jnp.zeros((512, 768, 2), jnp.float32)
    timed("cubic warp 512x768x3",
          lambda img, flow: warp_frame(img, flow), img, flow)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"# backend={jax.default_backend()} devices={jax.devices()} "
          f"iters={ITERS} cfgb={CFGB}", flush=True)
    if what in ("unet", "all"):
        prof_unet()
    if what in ("unet_dedup", "all"):
        prof_unet_dedup()
    if what in ("unet_parts", "all"):
        prof_unet_parts()
    if what in ("vae", "all"):
        prof_vae()
    if what in ("vae_parts", "all"):
        prof_vae_parts()
    if what in ("warp", "all"):
        prof_warp()
