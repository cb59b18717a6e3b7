"""Honest on-chip probes for round-3 kernel work: short-K cross-attention
routes and the fused GEGLU FF, at SD-1.5 L0/L1 shapes, CFG batch 16.

In-program fori_loop with data-dependent carry; (t(3N)-t(N))/2N cancels
tunnel dispatch + readback. Usage: python .scratch_probe_kernels.py [xattn|ff]
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
# TPU-scoped: foreign-host CPU AOT entries can SIGILL (utils/compile_cache.py)
from sd_animation_optical_flow_tpu.utils.compile_cache import enable_tpu_compile_cache
enable_tpu_compile_cache(_CACHE)

DT = jnp.bfloat16
ITERS = int(os.environ.get("PROF_ITERS", "10"))


def timed(name, fn, *args, flops=None):
    @functools.partial(jax.jit, static_argnums=(0,))
    def many(n, *a):
        def body(i, x):
            out = fn(*a[:-1], x)
            if out.shape == x.shape and out.dtype == x.dtype:
                return out
            return x + jnp.mean(out).astype(x.dtype) * 0
        final = lax.fori_loop(0, n, body, a[-1])
        return jnp.sum(final.astype(jnp.float32))

    jax.device_get(many(ITERS, *args))
    jax.device_get(many(3 * ITERS, *args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); jax.device_get(many(ITERS, *args))
        tlo = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.device_get(many(3 * ITERS, *args))
        thi = time.perf_counter() - t0
        best = min(best, (thi - tlo) / (2 * ITERS))
    extra = f"  {flops / best / 1e12:.1f} TF/s" if flops else ""
    print(f"{name:<52s} {best * 1e3:8.3f} ms{extra}", flush=True)
    return best


def probe_xattn():
    from sd_animation_optical_flow_tpu.ops import attention as A
    rng = jax.random.PRNGKey(0)
    CFGB = 16
    for lname, ntok, ch in (("L0", 6144, 320), ("L1", 1536, 640)):
        d = ch // 8
        q = jax.random.normal(rng, (CFGB, ntok, 8, d), DT)
        kc = jax.random.normal(rng, (CFGB, 231, 8, d), DT)
        fl = 2 * 2 * CFGB * 8 * ntok * 231 * d
        timed(f"xattn {lname} XLA (current route)",
              lambda q, k, v: A.xla_attention(q, k, v), q, kc, kc, flops=fl)
        for bq in (1536, 3072, 6144):
            if bq > ntok:
                continue
            timed(f"xattn {lname} tpv bq={bq} bk=256",
                  functools.partial(lambda bq, q, k, v:
                                    A.flash_attention_tpv(
                                        q, k, v, block_q=bq, block_k=256),
                                    bq),
                  q, kc, kc, flops=fl)


def probe_ff():
    import numpy as np
    from sd_animation_optical_flow_tpu.ops.ffn import geglu_ff_fused
    rng = np.random.default_rng(0)
    CFGB = 16
    for lname, ntok, din in (("L0", 6144, 320), ("L1", 1536, 640)):
        dff = 4 * din
        x = jnp.asarray(rng.standard_normal((CFGB * ntok, din)), DT) * 0.1
        w1 = jnp.asarray(rng.standard_normal((din, 2 * dff)), DT) * 0.02
        b1 = jnp.asarray(rng.standard_normal((2 * dff,)), DT) * 0.02
        w2 = jnp.asarray(rng.standard_normal((dff, din)), DT) * 0.02
        b2 = jnp.asarray(rng.standard_normal((din,)), DT) * 0.02
        fl = CFGB * ntok * (din * 2 * dff + dff * din) * 2

        def unfused(w1, b1, w2, b2, x):
            h = x @ w1 + b1
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * jax.nn.gelu(gate, approximate=False)
            return h @ w2 + b2
        timed(f"ff {lname} unfused XLA", unfused, w1, b1, w2, b2, x,
              flops=fl)
        for bm, bff in ((512, dff), (1024, dff), (512, 1280), (256, 1280)):
            if bff > dff:
                continue
            timed(f"ff {lname} fused bm={bm} bff={bff}",
                  functools.partial(
                      lambda bm, bff, w1, b1, w2, b2, x:
                      geglu_ff_fused(x, w1, b1, w2, b2, block_m=bm,
                                     block_ff=bff), bm, bff),
                  w1, b1, w2, b2, x, flops=fl)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"# backend={jax.default_backend()} iters={ITERS}", flush=True)
    if what in ("xattn", "all"):
        probe_xattn()
    if what in ("ff", "all"):
        probe_ff()
