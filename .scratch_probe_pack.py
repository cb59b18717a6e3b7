"""Probe: does block-diagonal head packing win the d=40 QK contraction?

Tunnel dispatch costs ~165ms, so the rep loop lives INSIDE one jit
program (lax.fori_loop, data-dependent carry); timing = (t(iters=hi) -
t(iters=lo)) / (hi - lo) cancels dispatch + readback overhead.
"""
import functools
import time
import jax
import jax.numpy as jnp
import numpy as np

from sd_animation_optical_flow_tpu.utils.compile_cache import enable_tpu_compile_cache
enable_tpu_compile_cache("/root/repo/.jax_cache")

N = 6144
ROWS = 24
LO, HI = 2, 22


@functools.partial(jax.jit, static_argnums=(2,))
def run(q, k, iters):
    def body(i, z):
        s = jnp.einsum("bnd,bdm->bnm", q + z.astype(q.dtype) * 1e-6, k,
                       preferred_element_type=jnp.float32)
        return jnp.max(jnp.abs(s)) * 1e-6
    return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))


def bench(q, k):
    float(run(q, k, LO))  # compile both
    float(run(q, k, HI))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run(q, k, LO)); tlo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(q, k, HI)); thi = time.perf_counter() - t0
        best = min(best, (thi - tlo) / (HI - LO))
    return best


key = jax.random.PRNGKey(0)

qa = jax.random.normal(key, (ROWS, N, 40), jnp.bfloat16)
ka = jax.random.normal(key, (ROWS, 40, N), jnp.bfloat16)
ta = bench(qa, ka)
fl_a = 2 * ROWS * N * N * 40
print(f"A d=40 baseline : {ta*1e3:8.2f} ms  {fl_a/ta/1e12:6.1f} TF/s logical")

qb = jax.random.normal(key, (ROWS // 3, N, 120), jnp.bfloat16)
kb_dense = jax.random.normal(key, (ROWS // 3, 120, 3 * N), jnp.bfloat16)
mask = np.zeros((120, 3 * N), np.float32)
for i in range(3):
    mask[i * 40:(i + 1) * 40, i * N:(i + 1) * N] = 1
kb = kb_dense * jnp.asarray(mask, jnp.bfloat16)
tb = bench(qb, kb)
print(f"B packed d=120  : {tb*1e3:8.2f} ms  {fl_a/tb/1e12:6.1f} TF/s logical"
      f" (same useful work as A)")

qc = jax.random.normal(key, (ROWS, N, 128), jnp.bfloat16)
kc = jax.random.normal(key, (ROWS, 128, N), jnp.bfloat16)
tc = bench(qc, kc)
fl_c = 2 * ROWS * N * N * 128
print(f"C d=128 control : {tc*1e3:8.2f} ms  {fl_c/tc/1e12:6.1f} TF/s")

print(f"\nA={ta*1e3:.2f}ms  B={tb*1e3:.2f}ms  A/B speedup={ta/tb:.2f}x")
