"""Probe: pairwise-flow HBM ceiling (VERDICT r2 ask #7).

Question: with ~4GB of resident ballast (the keyframe bundle), what is
the max bidir flow batch and the per-pair wall rate for
  (a) corr_dtype=float32 (default),
  (b) corr_dtype=bfloat16,
  (c) alternate_corr=True (no materialized all-pairs volume)?

Timing includes the f16 host download (what the pipeline pays). Inputs
vary per rep to defeat server-side memoization of identical dispatches.

Usage: VARIANT=f32|bf16|alt BATCHES="4 6 8" python benchmarks/flow_ceiling.py
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
_CACHE = os.path.join(_ROOT, ".jax_cache")
# TPU-scoped: foreign-host CPU AOT entries can SIGILL (utils/compile_cache.py)
from sd_animation_optical_flow_tpu.utils.compile_cache import enable_tpu_compile_cache
enable_tpu_compile_cache(_CACHE)

from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.models.layers import numpy_init, cast_tree
from sd_animation_optical_flow_tpu.utils.staging import device_put_tree_packed

VARIANT = os.environ.get("VARIANT", "f32")
BATCHES = [int(b) for b in os.environ.get("BATCHES", "4 6 8").split()]
H, W = 512, 768
dev = jax.devices()[0]

kw = {}
if VARIANT == "bf16":
    kw["corr_dtype"] = "bfloat16"
elif VARIANT == "alt":
    kw["alternate_corr"] = True
fcfg = FC.FlowConfidenceConfig(raft=RF.RAFTConfig(**kw))

with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(jnp.bfloat16):
    raft_p = RF.raft_init(jax.random.PRNGKey(4), fcfg.raft)
est = FC.FlowConfidenceEstimator(
    device_put_tree_packed(cast_tree(raft_p, jnp.bfloat16), dev), fcfg)

# resident ballast ~ the keyframe bundle (2 UNets + VAE + CLIP ~ 4GB bf16)
ballast = jax.device_put(jnp.zeros((2 * 1024 * 1024 * 1024,), jnp.bfloat16), dev)
ballast = jax.block_until_ready(ballast * 1)  # 4GB materialized

rng = np.random.default_rng(0)
base = (rng.random((H + 32, W + 32, 3)) * 255).astype(np.uint8)

for B in BATCHES:
    src = np.stack([base[i:i+H, i:i+W] for i in range(B)])
    tgt = np.stack([base[i+3:i+3+H, i+3:i+3+W] for i in range(B)])
    try:
        t0 = time.time()
        est.calc_batch_bidir_f16(src, tgt)   # compile + run
        t_cold = time.time() - t0
        times = []
        for rep in range(3):
            s2 = np.roll(src, rep + 1, axis=1)  # distinct bytes per rep
            t0 = time.time()
            f, c, rf, rc = est.calc_batch_bidir_f16(s2, tgt)
            np.asarray(f); np.asarray(c)
            times.append(time.time() - t0)
        best = min(times)
        print(f"VARIANT={VARIANT} B={B}: cold {t_cold:.1f}s, warm best "
              f"{best:.2f}s = {best / B * 1000:.0f} ms/pair (bidir)", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"VARIANT={VARIANT} B={B}: FAILED {type(e).__name__}: {msg}",
              flush=True)
        break
