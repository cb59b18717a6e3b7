"""Keyframe pipeline TPU phase benchmark: 16-frame synthetic clip.

Usage: LEVEL_BATCH=1|4 MODE=warp_and_inpaint[_crossattn] python benchmarks/keyframe_phases.py
Times the phases (pairwise flow / seed strip / level back-fill) around
keyframe_inpaint.run internals.
"""
import os, shutil, time
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

from sd_animation_optical_flow_tpu.models import clip as CL
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models import vae as V
from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models.layers import numpy_init
from sd_animation_optical_flow_tpu.pipelines import facades as F
from sd_animation_optical_flow_tpu.pipelines import keyframe_inpaint as KI
from sd_animation_optical_flow_tpu.pipelines.tokenizer import PromptTokenizer

LEVEL_BATCH = int(os.environ.get("LEVEL_BATCH", "1"))
MODE = os.environ.get("MODE", "warp_and_inpaint_crossattn")
WS = os.environ.get("WS", f"/tmp/kf_ws_lb{LEVEL_BATCH}_{MODE}")
shutil.rmtree(WS, ignore_errors=True)

DT = jnp.bfloat16
dev = jax.devices()[0]

from sd_animation_optical_flow_tpu.models.layers import cast_tree
from sd_animation_optical_flow_tpu.utils.staging import device_put_tree_packed


def cast_put(p):
    # force=True: drain the async upload inside init so phase timings
    # below measure the pipeline, not the param transfer
    return device_put_tree_packed(cast_tree(p, DT), dev, force=True)

t0 = time.time()
with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    vcfg = V.VAEConfig()
    ucfg = U.UNetConfig()           # 4-ch img2img UNet (seed strips)
    ucfg9 = U.UNetConfig(in_channels=9)
    ccfg = CL.CLIPTextConfig()
    vae_p = V.vae_init(k[0], vcfg)
    unet_p = U.unet_init(k[1], ucfg)
    unet9_p = U.unet_init(k[2], ucfg9)
    clip_p = CL.clip_text_init(k[3], ccfg)
    fcfg = FC.FlowConfidenceConfig(raft=RF.RAFTConfig(
        corr_dtype=os.environ.get("CORR_DTYPE", "bfloat16")))
    raft_p = RF.raft_init(k[4], fcfg.raft)
tok = PromptTokenizer(hf_name_or_path=None)
sd = F.StableDiffusionBundle(
    unet_params=cast_put(unet_p), unet_cfg=ucfg,
    vae_params=cast_put(vae_p), vae_cfg=vcfg,
    clip_params=cast_put(clip_p), clip_cfg=ccfg, tokenizer=tok, dtype=DT)
sd9 = F.StableDiffusionBundle(
    unet_params=cast_put(unet9_p), unet_cfg=ucfg9,
    vae_params=sd.vae_params, vae_cfg=vcfg,
    clip_params=sd.clip_params, clip_cfg=ccfg, tokenizer=tok, dtype=DT)
flow = FC.FlowConfidenceEstimator(cast_put(raft_p), fcfg)
print(f"# init {time.time()-t0:.1f}s", flush=True)

# synthetic 48-frame clip (keep_every 3 -> 16 kept): translating gradient
H, W = 512, 768
rng = np.random.default_rng(0)
base = (rng.random((H + 64, W + 64, 3)) * 255).astype(np.uint8)
import cv2
base = cv2.GaussianBlur(base, (0, 0), 9)
frames = np.stack([base[8 + i:8 + i + H, 8 + i:8 + i + W] for i in range(48)])
video = KI.VideoWorkspace(WS, frames=frames, size=(W, H), keep_every=3)
print(f"# workspace: {video.num_frames} frames", flush=True)

cfg = KI.KeyframeInpaintConfig(size=(W, H), mode=MODE,
                               level_batch=LEVEL_BATCH,
                               flow_batch=int(os.environ.get("FB", "8")))

# phase instrumentation
phases = {}
_orig_conv = KI.keyframe_conv
def timed_conv(*a, **kw):
    t = time.time(); r = _orig_conv(*a, **kw)
    phases["pairwise_flow+conv"] = phases.get("pairwise_flow+conv", 0) + (time.time() - t)
    return r
KI.keyframe_conv = timed_conv
_orig_gwr = KI.generate_with_refs
def timed_gwr(*a, **kw):
    t = time.time(); r = _orig_gwr(*a, **kw)
    print(f"# frame gen {time.time()-t:.1f}s", flush=True)
    return r
KI.generate_with_refs = timed_gwr
_orig_seed = KI.generate_seed_frames
def timed_seed(*a, **kw):
    t = time.time(); r = _orig_seed(*a, **kw)
    phases["seed_strip"] = time.time() - t
    return r
KI.generate_seed_frames = timed_seed

t0 = time.time()
KI.run(video, sd, sd9, flow, tagger=None, cfg=cfg)
total = time.time() - t0
gen = total - sum(phases.values())
n_gen = video.num_frames - 1
print(f"RESULT mode={MODE} level_batch={LEVEL_BATCH}: total {total:.1f}s "
      f"({video.num_frames / total:.3f} f/s); "
      f"phases: flow+conv {phases.get('pairwise_flow+conv', 0):.1f}s, "
      f"seed {phases.get('seed_strip', 0):.1f}s, "
      f"backfill {gen:.1f}s / {n_gen} frames "
      f"({gen / max(n_gen,1):.2f} s/frame)", flush=True)
