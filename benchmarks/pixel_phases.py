"""Pixel-inpaint phase attribution (VERDICT r4 ask #7): where does the
1.04 f/s e2e go vs the 2.2 f/s denoise unit rate?

Monkeypatches run_batched's collaborators with blocking timers (a tiny
dependent device_get after each phase). This serializes host dispatch at
phase boundaries — on one chip the device work is serial anyway, so the
sum attributes wall time to phases honestly; the total is reported both
ways (instrumented + a clean uninstrumented run).

Usage: FRAME_BATCH=8 python benchmarks/pixel_phases.py
"""
import os, shutil, time
from collections import defaultdict
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
from sd_animation_optical_flow_tpu.models.layers import cast_tree, numpy_init
from sd_animation_optical_flow_tpu.pipelines import facades as F
from sd_animation_optical_flow_tpu.pipelines import pixel_inpaint as PI
from sd_animation_optical_flow_tpu.pipelines.keyframes import (
    FrameGenConfig, array_frame_generator)
from sd_animation_optical_flow_tpu.pipelines.tokenizer import PromptTokenizer
from sd_animation_optical_flow_tpu.utils.staging import device_put_tree_packed

FRAME_BATCH = int(os.environ.get("FRAME_BATCH", "8"))
OUT = os.environ.get("OUT", f"/tmp/pixel_phase_fb{FRAME_BATCH}")

DT = jnp.bfloat16
dev = jax.devices()[0]
cast_put = lambda p: device_put_tree_packed(cast_tree(p, DT), dev)

t0 = time.time()
with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    vcfg = V.VAEConfig()
    ucfg = U.UNetConfig()
    ucfg9 = U.UNetConfig(in_channels=9)
    ccfg = CL.CLIPTextConfig()
    vae_p = V.vae_init(k[0], vcfg)
    unet_p = U.unet_init(k[1], ucfg)
    unet9_p = U.unet_init(k[2], ucfg9)
    clip_p = CL.clip_text_init(k[3], ccfg)
    # LEARNED=1: single-direction flow + trained uncertainty head (the
    # committed artifact pair) instead of fb forward+backward
    LEARNED = os.environ.get("LEARNED", "0") == "1"
    fcfg = FC.FlowConfidenceConfig(
        uncertainty="learned" if LEARNED else "fb")
    raft_p = RF.raft_init(k[4], fcfg.raft)
head_p = None
if LEARNED:
    from sd_animation_optical_flow_tpu.utils.checkpoint import load_pytree
    with jax.default_device(jax.local_devices(backend="cpu")[0]), \
            numpy_init(jnp.float32):
        head_like = FC.uncertainty_head_init(
            jax.random.PRNGKey(9), hidden_dim=fcfg.raft.hidden_dim)
        raft_like = RF.raft_init(jax.random.PRNGKey(9), fcfg.raft)
    head_p = cast_put(load_pytree("artifacts/uncertainty_head_synth.npz",
                                  head_like))
    raft_p = load_pytree("artifacts/raft_synth.npz", raft_like)
tok = PromptTokenizer(hf_name_or_path=None)
sd = F.StableDiffusionBundle(
    unet_params=cast_put(unet_p), unet_cfg=ucfg,
    vae_params=cast_put(vae_p), vae_cfg=vcfg,
    clip_params=cast_put(clip_p), clip_cfg=ccfg, tokenizer=tok, dtype=DT)
sd9 = F.StableDiffusionBundle(
    unet_params=cast_put(unet9_p), unet_cfg=ucfg9,
    vae_params=sd.vae_params, vae_cfg=vcfg,
    clip_params=sd.clip_params, clip_cfg=ccfg, tokenizer=tok, dtype=DT)
flow = FC.FlowConfidenceEstimator(cast_put(raft_p), fcfg,
                                  head_params=head_p)
print(f"# init {time.time()-t0:.1f}s (learned={LEARNED})", flush=True)

H, W = 512, 768
rng = np.random.default_rng(0)
base = (rng.random((H + 64, W + 64, 3)) * 255).astype(np.uint8)
import cv2
base = cv2.GaussianBlur(base, (0, 0), 9)
frames = np.stack([base[8 + i:8 + i + H, 8 + i:8 + i + W]
                   for i in range(48)])

cfg = PI.PixelInpaintConfig(size=(W, H), keep_every=3,
                            key_frame_thres=1e9, frame_batch=FRAME_BATCH,
                            write_vis=False)

def make_gen():
    return array_frame_generator(frames, FrameGenConfig(
        size=cfg.size, keep_every=cfg.keep_every,
        threshold=cfg.key_frame_thres))

# ---- clean warm-up run (compiles everything) -------------------------
shutil.rmtree(OUT + "_pixel_warp-tpu", ignore_errors=True)
t0 = time.time()
out_dir = PI.run_batched(make_gen(), OUT, sd, sd9, flow, tagger=None,
                         cfg=cfg)
n = len([f for f in os.listdir(out_dir) if f.startswith("converted_")])
print(f"# cold run: {n} frames {time.time()-t0:.1f}s", flush=True)

# ---- clean warm run (the headline) -----------------------------------
shutil.rmtree(out_dir, ignore_errors=True)
t0 = time.time()
out_dir = PI.run_batched(make_gen(), OUT, sd, sd9, flow, tagger=None,
                         cfg=cfg)
total_clean = time.time() - t0
print(f"RESULT clean warm: {n} frames {total_clean:.1f}s = "
      f"{n/total_clean:.3f} f/s", flush=True)

# ---- instrumented run -------------------------------------------------
phases = defaultdict(float)

def block(x):
    jax.device_get(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))

_orig_flow = PI._dispatch_batch_flow
def timed_flow(*a, **kw):
    t = time.time(); r = _orig_flow(*a, **kw); block(r[0])
    phases["flow"] += time.time() - t
    return r
PI._dispatch_batch_flow = timed_flow

_orig_warp = PI.warp_mask_fused
def timed_warp(*a, **kw):
    t = time.time(); r = _orig_warp(*a, **kw); block(r[0])
    phases["warp+mask"] += time.time() - t
    return r
PI.warp_mask_fused = timed_warp

_orig_inp = F.img2img_inpaint_batch
def timed_inp(*a, **kw):
    t = time.time(); r = _orig_inp(*a, **kw); block(r)
    phases["inpaint_batch"] += time.time() - t
    return r
F.img2img_inpaint_batch = timed_inp

_orig_key = PI.keyframe_img2img
def timed_key(*a, **kw):
    t = time.time(); r = _orig_key(*a, **kw)
    phases["keyframe_img2img"] += time.time() - t
    return r
PI.keyframe_img2img = timed_key

_orig_pull = PI.bgr_f32_to_u8
def timed_pull(x):
    t = time.time(); r = _orig_pull(x)
    phases["u8_pull"] += time.time() - t
    return r
PI.bgr_f32_to_u8 = timed_pull

_orig_png = PI.write_png
def timed_png(*a):
    t = time.time(); r = _orig_png(*a)
    phases["png_write"] += time.time() - t
    return r
PI.write_png = timed_png

shutil.rmtree(out_dir, ignore_errors=True)
t0 = time.time()
out_dir = PI.run_batched(make_gen(), OUT, sd, sd9, flow, tagger=None,
                         cfg=cfg)
total = time.time() - t0
other = total - sum(phases.values())
print(f"RESULT instrumented: {n} frames {total:.1f}s = {n/total:.3f} f/s",
      flush=True)
for name, v in sorted(phases.items(), key=lambda kv: -kv[1]):
    print(f"#   {name:<18s} {v:7.2f}s  {v/n:6.3f} s/frame", flush=True)
print(f"#   {'other(host/glue)':<18s} {other:7.2f}s  {other/n:6.3f} s/frame",
      flush=True)
