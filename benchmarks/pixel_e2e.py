"""Pixel-inpaint pipeline end-to-end TPU benchmark (VERDICT r3 item 3).

Synthetic 48-frame clip (keep_every 3 -> 16 processed frames, 1
keyframe + 15 inpainted), full-size SD-1.5-shape models with random
bf16 weights, run_batched at FRAME_BATCH (default 8). Protocol matches
round 1's pixel-pipeline measurement (same clip recipe as
benchmarks/keyframe_phases.py).

Usage: FRAME_BATCH=8 python benchmarks/pixel_e2e.py
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
from sd_animation_optical_flow_tpu.models.layers import cast_tree, numpy_init
from sd_animation_optical_flow_tpu.pipelines import facades as F
from sd_animation_optical_flow_tpu.pipelines import pixel_inpaint as PI
from sd_animation_optical_flow_tpu.pipelines.keyframes import (
    FrameGenConfig, array_frame_generator)
from sd_animation_optical_flow_tpu.pipelines.tokenizer import PromptTokenizer
from sd_animation_optical_flow_tpu.utils.staging import device_put_tree_packed

FRAME_BATCH = int(os.environ.get("FRAME_BATCH", "8"))
FLOW_CHUNK = int(os.environ.get("FLOW_CHUNK", "4"))
OUT = os.environ.get("OUT", f"/tmp/pixel_bench_fb{FRAME_BATCH}")
shutil.rmtree(OUT + "_pixel_warp-tpu", ignore_errors=True)

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
                            key_frame_thres=1e9,   # force 1 keyframe
                            frame_batch=FRAME_BATCH, write_vis=False,
                            flow_chunk=FLOW_CHUNK)
gen = array_frame_generator(frames, FrameGenConfig(
    size=cfg.size, keep_every=cfg.keep_every, threshold=cfg.key_frame_thres))

t0 = time.time()
out_dir = PI.run_batched(gen, OUT, sd, sd9, flow, tagger=None, cfg=cfg)
total = time.time() - t0
n = len([f for f in os.listdir(out_dir) if f.startswith("converted_")])
print(f"RESULT pixel-inpaint e2e: {n} frames in {total:.1f}s = "
      f"{n / total:.3f} f/s (frame_batch {FRAME_BATCH}, incl. compile "
      f"on cold cache)", flush=True)

# warm second run (fresh outputs, compiled programs cached in-process)
shutil.rmtree(out_dir, ignore_errors=True)
gen = array_frame_generator(frames, FrameGenConfig(
    size=cfg.size, keep_every=cfg.keep_every, threshold=cfg.key_frame_thres))
t0 = time.time()
out_dir = PI.run_batched(gen, OUT, sd, sd9, flow, tagger=None, cfg=cfg)
total = time.time() - t0
print(f"RESULT pixel-inpaint e2e WARM: {n} frames in {total:.1f}s = "
      f"{n / total:.3f} f/s (frame_batch {FRAME_BATCH})", flush=True)
