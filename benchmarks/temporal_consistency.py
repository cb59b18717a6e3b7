"""Flicker suppression at full resolution (VERDICT r4 ask #6).

The reference's reason to exist is temporal stabilization of per-frame
img2img (reference README.md:1-8 showcase). This measures it at
512x768 on the 16-frame synthetic clip: the clip is a crop of one base
texture sliding by exactly 3 px/processed-frame in x and y, so the
ground-truth inter-frame correspondence is a known integer shift and
the *inputs* are perfectly consistent (overlap region identical).
Flow-warped inter-frame PSNR of the OUTPUTS therefore measures
generation flicker alone:

    psnr_t = PSNR( out_{t+1}[:-3, :-3], out_t[3:, 3:] )

Modes compared (same seed, same prompts, random bf16 SD-1.5-shape
weights):
  naive      per-frame img2img — the flicker baseline the reference
             exists to fix (every frame hallucinates independently);
  stabilized the pixel-inpaint pipeline (warp AI keyframe + confidence-
             masked inpaint, ofgen_pixel_inpaint.py:315-356 contract);
  KF=1 adds  the keyframe+KV pipeline (ofgen_keyframe_inpaint mode;
             slow through a remote tunnel, off by default).

Usage: [LEARNED=1] [KF=1] [FLOW=oracle] [PPW=0.9] python benchmarks/temporal_consistency.py
"""
import os
import shutil
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

from sd_animation_optical_flow_tpu.models import clip as CL
from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models import vae as V
from sd_animation_optical_flow_tpu.models.layers import cast_tree, numpy_init
from sd_animation_optical_flow_tpu.pipelines import facades as F
from sd_animation_optical_flow_tpu.pipelines import pixel_inpaint as PI
from sd_animation_optical_flow_tpu.pipelines.keyframes import (
    FrameGenConfig, array_frame_generator)
from sd_animation_optical_flow_tpu.pipelines.tagger import NEGATIVE_PROMPT
from sd_animation_optical_flow_tpu.pipelines.tokenizer import PromptTokenizer
from sd_animation_optical_flow_tpu.utils.images import (bgr_u8_to_model,
                                                        model_to_bgr_u8,
                                                        read_png_bgr)
from sd_animation_optical_flow_tpu.utils.staging import device_put_tree_packed

H, W = 512, 768
SHIFT = 3                     # px/processed-frame, both axes (keep_every 3)
FRAME_BATCH = int(os.environ.get("FRAME_BATCH", "8"))
LEARNED = os.environ.get("LEARNED", "1") == "1"
PPW = float(os.environ.get("PPW", "0"))   # propagated_pixel_weight row:
# the reference's propagation knob (ofgen_pixel_inpaint.py:251-260);
# PPW=0.9 with FLOW=oracle is the strongest banked stabilization row
# (+8.28 dB over naive, DECISIONS.md)
OUT = os.environ.get("OUT", "/tmp/temporal_consistency")

DT = jnp.bfloat16
dev = jax.devices()[0]
cast_put = lambda p: device_put_tree_packed(cast_tree(p, DT), dev)

t0 = time.time()
with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    vcfg, ucfg, ccfg = V.VAEConfig(), U.UNetConfig(), CL.CLIPTextConfig()
    ucfg9 = U.UNetConfig(in_channels=9)
    vae_p = V.vae_init(k[0], vcfg)
    unet_p = U.unet_init(k[1], ucfg)
    unet9_p = U.unet_init(k[2], ucfg9)
    clip_p = CL.clip_text_init(k[3], ccfg)
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
    head_p = cast_put(load_pytree(
        os.path.join(_ROOT, "artifacts/uncertainty_head_synth.npz"),
        head_like))
    raft_p = load_pytree(os.path.join(_ROOT, "artifacts/raft_synth.npz"),
                         raft_like)
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

rng = np.random.default_rng(0)
base = (rng.random((H + 64, W + 64, 3)) * 255).astype(np.uint8)
import cv2

base = cv2.GaussianBlur(base, (0, 0), 9)
frames = np.stack([base[8 + i:8 + i + H, 8 + i:8 + i + W]
                   for i in range(48)])
proc = frames[::3]            # the 16 processed frames (keep_every 3)


def warped_psnr(outs):
    """Mean PSNR between each adjacent output pair after undoing the
    known SHIFT-px motion; the overlap crop excludes new content."""
    vals = []
    for a, b in zip(outs[:-1], outs[1:]):
        x = a[SHIFT:, SHIFT:].astype(np.float64)
        y = b[:-SHIFT, :-SHIFT].astype(np.float64)
        mse = np.mean((x - y) ** 2)
        vals.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))
    return float(np.mean(vals)), float(np.min(vals))


# sanity: inputs are perfectly consistent under the known shift
m, _ = warped_psnr(list(proc))
print(f"# input clip warped PSNR: {m:.1f} dB (construction check)",
      flush=True)

cfg = PI.PixelInpaintConfig(size=(W, H), keep_every=3, key_frame_thres=1e9,
                            frame_batch=FRAME_BATCH, write_vis=False,
                            propagated_pixel_weight=PPW)


class OracleFlow:
    """FLOW=oracle: ground-truth flow + in-bounds confidence for the
    constructed clip (integer shift recovered by brute search, exact by
    construction). Isolates the pipeline's stabilization machinery —
    warp + confidence mask + masked inpaint — from the committed
    synthetic-RAFT artifact's flow quality: on this clip the artifact's
    ~1px EPE puts fb confidence below the 0.95 threshold everywhere, so
    with measured flow the pipeline honestly regenerates whole frames
    (the realistic row of the result table)."""

    def calc_batch_device(self, src, tgt):
        s = np.asarray(src[..., 0], np.float32)    # [B,H,W] one channel
        t = np.asarray(tgt[..., 0], np.float32)
        b, h, w = s.shape
        flows, confs = [], []
        for i in range(b):
            errs = [np.abs(s[i, d:d + 128, d:d + 128]
                           - t[i, :128, :128]).mean()
                    for d in range(0, 49)]
            d = int(np.argmin(errs))
            fl = np.full((h, w, 2), float(d), np.float32)
            yy, xx = np.mgrid[0:h, 0:w]
            inb = (yy + d <= h - 1) & (xx + d <= w - 1)
            flows.append(fl)
            confs.append(inb.astype(np.float32))
        flow = jnp.asarray(np.stack(flows))
        conf = jnp.asarray(np.stack(confs))
        return flow, conf, jnp.log(conf + 1e-30)

# --- (a) stabilized: pixel-inpaint pipeline -------------------------------
if os.environ.get("FLOW", "") == "oracle":
    flow = OracleFlow()
    print("# using ORACLE flow (capability isolation row)", flush=True)
shutil.rmtree(OUT + "_pixel_warp-tpu", ignore_errors=True)
gen = array_frame_generator(frames, FrameGenConfig(
    size=cfg.size, keep_every=cfg.keep_every, threshold=cfg.key_frame_thres))
t0 = time.time()
out_dir = PI.run_batched(gen, OUT, sd, sd9, flow, tagger=None, cfg=cfg)
names = sorted(f for f in os.listdir(out_dir) if f.startswith("converted_"))
outs_stab = [read_png_bgr(os.path.join(out_dir, f)) for f in names]
print(f"# stabilized run: {len(outs_stab)} frames {time.time()-t0:.1f}s",
      flush=True)

# --- (b) naive per-frame img2img (the flicker baseline) -------------------
t0 = time.time()
outs_naive = []
for fr in proc:
    img, _ = F.img2img(sd, bgr_u8_to_model(fr), "masterpiece,best quality",
                       NEGATIVE_PROMPT, cfg.denoising_strength,
                       cfg.ddim_steps, seed=cfg.seed)
    outs_naive.append(model_to_bgr_u8(img))
print(f"# naive run: {len(outs_naive)} frames {time.time()-t0:.1f}s",
      flush=True)

m_stab, lo_stab = warped_psnr(outs_stab)
m_naive, lo_naive = warped_psnr(outs_naive)
print(f"RESULT warped inter-frame PSNR 512x768: stabilized "
      f"{m_stab:.2f} dB (min {lo_stab:.2f}) vs naive per-frame "
      f"{m_naive:.2f} dB (min {lo_naive:.2f}) -> +{m_stab-m_naive:.2f} dB",
      flush=True)

# --- (c) optional: keyframe+KV pipeline -----------------------------------
if os.environ.get("KF", "0") == "1":
    from sd_animation_optical_flow_tpu.pipelines import keyframe_inpaint as KI
    ws = "/tmp/temporal_consistency_kf"
    shutil.rmtree(ws, ignore_errors=True)
    video = KI.VideoWorkspace(ws, frames=frames, size=(W, H), keep_every=3)
    kcfg = KI.KeyframeInpaintConfig(
        size=(W, H), mode="warp_and_inpaint_crossattn",
        ddim_steps=cfg.ddim_steps,
        denoising_strength=cfg.denoising_strength, flow_batch=8)
    t0 = time.time()
    KI.run(video, sd, sd9, flow, tagger=None, cfg=kcfg)
    outs_kf = [video.get_ai_frame(i) for i in range(video.num_frames)]
    m_kf, lo_kf = warped_psnr(outs_kf)
    print(f"RESULT keyframe+KV warped PSNR: {m_kf:.2f} dB (min "
          f"{lo_kf:.2f}) [{time.time()-t0:.1f}s]", flush=True)
