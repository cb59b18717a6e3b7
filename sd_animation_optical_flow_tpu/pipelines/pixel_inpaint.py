"""The main pipeline: keyframe img2img + flow-warp + confidence-masked
inpainting (the reference's README-documented entry point,
reference: ofgen_pixel_inpaint.py:315-390).

Per frame:
  * keyframe  -> plain img2img at denoising strength 0.4; becomes the
    reference frame/AI frame pair.
  * non-key   -> flow+confidence keyframe->frame, warp the AI keyframe
    (device, fused), mask = dilate(confidence < 0.95) (ellipse 7), then
    seeded inpainting with the current raw frame as reference
    (ofgen_pixel_inpaint.py:334-349), optional propagated-pixel mix.

Outputs keep the reference contract: ``converted_%06d.png``,
``vis_%06d.png`` 6-panel strips, ``pixel_confidence_%06d.png``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.flowconf import FlowConfidenceEstimator
from ..ops.filters import dilate, ellipse_kernel
from ..ops.warp import warp_mask_fused
from ..utils.images import (bgr_f32_to_u8, bgr_f32d_to_model,
                            bgr_u8_to_model, model_to_bgr_f32d,
                            model_to_bgr_u8, write_png)
from . import facades as F
from .keyframes import FrameGenConfig, frame_generator
from .tagger import NEGATIVE_PROMPT, Tagger


@dataclass
class PixelInpaintConfig:
    name: str = "tpu"
    size: Tuple[int, int] = (512, 768)      # (width, height)
    keep_every: int = 3
    key_frame_thres: float = 24.0
    denoising_strength: float = 0.4
    confidence_thres: float = 0.95
    propagated_pixel_weight: float = 0.0
    mask_dilate: int = 7
    mask_blur: int = 16
    ddim_steps: int = 50
    seed: int = 1234
    prompt_extra: str = ""
    write_vis: bool = True
    guidance_schedule_func: Callable[[float], float] = lambda p: 1.0
    sampler: str = "ddim"        # or 'dpmpp' / 'dpmpp:N' (DPM-Solver++ 2M,
                                 # N pinned solver steps; 'dpmpp:10' at
                                 # strength 0.4 is the north-star point)
    # turbo knobs (labeled approximations, off by default): CFG caching
    # interval for the inpaint denoise; deepcache for the plain-img2img
    # keyframe generation
    cfg_interval: int = 1
    deepcache_interval: int = 0
    # >1 batches non-key frames of a keyframe segment through ONE
    # compiled flow/warp/mask/inpaint program (frames in a segment are
    # independent; outputs stay bitwise-equal to sequential fixed-seed
    # runs via noise tiling). TPU throughput knob; use run_batched().
    frame_batch: int = 1
    # flow pairs per RAFT program (HBM cap — see _dispatch_batch_flow)
    flow_chunk: int = 4
    # >0: shard the frame batch over a dp-axis mesh of this many devices
    # (SURVEY §2.7 data-parallel row). Only meaningful with
    # frame_batch > 1 and run_batched(); frame_batch % dp must be 0.
    dp: int = 0
    # pad ragged segment-tail batches up to frame_batch by repeating the
    # last frame (outputs of the padding are discarded): every batch of
    # a run then reuses ONE compiled flow/warp/inpaint program instead
    # of compiling a second program per distinct tail size — a compile
    # plus (on remote runtimes) a ~140 MB executable load each. The
    # padded duplicates cost (frame_batch - tail)/frame_batch of one
    # batch's chip time, once per segment.
    pad_tail_batch: bool = True


def generate_mask(cum_confidence: np.ndarray, log_confidence: np.ndarray,
                  thres: float = 0.8, dilate_size: int = 7):
    """Low-confidence inpaint mask (ofgen_pixel_inpaint.py:262-267):
    mask=255 where confidence < thres, reset log-confidence there,
    dilate with an ellipse. Returns (mask_u8, log_confidence)."""
    mask = (cum_confidence < thres).astype(np.float32)
    log_confidence = np.where(cum_confidence < thres, 0.0, log_confidence)
    mask = np.asarray(dilate(jnp.asarray(mask), ellipse_kernel(dilate_size)))
    return (mask * 255).astype(np.uint8), log_confidence


def mix_propagated_ai_frame(raw_ai_frame: np.ndarray,
                            warped_ai_frame: np.ndarray,
                            mask_u8: np.ndarray,
                            weight: float = 1.0) -> np.ndarray:
    """Blend freshly-inpainted and propagated pixels
    (ofgen_pixel_inpaint.py:251-260)."""
    if weight < 0.001:
        return raw_ai_frame
    w = np.where(mask_u8 <= 127, weight, 1.0 - weight)[..., None]
    out = raw_ai_frame.astype(np.float32) * (1 - w) + \
        warped_ai_frame.astype(np.float32) * w
    return np.clip(out, 0, 255).astype(np.uint8)


def _prompt_for(tagger: Optional[Tagger], frame_bgr, extra: str) -> str:
    if tagger is not None and tagger.available:
        return tagger.build_prompt(frame_bgr, extra)
    base = "masterpiece,best quality,"
    return base + extra if extra else base[:-1]


def run_inpainting(sd_inpaint: F.StableDiffusionBundle,
                   tagger: Optional[Tagger],
                   warped_ai_frame_bgr: np.ndarray,
                   reference_frame_bgr: np.ndarray,
                   mask_u8: np.ndarray, cfg: PixelInpaintConfig):
    """Seeded masked inpainting (ofgen_pixel_inpaint.py:229-249):
    prompt from the RAW frame's tags, image = warped AI frame,
    reference = raw frame, fixed seed."""
    prompt = _prompt_for(tagger, reference_frame_bgr, cfg.prompt_extra)
    img, _, init_dec, _ = F.img2img_inpaint(
        sd_inpaint,
        image=bgr_u8_to_model(warped_ai_frame_bgr),
        c_text=prompt,
        uc_text=NEGATIVE_PROMPT,
        denoising_strength=cfg.denoising_strength,
        ddim_steps=cfg.ddim_steps,
        reference_img=bgr_u8_to_model(reference_frame_bgr),
        mask=(mask_u8.astype(np.float32) / 255.0),
        mask_blur=cfg.mask_blur,
        guidance_schedule_func=cfg.guidance_schedule_func,
        seed=cfg.seed)
    return model_to_bgr_u8(img), model_to_bgr_u8(init_dec)


def keyframe_img2img(sd: F.StableDiffusionBundle, tagger: Optional[Tagger],
                     frame_bgr: np.ndarray, cfg: PixelInpaintConfig):
    prompt = _prompt_for(tagger, frame_bgr, cfg.prompt_extra)
    img, _ = F.img2img(sd, bgr_u8_to_model(frame_bgr), prompt,
                       NEGATIVE_PROMPT, cfg.denoising_strength,
                       cfg.ddim_steps, seed=cfg.seed,
                       sampler=cfg.sampler,
                       cfg_interval=cfg.cfg_interval,
                       deepcache_interval=cfg.deepcache_interval)
    return model_to_bgr_u8(img)


def _lookahead(iterable):
    """Yield (item, next_item_or_None) with one-step lookahead — lets the
    loop dispatch flow for frame t+1 before blocking on frame t."""
    it = iter(iterable)
    try:
        cur = next(it)
    except StopIteration:
        return
    for nxt in it:
        yield cur, nxt
        cur = nxt
    yield cur, None


def run(frames: Iterable[Tuple[np.ndarray, bool, int]],
        save_dir: str,
        sd: F.StableDiffusionBundle,
        sd_inpaint: F.StableDiffusionBundle,
        flow_estimator: FlowConfidenceEstimator,
        tagger: Optional[Tagger] = None,
        cfg: PixelInpaintConfig = PixelInpaintConfig()):
    """Run the pipeline over (frame_bgr, is_key, index) triples.

    Streaming design: flow+confidence for the NEXT frame is dispatched
    (async, device-resident) before the current frame's denoise result is
    pulled to the host, so the flow network overlaps the UNet scan — the
    reference instead blocks the GPU on cv2 work between stages
    (SURVEY §3.1 boundary notes).

    Directory name keeps the reference scheme:
    ``<save_dir>_pixel_warp-<name>`` (ofgen_pixel_inpaint.py:316-318)."""
    out_dir = f"{save_dir}_pixel_warp-{cfg.name}"
    os.makedirs(out_dir, exist_ok=True)
    from ..utils.images import PngWriter

    reference_frame: Optional[np.ndarray] = None
    reference_ai_frame: Optional[np.ndarray] = None
    reference_ai_d = None   # device BGR float copy of the AI reference
    pending_flow = None   # device arrays for the current frame, if prefetched

    def dispatch_flow(ref_bgr, cur_bgr):
        # uint8 upload; BGR->RGB flip and f32 cast on device
        ref_d = jnp.asarray(ref_bgr)[None, ..., ::-1].astype(jnp.float32)
        cur_d = jnp.asarray(cur_bgr)[None, ..., ::-1].astype(jnp.float32)
        return flow_estimator.calc_batch_device(ref_d, cur_d)

    writer = PngWriter()
    try:
        for (frame_bgr, is_key, counter), nxt in _lookahead(frames):
            if is_key:
                pending_flow = None
                ai_frame = keyframe_img2img(sd, tagger, frame_bgr, cfg)
                reference_frame = frame_bgr
                reference_ai_frame = ai_frame
                reference_ai_d = None   # re-uploaded lazily on first warp
                # prefetch flow for the next frame against the NEW keyframe
                if nxt is not None and not nxt[1]:
                    pending_flow = dispatch_flow(reference_frame, nxt[0])
                if cfg.write_vis:
                    vis = np.concatenate([frame_bgr, frame_bgr, ai_frame,
                                          ai_frame, frame_bgr, ai_frame], axis=1)
                    writer.submit(f"{out_dir}/vis_{counter:06d}.png", vis)
                    writer.submit(f"{out_dir}/pixel_confidence_{counter:06d}.png",
                              np.ones(frame_bgr.shape[:2], np.uint8))
            else:
                # flow + confidence keyframe -> current: use the prefetched
                # dispatch when available, else compute now
                if pending_flow is None:
                    pending_flow = dispatch_flow(reference_frame, frame_bgr)
                flow_d, conf_d, _ = pending_flow
                # dispatch the NEXT frame's flow before any further work
                pending_flow = None
                if nxt is not None and not nxt[1]:
                    pending_flow = dispatch_flow(reference_frame, nxt[0])

                # --- device-resident hot path: warp + mask + inpaint stay
                # on the accelerator; the host sees only the prompt (raw
                # frame, already host-side) and the final PNG pull. The
                # reference round-trips through cv2/numpy 6x per frame
                # (SURVEY §3.1 boundary notes).
                if reference_ai_d is None:
                    reference_ai_d = jnp.asarray(
                        reference_ai_frame).astype(jnp.float32)
                warped_d, mask01_d = warp_mask_fused(
                    reference_ai_d, flow_d[0], conf_d[0],
                    ellipse_kernel(cfg.mask_dilate),
                    conf_thres=cfg.confidence_thres)

                prompt = _prompt_for(tagger, frame_bgr, cfg.prompt_extra)
                img_out, _, _, _ = F.img2img_inpaint(
                    sd_inpaint,
                    image=bgr_f32d_to_model(warped_d),
                    c_text=prompt, uc_text=NEGATIVE_PROMPT,
                    denoising_strength=cfg.denoising_strength,
                    ddim_steps=cfg.ddim_steps,
                    reference_img=bgr_u8_to_model(frame_bgr),
                    mask=mask01_d, mask_blur=cfg.mask_blur,
                    guidance_schedule_func=cfg.guidance_schedule_func,
                    seed=cfg.seed, want_init_decoded=False,
                    sampler=cfg.sampler, cfg_interval=cfg.cfg_interval)
                raw_ai_d = model_to_bgr_f32d(img_out)
                if cfg.propagated_pixel_weight >= 0.001:
                    # propagated-pixel mix (ofgen_pixel_inpaint.py:251-260)
                    w = jnp.where(mask01_d <= 0.5,
                                  cfg.propagated_pixel_weight,
                                  1.0 - cfg.propagated_pixel_weight)[..., None]
                    ai_d = raw_ai_d * (1.0 - w) + warped_d * w
                else:
                    ai_d = raw_ai_d
                # NOTE: the AI reference stays the keyframe's AI frame —
                # warping is always keyframe->frame (ofgen_pixel_inpaint.py:338)
                ai_frame = bgr_f32_to_u8(ai_d)

                if cfg.write_vis:
                    conf = np.asarray(conf_d[0])
                    conf_u8 = np.clip(conf * 255, 0, 255).astype(np.uint8)
                    writer.submit(f"{out_dir}/pixel_confidence_{counter:06d}.png",
                              conf_u8)
                    warped_ai = bgr_f32_to_u8(warped_d)
                    mask_u8 = (np.asarray(mask01_d) * 255).astype(np.uint8)
                    raw_ai_frame = bgr_f32_to_u8(raw_ai_d)
                    masked = warped_ai.copy()
                    masked[mask_u8 > 127] = np.array([0, 0, 255], np.uint8)
                    vis = np.concatenate([reference_frame, frame_bgr,
                                          raw_ai_frame, ai_frame, warped_ai,
                                          masked], axis=1)
                    writer.submit(f"{out_dir}/vis_{counter:06d}.png", vis)

            writer.submit(f"{out_dir}/converted_{counter:06d}.png", ai_frame)
    finally:
        writer.close()
    return out_dir


def run_video(video_path: str, save_dir: str, sd, sd_inpaint,
              flow_estimator, tagger=None,
              cfg: PixelInpaintConfig = PixelInpaintConfig()):
    frames = frame_generator(video_path, FrameGenConfig(
        size=cfg.size, keep_every=cfg.keep_every,
        threshold=cfg.key_frame_thres))
    return run(frames, save_dir, sd, sd_inpaint, flow_estimator, tagger, cfg)


# ---------------------------------------------------------------------------
# batched segment mode (TPU throughput shape; no reference counterpart)
# ---------------------------------------------------------------------------

def _dispatch_batch_flow(batch, reference_frame, flow_estimator,
                         flow_chunk: int = 4):
    """Async flow dispatch for a batch (device arrays, no host sync) —
    lets the next batch's flow overlap the current batch's denoise.

    Transfer economy: the axon link runs ~80 MB/s with ~40ms RTT, so
    frames ship ONCE as uint8 (4x smaller than f32) and every layout /
    dtype conversion happens on-device; the returned device frames are
    reused by the inpaint stage (no second upload).

    HBM economy: the batched RAFT program's all-pairs correlation +
    lookup intermediates cost ~GB/pair at 512x768 (DECISIONS.md HBM
    budget); dispatching the whole frame batch as ONE program next to
    the resident 5-model bundle OOMs a v5e at frame_batch 8. The flow
    runs in ``flow_chunk``-pair programs instead (still async — chunk
    programs queue back-to-back; peak temp memory is one chunk's)."""
    frames_u8_d = jnp.asarray(np.stack([f for f, _ in batch]))  # u8 BGR
    ref_u8_d = jnp.asarray(reference_frame)                     # u8 BGR
    flows, confs = [], []
    # flow_chunk <= 0 means "whole batch in one program" (the same
    # convention as FlowConfidenceEstimator.chunk)
    chunk = flow_chunk if flow_chunk > 0 else len(batch)
    for s in range(0, len(batch), chunk):
        tgt = frames_u8_d[s:s + chunk, ..., ::-1].astype(jnp.float32)
        src = jnp.broadcast_to(
            ref_u8_d[None, ..., ::-1].astype(jnp.float32), tgt.shape)
        flow_d, conf_d, _ = flow_estimator.calc_batch_device(src, tgt)
        flows.append(flow_d)
        confs.append(conf_d)
    if len(flows) == 1:
        return flows[0], confs[0], frames_u8_d
    return (jnp.concatenate(flows, axis=0),
            jnp.concatenate(confs, axis=0), frames_u8_d)


def _dispatch_batch_denoise(batch, flow_pair, reference_frame,
                            reference_ai_frame, sd_inpaint, tagger, cfg,
                            mesh=None, n_real=None):
    """Dispatch one segment batch's device work — warp + mask +
    img2img_inpaint_batch + on-device uint8 conversion — WITHOUT any
    host sync, and return the device handles plus everything the
    deferred finalize needs (host state like the reference frame is
    captured here so finalize order is free). ``n_real``: with tail
    padding, how many leading entries are real frames."""
    if n_real is None:
        n_real = len(batch)
    if mesh is not None and len(batch) % mesh.shape["dp"] != 0:
        mesh = None  # ragged tail batch: fall back to single-device

    flow_d, conf_d, frames_u8_d = flow_pair

    # AI keyframe uploads as uint8 once per segment; conversions on-device
    ref_ai_d = jnp.asarray(reference_ai_frame).astype(jnp.float32)
    warped_d, mask01_d = warp_mask_fused(                    # [B,H,W,3] BGR
        ref_ai_d, flow_d, conf_d, ellipse_kernel(cfg.mask_dilate),
        conf_thres=cfg.confidence_thres)                     # mask [B,H,W]

    # prompt only the real frames: padded tail duplicates would each pay
    # a host-side tagger (ONNX) inference whose output is discarded
    prompts = [_prompt_for(tagger, f, cfg.prompt_extra)
               for f, _ in batch[:n_real]]
    prompts += [prompts[-1]] * (len(batch) - n_real)
    imgs_model = warped_d[..., ::-1] / 127.5 - 1.0
    refs_model = frames_u8_d[..., ::-1].astype(jnp.float32) / 127.5 - 1.0
    outs = F.img2img_inpaint_batch(
        sd_inpaint, imgs_model, prompts, NEGATIVE_PROMPT, mask01_d,
        refs_model, denoising_strength=cfg.denoising_strength,
        ddim_steps=cfg.ddim_steps, mask_blur=cfg.mask_blur,
        guidance_schedule_func=cfg.guidance_schedule_func, seed=cfg.seed,
        sampler=cfg.sampler, cfg_interval=cfg.cfg_interval, mesh=mesh)
    outs_bgr = jnp.clip(outs * 127.5 + 127.5, 0, 255)[..., ::-1]

    if cfg.propagated_pixel_weight >= 0.001:
        w = jnp.where(mask01_d <= 0.5, cfg.propagated_pixel_weight,
                      1.0 - cfg.propagated_pixel_weight)[..., None]
        outs_bgr = outs_bgr * (1.0 - w) + warped_d * w

    # clip + truncate to uint8 ON DEVICE (4x less pull traffic; floor
    # reproduces numpy's u8 cast bit-for-bit — see bgr_f32_to_u8), one
    # BATCHED array per output kind instead of per-frame dispatches
    res = {
        "batch": batch, "n_real": n_real,
        "reference_frame": reference_frame,
        "outs_u8_d": jnp.floor(jnp.clip(outs_bgr[:n_real], 0, 255)
                               ).astype(jnp.uint8),
    }
    if cfg.write_vis:
        res["conf_u8_d"] = jnp.clip(conf_d[:n_real] * 255, 0, 255
                                    ).astype(jnp.uint8)
        res["warped_u8_d"] = jnp.floor(jnp.clip(warped_d[:n_real], 0, 255)
                                       ).astype(jnp.uint8)
        res["mask_u8_d"] = (mask01_d[:n_real] * 255).astype(jnp.uint8)
    return res


def _finalize_batch(res, out_dir, cfg, writer=None):
    """Pull a dispatched batch's device uint8 results and write PNGs.
    Runs while the device computes the NEXT batch (the denoise was
    dispatched async); PNG encode itself is write-behind via
    ``writer`` (utils.images.PngWriter) when provided."""
    put = writer.submit if writer is not None else write_png
    outs_u8 = bgr_f32_to_u8(res["outs_u8_d"])   # u8 passthrough pull
    if cfg.write_vis:
        conf_u8 = np.asarray(res["conf_u8_d"])
        warped_u8 = np.asarray(res["warped_u8_d"])
        mask_u8 = np.asarray(res["mask_u8_d"])
    for i, (frame_bgr, counter) in enumerate(res["batch"][:res["n_real"]]):
        put(f"{out_dir}/converted_{counter:06d}.png", outs_u8[i])
        if cfg.write_vis:
            put(f"{out_dir}/pixel_confidence_{counter:06d}.png",
                conf_u8[i])
            masked = warped_u8[i].copy()
            masked[mask_u8[i] > 127] = np.array([0, 0, 255], np.uint8)
            vis = np.concatenate([res["reference_frame"], frame_bgr,
                                  outs_u8[i], outs_u8[i], warped_u8[i],
                                  masked], axis=1)
            put(f"{out_dir}/vis_{counter:06d}.png", vis)


def _process_batch(batch, flow_pair, out_dir, reference_frame,
                   reference_ai_frame, sd_inpaint, tagger, cfg,
                   mesh=None, n_real=None):
    """Dispatch + finalize back to back (the non-overlapped composition;
    run_batched pipelines the two phases across batches instead)."""
    res = _dispatch_batch_denoise(batch, flow_pair, reference_frame,
                                  reference_ai_frame, sd_inpaint, tagger,
                                  cfg, mesh=mesh, n_real=n_real)
    _finalize_batch(res, out_dir, cfg)


def run_batched(frames: Iterable[Tuple[np.ndarray, bool, int]],
                save_dir: str,
                sd: F.StableDiffusionBundle,
                sd_inpaint: F.StableDiffusionBundle,
                flow_estimator: FlowConfidenceEstimator,
                tagger: Optional[Tagger] = None,
                cfg: PixelInpaintConfig = PixelInpaintConfig()):
    """Segment-batched variant of :func:`run`: non-key frames are
    grouped into ``cfg.frame_batch``-sized batches (all warped from the
    same AI keyframe, so they are independent) and denoised together.
    Output contract and per-frame values match :func:`run` exactly."""
    out_dir = f"{save_dir}_pixel_warp-{cfg.name}"
    os.makedirs(out_dir, exist_ok=True)
    bsz = max(cfg.frame_batch, 1)

    mesh = None
    if cfg.dp > 0:
        import dataclasses

        import jax
        from ..parallel.mesh import make_mesh, replicate_tree
        if bsz % cfg.dp != 0:
            raise ValueError(f"frame_batch={bsz} not divisible by "
                             f"dp={cfg.dp}")
        mesh = make_mesh(dp=cfg.dp, devices=jax.devices()[:cfg.dp])
        # bundles come off create_model committed to device 0; without
        # explicit replication every dp dispatch implicitly re-transfers
        # the params (multi-GB) to the other chips — replicate once, the
        # same way the keyframe --sp path does (cli.py)
        def _rep(b):
            return dataclasses.replace(
                b, unet_params=replicate_tree(b.unet_params, mesh),
                vae_params=replicate_tree(b.vae_params, mesh),
                clip_params=replicate_tree(b.clip_params, mesh),
                sched=replicate_tree(b.sched, mesh))
        sd, sd_inpaint = _rep(sd), _rep(sd_inpaint)

    reference_frame = None
    reference_ai_frame = None
    pending: list = []
    inflight = None      # (batch, (flow_d, conf_d)) with flow dispatched
    denoised = None      # dispatched denoise awaiting host finalize
    from ..utils.images import PngWriter
    writer = PngWriter()

    # Three-stage software pipeline over the single device stream:
    # while batch k's denoise computes on-chip, batch k+1's flow is
    # already queued behind it AND batch k-1's uint8 pull + PNG encode
    # run on the host — the round-4 phase table showed ~0.41 s/frame of
    # pull/warp/IO serialized between device phases.
    def process_inflight():
        nonlocal inflight, denoised
        if inflight is not None:
            (batch, n_real), flow_pair = inflight
            inflight = None
            res = _dispatch_batch_denoise(
                batch, flow_pair, reference_frame, reference_ai_frame,
                sd_inpaint, tagger, cfg, mesh=mesh, n_real=n_real)
            prev, denoised = denoised, res
            if prev is not None:
                _finalize_batch(prev, out_dir, cfg, writer)

    def queue_batch():
        """Dispatch this batch's flow (async), then denoise the PREVIOUS
        batch while the new flow computes on-device."""
        nonlocal pending, inflight
        if not pending:
            return
        batch, n_real = pending, len(pending)
        if cfg.pad_tail_batch and 0 < n_real < bsz:
            # pad to the full batch shape: reuses the segment's compiled
            # flow/warp/inpaint programs (see PixelInpaintConfig)
            batch = batch + [batch[-1]] * (bsz - n_real)
        new = ((batch, n_real),
               _dispatch_batch_flow(batch, reference_frame,
                                    flow_estimator, cfg.flow_chunk))
        pending = []
        process_inflight()
        inflight = new

    try:
        for frame_bgr, is_key, counter in frames:
            if is_key:
                queue_batch()
                process_inflight()
                ai_frame = keyframe_img2img(sd, tagger, frame_bgr, cfg)
                reference_frame = frame_bgr
                reference_ai_frame = ai_frame
                writer.submit(f"{out_dir}/converted_{counter:06d}.png",
                              ai_frame)
                if cfg.write_vis:
                    vis = np.concatenate([frame_bgr, frame_bgr, ai_frame,
                                          ai_frame, frame_bgr, ai_frame],
                                         axis=1)
                    writer.submit(f"{out_dir}/vis_{counter:06d}.png", vis)
                    writer.submit(
                        f"{out_dir}/pixel_confidence_{counter:06d}.png",
                        np.ones(frame_bgr.shape[:2], np.uint8))
            else:
                pending.append((frame_bgr, counter))
                if len(pending) >= bsz:
                    queue_batch()
        queue_batch()
        process_inflight()
        if denoised is not None:
            _finalize_batch(denoised, out_dir, cfg, writer)
            denoised = None
    finally:
        writer.close()
    return out_dir
