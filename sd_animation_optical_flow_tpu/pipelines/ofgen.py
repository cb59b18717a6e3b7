"""Warp-as-guidance pipeline (the reference's ``ofgen.py`` variant).

Sequential frame-to-frame stabilization without inpainting
(reference: ofgen.py:118-167): RAFT flow between consecutive raw frames,
backward-warp the previous *converted* frame with the negated forward
flow + unsharp (ofgen.py:37-43, 85-88), then img2img with the warped
frame as continuous per-step, per-pixel pred_x0 guidance: weight 0.6
early / 0.4 late in the denoise, 0.1 where the flow magnitude exceeds
1.5 px (ofgen.py:157-167).

Outputs: ``raw_%06d.png``, ``wrapped_%06d.png``, ``converted_%06d.png``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.filters import gaussian_blur
from ..ops.warp import warp_frame
from ..utils.images import bgr_u8_to_model, model_to_bgr_u8, write_png
from . import facades as F
from .tagger import NEGATIVE_PROMPT, Tagger


@dataclass
class OfgenConfig:
    denoising_strength: float = 0.4
    ddim_steps: int = 50
    dist_thres: float = 1.5
    weight_early: float = 0.6
    weight_late: float = 0.4
    weight_moving: float = 0.1
    early_until: float = 0.8
    seed: int = 1234
    prompt_extra: str = ""
    unsharp_amount: float = 0.12     # ofgen.py:85-88 uses 1.12/-0.12


def unsharp_ofgen(img_bgr_u8: np.ndarray, amount: float = 0.12) -> np.ndarray:
    img = jnp.asarray(img_bgr_u8.astype(np.float32))
    blurred = gaussian_blur(img, 2.0, ksize=13)
    out = (1 + amount) * img - amount * blurred
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def make_guidance_schedule(dist: np.ndarray, cfg: OfgenConfig):
    """Per-step weight-map schedule (ofgen.py:157-167): returns a host
    function p -> [H, W] float map."""
    def schedule(p):
        w = np.full(dist.shape,
                    cfg.weight_early if p < cfg.early_until
                    else cfg.weight_late, np.float32)
        w[dist > cfg.dist_thres] = cfg.weight_moving
        return w
    return schedule


def run(frames: Iterable[np.ndarray], save_dir: str,
        sd: F.StableDiffusionBundle, flow_calc,
        tagger: Optional[Tagger] = None,
        cfg: OfgenConfig = OfgenConfig()):
    """frames: iterable of BGR uint8 arrays. ``flow_calc(prev, cur)``
    returns forward flow prev->cur [H, W, 2] (RAFT contract)."""
    os.makedirs(save_dir, exist_ok=True)
    last_frame: Optional[np.ndarray] = None
    last_converted: Optional[np.ndarray] = None

    for ctr, frame in enumerate(frames):
        if last_frame is not None:
            flow = np.asarray(flow_calc(last_frame, frame))
            dist = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
            # backward warp with the NEGATED forward flow (ofgen.py:39)
            warped = np.asarray(warp_frame(
                jnp.asarray(last_converted.astype(np.float32)),
                jnp.asarray(-flow)))
            warped = np.clip(warped, 0, 255).astype(np.uint8)
            target = unsharp_ofgen(warped, cfg.unsharp_amount)
            write_png(f"{save_dir}/wrapped_{ctr:06d}.png", target)
        else:
            dist = np.zeros(frame.shape[:2], np.float32)
            target = None

        prompt = "masterpiece,best quality,"
        if tagger is not None and tagger.available:
            prompt = tagger.build_prompt(frame, cfg.prompt_extra)
        elif cfg.prompt_extra:
            prompt += cfg.prompt_extra

        out, _ = F.img2img(
            sd, bgr_u8_to_model(frame), prompt, NEGATIVE_PROMPT,
            cfg.denoising_strength, cfg.ddim_steps,
            target_img=None if target is None else bgr_u8_to_model(target),
            guidance_schedule_func=make_guidance_schedule(dist, cfg),
            seed=cfg.seed)
        converted = model_to_bgr_u8(out)

        write_png(f"{save_dir}/raw_{ctr:06d}.png", frame)
        write_png(f"{save_dir}/converted_{ctr:06d}.png", converted)
        last_frame = frame
        last_converted = converted
    return save_dir
