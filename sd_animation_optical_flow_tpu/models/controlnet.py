"""ControlNet — zero-conv encoder copy + hint encoder, multi-net mixing.

Capability parity with the reference's ControlNet integration
(reference: controlnet.py:65-322 model, 326-432 preprocessors/loader/
multi-net application; ControlledUnetModel wiring at controlnet.py:29-62
— the part its committed configs never exercised and which is finished
here: models/unet.py consumes the 13 residuals via its ``control`` arg).

Reference quirk preserved by default: residuals are computed ONCE from
the first step's noisy latent and reused for every step, only re-weighted
by the (guidance_start, guidance_end) window (controlnet.py:412-432) —
which is also the cheap TPU shape: one ControlNet eval per frame, a
per-step scalar weight array inside the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d, conv2d_init, group_norm, linear, norm_init, swish
from .unet import (UNetConfig, _resblock_init, _resblock,
                   _spatial_transformer_init, _spatial_transformer)
from .layers import linear_init, timestep_embedding


def controlnet_init(rng, cfg: UNetConfig = UNetConfig(),
                    hint_channels: int = 3):
    """Encoder copy of the UNet + per-block zero convs + hint encoder
    (controlnet.py:65-299)."""
    rngs = iter(jax.random.split(rng, 300))
    mc = cfg.model_channels
    ted = cfg.time_embed_dim
    p: dict = {
        "time_embed": [linear_init(next(rngs), mc, ted),
                       linear_init(next(rngs), ted, ted)],
    }

    input_blocks: list = [{"conv": conv2d_init(next(rngs), cfg.in_channels,
                                               mc, 3)}]
    zero_convs = [conv2d_init(next(rngs), mc, mc, 1, zero=True)]
    ch = mc
    ds = 1
    for lvl, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _resblock_init(next(rngs), ch, mult * mc, ted)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk["transformer"] = _spatial_transformer_init(
                    next(rngs), ch, cfg.num_heads, cfg.context_dim,
                    cfg.transformer_depth)
            input_blocks.append(blk)
            zero_convs.append(conv2d_init(next(rngs), ch, ch, 1, zero=True))
        if lvl != len(cfg.channel_mult) - 1:
            input_blocks.append({"down": conv2d_init(next(rngs), ch, ch, 3)})
            zero_convs.append(conv2d_init(next(rngs), ch, ch, 1, zero=True))
            ds *= 2
    p["input_blocks"] = input_blocks
    p["zero_convs"] = zero_convs

    p["middle"] = {
        "res1": _resblock_init(next(rngs), ch, ch, ted),
        "transformer": _spatial_transformer_init(
            next(rngs), ch, cfg.num_heads, cfg.context_dim,
            cfg.transformer_depth),
        "res2": _resblock_init(next(rngs), ch, ch, ted),
    }
    p["middle_out"] = conv2d_init(next(rngs), ch, ch, 1, zero=True)

    # 8-layer stride-8 hint encoder, zero-conv tail (controlnet.py:164-180)
    hint_dims = [(hint_channels, 16, 1), (16, 16, 1), (16, 32, 2),
                 (32, 32, 1), (32, 96, 2), (96, 96, 1), (96, 256, 2)]
    p["hint"] = [conv2d_init(next(rngs), i, o, 3) for i, o, _ in hint_dims]
    p["hint_out"] = conv2d_init(next(rngs), 256, mc, 3, zero=True)
    return p


def controlnet_apply(params, cfg: UNetConfig, x, hint, timesteps, context):
    """Returns a 13-tuple of residuals (12 encoder + middle,
    controlnet.py:301-322)."""
    nh = cfg.num_heads
    t_emb = timestep_embedding(timesteps, cfg.model_channels, dtype=x.dtype)
    emb = linear(params["time_embed"][1],
                 swish(linear(params["time_embed"][0], t_emb)))

    strides = [1, 1, 2, 1, 2, 1, 2]
    h_hint = hint.astype(x.dtype)
    for conv_p, s in zip(params["hint"], strides):
        # explicit padding=1: the reference's 3x3/stride-2 hint convs pad
        # symmetrically (controlnet.py:164-180, conv_nd(..., padding=1));
        # XLA 'SAME' under stride 2 pads (0, 1) and shifts the grid
        h_hint = swish(conv2d(conv_p, h_hint, stride=s, padding=1))
    guided_hint = conv2d(params["hint_out"], h_hint)

    outs = []
    h = x
    first = True
    for blk, zc in zip(params["input_blocks"], params["zero_convs"]):
        if "conv" in blk:
            h = conv2d(blk["conv"], h)
        elif "down" in blk:
            h = conv2d(blk["down"], h, stride=2, padding=1)
        else:
            h = _resblock(blk["res"], h, emb)
            if "transformer" in blk:
                h, _ = _spatial_transformer(blk["transformer"], h, context,
                                            nh, None)
        if first:
            h = h + guided_hint
            first = False
        outs.append(conv2d(zc, h))

    h = _resblock(params["middle"]["res1"], h, emb)
    h, _ = _spatial_transformer(params["middle"]["transformer"], h, context,
                                nh, None)
    h = _resblock(params["middle"]["res2"], h, emb)
    outs.append(conv2d(params["middle_out"], h))
    return tuple(outs)


# ---------------------------------------------------------------------------
# preprocessors (controlnet.py:337-370)
# ---------------------------------------------------------------------------

def canny_hint(image_bgr_u8: np.ndarray, low: int = 100, high: int = 200,
               batch: int = 2) -> np.ndarray:
    """Canny edge hint, replicated to 3 channels, [B, H, W, 3] in [0,1]."""
    import cv2
    edges = cv2.Canny(image_bgr_u8, low, high).astype(np.float32) / 255.0
    hint = np.repeat(edges[:, :, None], 3, axis=2)
    return np.repeat(hint[None], batch, axis=0)


def inpaint_hint(image_bgr_u8: np.ndarray, mask_u8: np.ndarray,
                 batch: int = 1) -> np.ndarray:
    """Inpaint hint: image with -1 in the masked region
    (controlnet.py:358-370)."""
    detected = image_bgr_u8.astype(np.float32).copy()
    detected[mask_u8 > 127] = -255.0
    return np.repeat((detected / 255.0)[None], batch, axis=0)


def hed_hint(image_bgr_u8: np.ndarray, hed_fn=None, batch: int = 2
             ) -> np.ndarray:
    """HED soft-edge hint. ``hed_fn`` is a callable image->edge map; when
    absent (no HED weights in this environment) a Sobel-magnitude soft
    edge stands in (documented approximation)."""
    import cv2
    if hed_fn is not None:
        edges = hed_fn(image_bgr_u8)
    else:
        gray = cv2.cvtColor(image_bgr_u8, cv2.COLOR_BGR2GRAY)
        gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
        mag = np.sqrt(gx ** 2 + gy ** 2)
        edges = np.clip(mag / (mag.max() + 1e-6) * 255, 0, 255)
    hint = np.repeat((edges.astype(np.float32) / 255.0)[:, :, None], 3, 2)
    return np.repeat(hint[None], batch, axis=0)


# ---------------------------------------------------------------------------
# multi-ControlNet (controlnet.py:326-335, 412-432)
# ---------------------------------------------------------------------------

@dataclass
class ControlSpec:
    """One control source (SingleControlNet equivalent)."""
    params: dict                     # controlnet params
    cfg: UNetConfig
    hint: np.ndarray                 # [B, H, W, 3] in [0, 1]
    weight: float = 1.0
    guidance_start: float = 0.0
    guidance_end: float = 1.0


def control_residuals(specs: Sequence[ControlSpec], x, t, context):
    """Per-net residuals evaluated once (the reference's first-step cache
    semantics). Returns list over nets of 13-tuples."""
    outs = []
    for s in specs:
        hint = jnp.asarray(s.hint, x.dtype)
        if hint.shape[0] != x.shape[0]:
            hint = jnp.broadcast_to(hint, (x.shape[0],) + hint.shape[1:])
        outs.append(controlnet_apply(s.params, s.cfg, x, hint, t, context))
    return outs


def control_step_weights(specs: Sequence[ControlSpec], progress: np.ndarray
                         ) -> np.ndarray:
    """[t_enc, n_nets] weights with the guidance window applied
    (controlnet.py:424-431): weight unless p outside [start, end]."""
    w = np.zeros((len(progress), len(specs)), np.float32)
    for j, s in enumerate(specs):
        inside = (progress >= s.guidance_start) & (progress <= s.guidance_end)
        w[:, j] = np.where(inside, s.weight, 0.0)
    return w


def mix_controls(residuals_per_net, weights_j):
    """Weighted sum across nets for one step: residuals_per_net is a list
    of 13-tuples; weights_j [n_nets] (traced scalars OK)."""
    mixed = None
    for j, res in enumerate(residuals_per_net):
        scaled = tuple(r * weights_j[j] for r in res)
        mixed = scaled if mixed is None else \
            tuple(a + b for a, b in zip(mixed, scaled))
    return mixed
