"""DPT monocular depth estimation (MiDaS stack) + depth2img conditioning.

Capabilities-parity with the reference's depth stack
(reference: ldm/modules/midas/ — midas/vit.py ViT-L/16 backbone with
hooks, midas/blocks.py reassemble + FeatureFusion decoder,
midas/dpt_depth.py DPTDepthModel, api.py MiDaSInference/transforms —
and LatentDepth2ImageDiffusion.get_input, ddpm.py:1756-1797, plus the
AddMiDaS batch transform, ldm/data/util.py:6-23).

TPU-first redesign rather than a timm translation:
  * the ViT backbone is a plain scanned-friendly stack of pre-LN blocks
    in NLC layout; patch embedding is one strided conv (MXU).
  * the 4 hooked feature maps are reassembled with 1x1 convs +
    nearest/strided resampling and fused coarse-to-fine with residual
    conv units — all NHWC convs XLA fuses well.
  * dpt_hybrid's readout='project' (concat CLS + project) is kept; the
    resnet hybrid stem is not (pure ViT-L, the dpt_large config).

Depth output is relative inverse depth [B, H, W] (non-negative), which
``depth_to_concat`` min-max normalizes to [-1, 1] at latent resolution —
the exact conditioning contract of ddpm.py:1782-1790.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.resize import resize
from .layers import (conv2d, conv2d_init, gelu, layer_norm, linear,
                     linear_init, nearest_upsample2x, norm_init,
                     normal_init_array)


@dataclass(frozen=True)
class DPTConfig:
    """Defaults = dpt_large / ViT-L-16 @ 384 (api.py:83-91,
    midas/dpt_depth.py vitl16_384: hooks [5,11,17,23],
    out channels [256,512,1024,1024], features 256)."""
    patch: int = 16
    width: int = 1024
    layers: int = 24
    heads: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    reassemble_ch: Sequence[int] = (256, 512, 1024, 1024)
    features: int = 256
    img_size: int = 384          # pos-emb grid reference size
    # AddMiDaS normalization for dpt models (api.py:34): mean=std=0.5
    norm_mean: float = 0.5
    norm_std: float = 0.5


# ---------------------------------------------------------------------------
# ViT backbone
# ---------------------------------------------------------------------------

def _vit_block_init(rng, width):
    k = iter(jax.random.split(rng, 6))
    return {
        "ln1": norm_init(width),
        "q": linear_init(next(k), width, width),
        "k": linear_init(next(k), width, width),
        "v": linear_init(next(k), width, width),
        "attn_out": linear_init(next(k), width, width),
        "ln2": norm_init(width),
        "mlp_in": linear_init(next(k), width, width * 4),
        "mlp_out": linear_init(next(k), width * 4, width),
    }


def _vit_block(lp, x, heads):
    b, n, c = x.shape
    d = c // heads
    h = layer_norm(lp["ln1"], x)
    q = linear(lp["q"], h).reshape(b, n, heads, d)
    k = linear(lp["k"], h).reshape(b, n, heads, d)
    v = linear(lp["v"], h).reshape(b, n, heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(d)))
    w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, c)
    x = x + linear(lp["attn_out"], attn)
    h = layer_norm(lp["ln2"], x)
    return x + linear(lp["mlp_out"], gelu(linear(lp["mlp_in"], h)))


def _readout_init(rng, width):
    # readout='project': cat(token, cls) -> width, GELU (midas/vit.py)
    return {"proj": linear_init(rng, 2 * width, width)}


def _readout(rp, tokens, cls):
    cls_b = jnp.broadcast_to(cls[:, None, :], tokens.shape)
    return gelu(linear(rp["proj"], jnp.concatenate([tokens, cls_b], -1)))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def dpt_init(rng, cfg: DPTConfig = DPTConfig()):
    rngs = iter(jax.random.split(rng, cfg.layers + 64))
    grid = cfg.img_size // cfg.patch
    f = cfg.features
    p = {
        "patch_embed": conv2d_init(next(rngs), 3, cfg.width, cfg.patch),
        "cls_token": jnp.zeros((1, 1, cfg.width), jnp.float32),
        "pos_embed": normal_init_array(
            next(rngs), (1, grid * grid + 1, cfg.width), 0.02),
        "blocks": [_vit_block_init(next(rngs), cfg.width)
                   for _ in range(cfg.layers)],
        "readouts": [_readout_init(next(rngs), cfg.width) for _ in range(4)],
        # per-hook 1x1 projection to reassemble channels
        "reassemble": [conv2d_init(next(rngs), cfg.width, ch, 1)
                       for ch in cfg.reassemble_ch],
        # resample convs: x4 and x2 branches get transpose-like upsample
        # (nearest + 3x3 conv); the /2 branch a stride-2 3x3 conv
        "resample_up4": conv2d_init(next(rngs), cfg.reassemble_ch[0],
                                    cfg.reassemble_ch[0], 3),
        "resample_up2": conv2d_init(next(rngs), cfg.reassemble_ch[1],
                                    cfg.reassemble_ch[1], 3),
        "resample_dn2": conv2d_init(next(rngs), cfg.reassemble_ch[3],
                                    cfg.reassemble_ch[3], 3),
        # scratch: 3x3 conv each branch to the common feature width
        "scratch": [conv2d_init(next(rngs), ch, f, 3, bias=False)
                    for ch in cfg.reassemble_ch],
        # fusion blocks (coarse->fine), each: 2 residual conv units +
        # 1x1 out conv (midas/blocks.py FeatureFusionBlock_custom)
        "fusion": [{
            "rcu1": [conv2d_init(next(rngs), f, f, 3),
                     conv2d_init(next(rngs), f, f, 3)],
            "rcu2": [conv2d_init(next(rngs), f, f, 3),
                     conv2d_init(next(rngs), f, f, 3)],
            "out": conv2d_init(next(rngs), f, f, 1),
        } for _ in range(4)],
        "head": [conv2d_init(next(rngs), f, f // 2, 3),
                 conv2d_init(next(rngs), f // 2, 32, 3),
                 conv2d_init(next(rngs), 32, 1, 1)],
    }
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _interp_pos_embed(pos, gh, gw, grid):
    """Resize the [1, grid*grid+1, C] pos table to a gh x gw grid
    (bilinear), keeping the CLS slot — timm-style non-square support."""
    if gh == grid and gw == grid:
        return pos
    cls, body = pos[:, :1], pos[:, 1:]
    body = body.reshape(1, grid, grid, -1)
    body = resize(body, (gh, gw), mode="linear").reshape(1, gh * gw, -1)
    return jnp.concatenate([cls, body], axis=1)


def _rcu(ps, x):
    h = conv2d(ps[0], jax.nn.relu(x))
    h = conv2d(ps[1], jax.nn.relu(h))
    return x + h


def dpt_apply(params, cfg: DPTConfig, img):
    """img [B, H, W, 3], H/W divisible by 16, already normalized
    ((x - mean)/std) -> inverse depth [B, H, W] (non-negative)."""
    b, H, W, _ = img.shape
    gh, gw = H // cfg.patch, W // cfg.patch
    x = conv2d(params["patch_embed"], img, stride=cfg.patch,
               padding="VALID")                        # [B, gh, gw, C]
    x = x.reshape(b, gh * gw, cfg.width)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    grid = cfg.img_size // cfg.patch
    x = x + _interp_pos_embed(params["pos_embed"], gh, gw,
                              grid).astype(x.dtype)

    hooked = []
    hooks = set(cfg.hooks)
    for i, bp in enumerate(params["blocks"]):
        x = _vit_block(bp, x, cfg.heads)
        if i in hooks:
            hooked.append(x)

    # reassemble the 4 hooked token maps to 4 spatial scales
    feats = []
    for i, hx in enumerate(hooked):
        t = _readout(params["readouts"][i], hx[:, 1:], hx[:, 0])
        t = t.reshape(b, gh, gw, cfg.width)
        t = conv2d(params["reassemble"][i], t)
        if i == 0:      # x4: 1/16 -> 1/4
            t = conv2d(params["resample_up4"],
                       nearest_upsample2x(nearest_upsample2x(t)))
        elif i == 1:    # x2: 1/16 -> 1/8
            t = conv2d(params["resample_up2"], nearest_upsample2x(t))
        elif i == 3:    # /2: 1/16 -> 1/32
            # 3x3/s2 with torch's symmetric padding=1 (midas/vit.py:453-459);
            # XLA 'SAME' would pad (0, 1) and shift the grid
            t = conv2d(params["resample_dn2"], t, stride=2, padding=1)
        feats.append(conv2d(params["scratch"][i], t))

    # coarse-to-fine RefineNet fusion
    path = None
    for i in reversed(range(4)):
        fp = params["fusion"][i]
        t = feats[i]
        if path is not None:
            t = t + _rcu(fp["rcu1"], path)
        t = _rcu(fp["rcu2"], t)
        t = nearest_upsample2x(t)
        path = conv2d(fp["out"], t)                    # now at 2x feats[i]

    # head (dpt_depth.py): conv -> upsample to input res -> 2 convs.
    # With patch=16 the fusion output sits at 1/2 res so this is the
    # reference's x2 interpolate; resize keeps it exact for any patch.
    h = conv2d(params["head"][0], path)
    if h.shape[1:3] != (H, W):
        h = resize(h, (H, W), mode="linear")
    h = jax.nn.relu(conv2d(params["head"][1], h))
    h = jax.nn.relu(conv2d(params["head"][2], h))
    return h[..., 0]


# ---------------------------------------------------------------------------
# conditioning helpers (AddMiDaS + LatentDepth2ImageDiffusion.get_input)
# ---------------------------------------------------------------------------

def midas_normalize(img01, cfg: DPTConfig = DPTConfig()):
    """AddMiDaS transform core (data/util.py:20-23 + api.py:34): image
    in [0,1] -> (x - mean)/std. Resize-to-/32 policy is the caller's
    (our pipelines run at fixed /64-divisible shapes already)."""
    return (img01 - cfg.norm_mean) / cfg.norm_std


def depth_to_concat(depth, latent_hw):
    """Depth map [B, H, W] -> c_concat [B, h, w, 1] in [-1, 1]:
    bicubic-resize to latent resolution then per-sample min-max
    normalize with the reference's +1e-3 guard (ddpm.py:1782-1790)."""
    d = resize(depth[..., None], latent_hw, mode="cubic")
    dmin = jnp.min(d, axis=(1, 2, 3), keepdims=True)
    dmax = jnp.max(d, axis=(1, 2, 3), keepdims=True)
    return 2.0 * (d - dmin) / (dmax - dmin + 0.001) - 1.0
