"""Synthetic optical-flow scenes with dense ground truth + occlusion.

The reference's confidence model (PDCNet+) ships a TRAINED uncertainty
decoder (reference: pdcnet_of.py:66-75); training one needs image pairs
with known flow. Real datasets (FlyingChairs/Things, training/
flow_data.py) cannot enter this environment, so this module renders the
same two phenomena the calibration study identified as what produces
inpaint-mask pixels (tests/test_flow_calibration.py): smooth
large-displacement camera/scene motion plus an independently moving
occluder. Every sample carries exact dense flow, a validity mask, and
the occlusion/out-of-bounds mask used to evaluate mask recall.

Geometry convention matches RAFT training data: ``flow`` maps *source*
(img1) pixel coords to their position in the *target* (img2):
``img1[p]`` appears at ``p + flow[p]`` in img2. Rendering goes the
other way — the target is produced by sampling the source texture at
``x + fwd(x)`` where ``fwd`` maps target coords to source offsets — so
``flow`` is the exact fixed-point inverse of the rendering field, not
its negation (a non-uniform field's inverse differs from -fwd by
|J|·|u|, which would poison the ground truth).

Pure NumPy on host: scene rendering is input-pipeline work and stays
off the accelerator (the train steps in training/flow_train.py are the
jitted part).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


def _bilinear_up(coarse: np.ndarray, h: int, w: int) -> np.ndarray:
    """[gh, gw, C] -> [h, w, C] bilinear upsample (align corners)."""
    gh, gw = coarse.shape[:2]
    ys = np.linspace(0, gh - 1, h, dtype=np.float32)
    xs = np.linspace(0, gw - 1, w, dtype=np.float32)
    y0 = np.clip(ys.astype(int), 0, gh - 2)
    x0 = np.clip(xs.astype(int), 0, gw - 2)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    c00 = coarse[y0][:, x0]
    c01 = coarse[y0][:, x0 + 1]
    c10 = coarse[y0 + 1][:, x0]
    c11 = coarse[y0 + 1][:, x0 + 1]
    return (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
            + c10 * fy * (1 - fx) + c11 * fy * fx)


def smooth_field(rng: np.random.Generator, h: int, w: int, *,
                 scale: int, amplitude: float) -> np.ndarray:
    """Low-frequency Gaussian random displacement field [h, w, 2]."""
    gh, gw = max(h // scale, 2), max(w // scale, 2)
    coarse = rng.standard_normal((gh, gw, 2)).astype(np.float32)
    return _bilinear_up(coarse, h, w) * amplitude


def _sample_bilinear(field: np.ndarray, x: np.ndarray,
                     y: np.ndarray) -> np.ndarray:
    """field [H, W, C] sampled at float coords (border clamp)."""
    h, w = field.shape[:2]
    x = np.clip(x, 0, w - 1.001)
    y = np.clip(y, 0, h - 1.001)
    x0, y0 = x.astype(int), y.astype(int)
    fx, fy = (x - x0)[..., None], (y - y0)[..., None]
    return (field[y0, x0] * (1 - fy) * (1 - fx)
            + field[y0, x0 + 1] * (1 - fy) * fx
            + field[y0 + 1, x0] * fy * (1 - fx)
            + field[y0 + 1, x0 + 1] * fy * fx)


def invert_field(fwd: np.ndarray, iters: int = 25) -> np.ndarray:
    """Fixed-point inverse of a smooth displacement field:
    bwd(x) = -fwd(x + bwd(x))."""
    h, w = fwd.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bwd = -fwd.copy()
    for _ in range(iters):
        bwd = -_sample_bilinear(fwd, xx + bwd[..., 0], yy + bwd[..., 1])
    return bwd.astype(np.float32)


def multiscale_texture(rng: np.random.Generator, h: int, w: int,
                       octaves=(4, 8, 16, 32)) -> np.ndarray:
    """RGB texture with structure at several scales so local matching
    is well-posed (pure white noise aliases under bilinear warps; a
    flat texture is aperture-ambiguous everywhere)."""
    img = np.zeros((h, w, 3), np.float32)
    amp = 1.0
    for sc in octaves:
        gh, gw = max(h // sc, 2), max(w // sc, 2)
        img += amp * _bilinear_up(
            rng.standard_normal((gh, gw, 3)).astype(np.float32), h, w)
        amp *= 0.7
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-6)
    return img


class FlowScene(NamedTuple):
    img1: np.ndarray      # [H, W, 3] float32 RGB 0..255 (source)
    img2: np.ndarray      # [H, W, 3] (target)
    flow: np.ndarray      # [H, W, 2] source->target, exact
    valid: np.ndarray     # [H, W] 1 = ground truth defined & in frame
    occluded: np.ndarray  # [H, W] source pixels hidden in the target
                          # (covered by the mover or out of bounds)
    disoccluded: np.ndarray  # [H, W] TARGET pixels hidden in the source
                             # — the grid the pipelines' confidence maps
                             # live on (calc(src, tgt) runs RAFT tgt->src
                             # and returns target-grid confidence), so
                             # this is what an inpaint mask must catch


def render_scene(rng: np.random.Generator, h: int = 128, w: int = 192,
                 *, bg_amp: float | None = None,
                 fg_shift: tuple | None = None) -> FlowScene:
    """One source/target pair: smoothly-moving textured background plus
    an independently moving textured rectangle (sprite model: the full
    background texture exists behind the mover, so disocclusions render
    consistently)."""
    if bg_amp is None:
        bg_amp = float(rng.uniform(2.0, 10.0))
    scale = int(rng.choice([16, 24, 32]))

    bg_tex = multiscale_texture(rng, h, w)
    fg_tex = multiscale_texture(rng, h, w)

    # fwd: target coords -> source offsets (renders the target);
    # the ground-truth source->target flow is its exact inverse
    fwd = smooth_field(rng, h, w, scale=scale, amplitude=bg_amp)
    bwd = invert_field(fwd)

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bg2 = _sample_bilinear(bg_tex, xx + fwd[..., 0], yy + fwd[..., 1])

    # foreground rectangle: source position + independent shift
    ry = int(rng.integers(h // 8, h // 4))
    rx = int(rng.integers(w // 8, w // 4))
    cy = int(rng.integers(ry, h - ry))
    cx = int(rng.integers(rx, w - rx))
    if fg_shift is None:
        m = max(h, w) / 8.0
        fg_shift = (float(rng.uniform(-m, m)), float(rng.uniform(-m, m)))
    sx, sy = fg_shift

    fg_src = np.zeros((h, w), bool)
    fg_src[cy - ry:cy + ry, cx - rx:cx + rx] = True
    ty0, ty1 = int(round(cy + sy)) - ry, int(round(cy + sy)) + ry
    tx0, tx1 = int(round(cx + sx)) - rx, int(round(cx + sx)) + rx
    fg_tgt = np.zeros((h, w), bool)
    fg_tgt[max(ty0, 0):max(ty1, 0), max(tx0, 0):max(tx1, 0)] = True

    img1 = np.where(fg_src[..., None], fg_tex, bg_tex)
    img2 = np.where(fg_tgt[..., None], fg_tex, bg2)

    flow = bwd.copy()
    flow[fg_src] = (round(cx + sx) - cx, round(cy + sy) - cy)

    # occlusion (what inpainting must fill, evaluated on the SOURCE
    # grid because flow/confidence are estimated source->target):
    # background pixels whose target position lands under the moved
    # rectangle, plus anything leaving the frame
    tx = xx + flow[..., 0]
    ty = yy + flow[..., 1]
    oob = (tx < 0) | (tx > w - 1) | (ty < 0) | (ty > h - 1)
    txi = np.clip(np.rint(tx).astype(int), 0, w - 1)
    tyi = np.clip(np.rint(ty).astype(int), 0, h - 1)
    covered = fg_tgt[tyi, txi] & ~fg_src
    occluded = covered | oob

    # disocclusion on the TARGET grid: background pixels whose source
    # location (x + fwd) lands under the source-frame rectangle, or out
    # of frame — visible now, unseeable in the source
    spx = xx + fwd[..., 0]
    spy = yy + fwd[..., 1]
    oob_t = (spx < 0) | (spx > w - 1) | (spy < 0) | (spy > h - 1)
    sxi = np.clip(np.rint(spx).astype(int), 0, w - 1)
    syi = np.clip(np.rint(spy).astype(int), 0, h - 1)
    disoccluded = (fg_src[syi, sxi] & ~fg_tgt) | oob_t

    # ground truth is geometrically exact everywhere; only
    # out-of-frame correspondences are unusable for the L1 flow loss
    valid = (~oob).astype(np.float32)

    # mild photometric difference between frames (RAFT's augmentor
    # territory, kept gentle: exposure drift between video frames)
    gain = float(rng.uniform(0.94, 1.06))
    bias = float(rng.uniform(-6.0, 6.0))
    img2 = np.clip(img2 * gain + bias, 0, 255)

    return FlowScene(img1.astype(np.float32), img2.astype(np.float32),
                     flow.astype(np.float32), valid,
                     occluded, disoccluded)


def synthetic_batch(rng: np.random.Generator, batch: int, h: int = 128,
                    w: int = 192):
    """Stacked training batch: (img1, img2, flow, valid) float32 arrays
    plus the occlusion masks (evaluation only, not a loss input)."""
    scenes = [render_scene(rng, h, w) for _ in range(batch)]
    stack = lambda f: np.stack([f(s) for s in scenes])
    return (stack(lambda s: s.img1), stack(lambda s: s.img2),
            stack(lambda s: s.flow), stack(lambda s: s.valid),
            stack(lambda s: s.occluded), stack(lambda s: s.disoccluded))
