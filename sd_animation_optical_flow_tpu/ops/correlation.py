"""Correlation volumes + windowed lookup for RAFT-style flow on TPU.

Two interchangeable paths, mirroring the reference's pair
(reference: RAFT/core/corr.py:12-91, RAFT/alt_cuda_corr/correlation_kernel.cu):

  * ``CorrPyramid`` — all-pairs correlation as one big MXU matmul
    ([B,HW,D] x [B,D,HW], scaled 1/sqrt(D), corr.py:52-60), average-pooled
    into a 4-level pyramid, looked up per iteration with a bilinear
    (2r+1)^2 window gather (corr.py:29-50). Memory: O((HW)^2) in HBM.

  * ``alt_correlation`` — the memory-lean alternative (the alt_cuda_corr
    contract): correlation is computed on the fly only inside the
    (2r+1)^2 window around the current coords, per pyramid level of
    fmap2, full-res fmap1 (corr.py:69-83 semantics). Implemented as a
    two-stage XLA row/column gather (``alt_correlation_xla``): XLA
    lowers take_along_axis of whole rows to fast dynamic slices, 9x
    faster than a flat element gather of the same window and 17x faster
    than a multi-dim slice gather (measured on v5e; see DECISIONS.md
    "alt_cuda_corr -> XLA windowed-gather"). A Pallas kernel was
    deliberately NOT written: the lookup is gather-bound, not MXU-bound,
    and the profiled flow step spends its time in the encoder convs and
    GRU, not here.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..models.layers import avg_pool2d


def all_pairs_correlation(fmap1, fmap2):
    """fmap1/fmap2 [B, H, W, D] -> corr [B, H, W, H, W] scaled 1/sqrt(D)."""
    b, h, w, d = fmap1.shape
    f1 = fmap1.reshape(b, h * w, d)
    f2 = fmap2.reshape(b, h * w, d)
    corr = jnp.einsum("bnd,bmd->bnm", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(d))
    return corr.reshape(b, h, w, h, w).astype(fmap1.dtype)


def build_pyramid(corr, num_levels: int = 4):
    """corr [B, H, W, H, W] -> list of [B*H*W, H_l, W_l] levels."""
    b, h, w = corr.shape[:3]
    lvl = corr.reshape(b * h * w, h, w, 1)
    pyramid = [lvl[..., 0]]
    for _ in range(num_levels - 1):
        lvl = avg_pool2d(lvl, 2)
        pyramid.append(lvl[..., 0])
    return pyramid


def _bilinear_sample_batch(vol, x, y):
    """vol [N, H, W]; x, y [N, P] pixel coords (align_corners=True,
    zero padding — RAFT/core/utils/utils.py:57-71 grid_sample semantics).
    Returns [N, P]."""
    n, h, w = vol.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        v = vol[jnp.arange(n)[:, None],
                jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(valid, v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def _window_lookup(vol, cx, cy, radius: int):
    """Bilinear (2r+1)^2 window sample exploiting the SHARED fractional
    offset: all window taps sit on the same sub-pixel phase, so gather
    one integer (2r+2)^2 window per pixel and apply the 2x2 bilinear
    stencil with static slices. (2r+2)^2 = 100 gathers/pixel instead of
    4*(2r+1)^2 = 324 — gathers are the TPU cost here, the stencil is
    free VPU work.

    vol [N, H, W]; cx, cy [N] window-center coords. -> [N, (2r+1)^2]
    (dy-major, dx-minor, matching the reference corr.py:29-50 order).
    """
    n, h, w = vol.shape
    r = radius
    side = 2 * r + 1
    win = side + 1                                       # 2r+2
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0)[:, None, None]
    fy = (cy - y0)[:, None, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # cx/cy are already the window BASE (center - r): taps 0..2r+1
    wy = jnp.arange(0, win, dtype=jnp.int32)             # [win]
    yy = y0i[:, None] + wy[None, :]                      # [N, win]
    xx = x0i[:, None] + wy[None, :]                      # [N, win]
    vy = (yy >= 0) & (yy < h)
    vx = (xx >= 0) & (xx < w)
    yc = jnp.clip(yy, 0, h - 1)
    xc = jnp.clip(xx, 0, w - 1)
    # two-stage gather: whole rows first (contiguous [W] chunks XLA
    # lowers to dynamic slices), then columns within the gathered rows.
    # 8.9x faster than one flat element gather of the same window on
    # v5e (1.06ms vs 9.43ms at 6144x10x10 over 64x96), bit-identical.
    rows = jnp.take_along_axis(vol, yc[:, :, None], axis=1)   # [N, win, W]
    taps = jnp.take_along_axis(rows, xc[:, None, :], axis=2)  # [N, win, win]
    taps = taps.astype(jnp.float32)
    taps = jnp.where(vy[:, :, None] & vx[:, None, :], taps, 0.0)
    # shared-phase bilinear stencil over static slices
    out = ((1 - fy) * (1 - fx) * taps[:, :side, :side]
           + (1 - fy) * fx * taps[:, :side, 1:]
           + fy * (1 - fx) * taps[:, 1:, :side]
           + fy * fx * taps[:, 1:, 1:])
    return out.reshape(n, side * side)


def lookup_pyramid(pyramid: Sequence[jnp.ndarray], coords, radius: int = 4):
    """Sample a (2r+1)^2 window around ``coords`` at every pyramid level.

    coords [B, H, W, 2] (x, y) at base resolution -> [B, H, W, L*(2r+1)^2]
    (corr.py:29-50 contract; channel order: level-major, then dy, dx).

    Batched lookups run as a ``lax.map`` over the image axis: XLA's
    row-gather lowering degrades super-linearly as the table grows
    (measured 233ms -> 1614ms over 20 iterations going from 1 to 4
    image pairs in one gather), so per-image tables inside one program
    keep the fast small-table path with no extra dispatches.
    """
    b, h, w, _ = coords.shape
    r = radius
    side = 2 * r + 1

    def lookup_one(args):
        vols, flat = args          # tuple of [h*w, Hl, Wl]; [h*w, 2]
        outs = []
        for lvl, vol in enumerate(vols):
            scale = 1.0 / (2 ** lvl)
            # window center offset -r: taps run dy,dx in [-r, r+1]
            cx = flat[:, 0] * scale - r
            cy = flat[:, 1] * scale - r
            outs.append(_window_lookup(vol, cx, cy, r))
        return jnp.concatenate(outs, axis=-1)           # [h*w, L*side^2]

    flat = coords.reshape(b, h * w, 2).astype(jnp.float32)
    vols = tuple(v.reshape(b, h * w, *v.shape[1:]) for v in pyramid)
    if b <= 2:
        # small tables gather fine in one flat pass (the fwd+bwd pair of
        # the confidence estimator stays on this path)
        nvols = tuple(v.reshape(b * h * w, *v.shape[2:]) for v in vols)
        out = lookup_one((nvols, flat.reshape(b * h * w, 2)))
    else:
        out = jax.lax.map(lookup_one, (vols, flat))
    return out.reshape(b, h, w, len(pyramid) * side * side)


class CorrPyramid:
    """Precomputed all-pairs pyramid with per-iteration lookup."""

    def __init__(self, fmap1, fmap2, num_levels: int = 4, radius: int = 4):
        self.num_levels = num_levels
        self.radius = radius
        corr = all_pairs_correlation(fmap1, fmap2)
        self.pyramid = build_pyramid(corr, num_levels)

    def __call__(self, coords):
        return lookup_pyramid(self.pyramid, coords, self.radius)


# ---------------------------------------------------------------------------
# alt path: on-the-fly windowed correlation (no (HW)^2 volume)
# ---------------------------------------------------------------------------

def alt_correlation_xla(fmap1, fmap2_pyramid, coords, radius: int = 4):
    """Windowed correlation computed on the fly (alt_cuda_corr contract,
    correlation_kernel.cu:18-119): for each pixel p and each level l,
    corr[p, dy, dx] = <fmap1[p], bilinear(fmap2_l, coords[p]/2^l + (dx,dy))>
    / sqrt(D).

    fmap1 [B, H, W, D]; fmap2_pyramid: list of [B, H_l, W_l, D];
    coords [B, H, W, 2]. Returns [B, H, W, L*(2r+1)^2].
    """
    b, h, w, d = fmap1.shape
    r = radius
    side = 2 * r + 1
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    dx = dx.reshape(-1)
    dy = dy.reshape(-1)

    f1 = fmap1.reshape(b, h * w, d).astype(jnp.float32)
    flat = coords.reshape(b, h * w, 2).astype(jnp.float32)

    outs = []
    for lvl, f2 in enumerate(fmap2_pyramid):
        hl, wl = f2.shape[1:3]
        scale = 1.0 / (2 ** lvl)
        cx = flat[..., 0:1] * scale + dx[None, None, :]   # [B, HW, side^2]
        cy = flat[..., 1:2] * scale + dy[None, None, :]

        x0 = jnp.floor(cx); y0 = jnp.floor(cy)
        fx = cx - x0; fy = cy - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        f2f = f2.astype(jnp.float32)

        def tap(yy, xx):
            valid = ((xx >= 0) & (xx < wl) & (yy >= 0) & (yy < hl))
            idx = jnp.clip(yy, 0, hl - 1) * wl + jnp.clip(xx, 0, wl - 1)
            g = jnp.take_along_axis(
                f2f.reshape(b, hl * wl, d),
                idx.reshape(b, -1, 1), axis=1).reshape(idx.shape + (d,))
            return jnp.where(valid[..., None], g, 0.0)

        # bilinear blend of feature taps, then dot with fmap1
        feat = (tap(y0i, x0i) * ((1 - fy) * (1 - fx))[..., None]
                + tap(y0i, x0i + 1) * ((1 - fy) * fx)[..., None]
                + tap(y0i + 1, x0i) * (fy * (1 - fx))[..., None]
                + tap(y0i + 1, x0i + 1) * (fy * fx)[..., None])
        corr = jnp.einsum("bnd,bnkd->bnk", f1, feat,
                          preferred_element_type=jnp.float32)
        outs.append(corr / jnp.sqrt(jnp.float32(d)))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(b, h, w, len(fmap2_pyramid) * side * side)


def fmap_pyramid(fmap, num_levels: int = 4):
    """Feature pyramid for the alt path (corr.py:69-74 semantics)."""
    pyr = [fmap]
    cur = fmap
    for _ in range(num_levels - 1):
        cur = avg_pool2d(cur, 2)
        pyr.append(cur)
    return pyr
