"""Dense flow + per-pixel confidence — the PDCNet+ replacement.

The reference wraps the external DenseMatching PDCNet+ network
(reference: pdcnet_of.py:45-75): ``calc(frame1, frame2)`` returns a flow
field in the *target* (frame2) coordinate frame pointing at source
(frame1) pixels, plus a confidence map = softmax(weight_map)[0] in (0,1)
thresholded downstream at 0.5/0.9/0.95 (ofgen_pixel_inpaint.py:221,262;
ofgen_keyframe_inpaint.py:737).

This in-repo head estimates flow with RAFT (both directions batched into
one forward) and derives confidence from forward-backward consistency +
out-of-bounds masking, calibrated so ~0.95 corresponds to ~1/3 px
round-trip error — preserving the reference's mask-threshold behavior
without the external dependency. The batched ``calc_batch`` API is the
one the keyframe pipeline requires (ofgen_keyframe_inpaint.py:594).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import remap
from .raft import RAFTConfig, coords_grid, pad_to_multiple, raft_apply


@dataclass(frozen=True)
class FlowConfidenceConfig:
    # corr_dtype="bfloat16" is available as a knob but measured neutral
    # on v5e (the lookup is gather-op-bound, not bandwidth-bound), so
    # the default keeps exact f32 reference numerics.
    raft: RAFTConfig = RAFTConfig()
    # conf = exp(-e_fb^2 / (2 sigma^2)); sigma=1.03 => conf(1/3 px)~0.95
    fb_sigma: float = 1.03
    # relative slack term (classic fb-consistency): tolerated error grows
    # with flow magnitude
    fb_alpha: float = 0.01


def _warp_field(field, flow):
    """Sample ``field`` [H, W, C] at x + flow (bilinear, border clamp)."""
    h, w = flow.shape[:2]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None] + flow[..., 1]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :] + flow[..., 0]
    return remap(field, gx, gy, mode="linear")


def fb_confidence(flow_fwd, flow_bwd, *, sigma: float, alpha: float):
    """Forward-backward consistency confidence.

    flow_fwd [H,W,2]: target->source; flow_bwd [H,W,2]: source->target.
    Round-trip error e(x) = |flow_fwd(x) + flow_bwd(x + flow_fwd(x))|.
    Returns (confidence, log_confidence) in (0, 1] / (-inf, 0].
    """
    bwd_at = _warp_field(flow_bwd, flow_fwd)
    rt = flow_fwd + bwd_at
    err2 = rt[..., 0] ** 2 + rt[..., 1] ** 2
    mag2 = (flow_fwd ** 2).sum(-1) + (bwd_at ** 2).sum(-1)
    # normalized squared error with magnitude-proportional slack
    norm = 2.0 * sigma ** 2 + alpha * mag2
    log_conf = -err2 / norm

    # pixels whose source lands outside the image can't be verified
    h, w = flow_fwd.shape[:2]
    sx = jnp.arange(w, dtype=jnp.float32)[None, :] + flow_fwd[..., 0]
    sy = jnp.arange(h, dtype=jnp.float32)[:, None] + flow_fwd[..., 1]
    inb = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    log_conf = jnp.where(inb, log_conf, -1e4)
    return jnp.exp(log_conf), log_conf


@functools.partial(jax.jit, static_argnames=("cfg", "iters"))
def _flow_conf_batch(params, cfg: FlowConfidenceConfig, src, tgt,
                     iters: int | None = None):
    """src/tgt [B, H, W, 3] RGB float 0-255 (H, W multiples of 8).

    Returns (flow [B,H,W,2] target-frame, conf [B,H,W], log_conf)."""
    b = src.shape[0]
    # one RAFT batch of 2B: [tgt->src | src->tgt]
    img1 = jnp.concatenate([tgt, src], axis=0)
    img2 = jnp.concatenate([src, tgt], axis=0)
    _, flow_up = raft_apply(params, cfg.raft, img1, img2, iters=iters)
    flow_fwd, flow_bwd = flow_up[:b], flow_up[b:]
    conf, log_conf = jax.vmap(
        lambda f, bwd: fb_confidence(f, bwd, sigma=cfg.fb_sigma,
                                     alpha=cfg.fb_alpha))(flow_fwd, flow_bwd)
    return flow_fwd, conf, log_conf


@functools.partial(jax.jit, static_argnames=("cfg", "iters"))
def _flow_conf_batch_bidir(params, cfg: FlowConfidenceConfig, src, tgt,
                           iters: int | None = None):
    """Both directions of each pair from ONE RAFT batch.

    The confidence estimate already runs RAFT forward AND backward per
    pair (the fb-consistency check needs both fields); the reverse pair
    (t, s) is exactly those same two fields with roles swapped, so the
    keyframe pipeline's O(N^2) pairwise phase gets the reverse entry for
    free — one RAFT program instead of two per unordered pair
    (reference analog: PDCNetAux caches each *directed* pair separately,
    ofgen_keyframe_inpaint.py:585-600).

    Returns (flow_st [B,H,W,2] in t-coords, conf_st,
             flow_ts in s-coords, conf_ts) — bit-identical to two
    ``_flow_conf_batch`` calls (the encoders are per-image: instance
    norm + inference-mode batch norm)."""
    b = src.shape[0]
    img1 = jnp.concatenate([tgt, src], axis=0)
    img2 = jnp.concatenate([src, tgt], axis=0)
    _, flow_up = raft_apply(params, cfg.raft, img1, img2, iters=iters)
    flow_fwd, flow_bwd = flow_up[:b], flow_up[b:]
    fb = jax.vmap(lambda f, bwd: fb_confidence(
        f, bwd, sigma=cfg.fb_sigma, alpha=cfg.fb_alpha))
    conf_st, _ = fb(flow_fwd, flow_bwd)
    conf_ts, _ = fb(flow_bwd, flow_fwd)
    return flow_fwd, conf_st, flow_bwd, conf_ts


class FlowConfidenceEstimator:
    """Drop-in ``calc`` / ``calc_batch`` provider (pdcnet_of.py API)."""

    def __init__(self, params, cfg: FlowConfidenceConfig = FlowConfidenceConfig(),
                 chunk: int = 0):
        self.params = params
        self.cfg = cfg
        # pairs per compiled RAFT call; 0 = whole batch in one program
        # (default). Isolated per-pair device time IS lower at chunk 1
        # (302/444/502 ms/pair at batch 1/2/4 — gathers lose efficiency
        # as the tables grow), but in the full pipeline the sequential
        # small dispatches leave queue bubbles on the tunnel and one big
        # program wins end to end (0.594/0.627/0.682 f/s at chunk
        # 1/2/off on the 13-frame pipeline benchmark).
        self.chunk = max(chunk, 0)

    def calc(self, frame_src, frame_tgt):
        """frame_* [H, W, 3] RGB uint8/float arrays.

        Returns numpy (flow [H,W,2], confidence [H,W], log_confidence) —
        flow in target coords pointing at source pixels (pdcnet_of.py:66-75).
        """
        flow, conf, log_conf = self.calc_batch(frame_src[None],
                                               frame_tgt[None])
        return flow[0], conf[0], log_conf[0]

    def calc_batch(self, src, tgt):
        """src/tgt [B, H, W, 3] -> numpy (flow [B,H,W,2], conf, log_conf).
        The batched API PDCNetAux depends on (ofgen_keyframe_inpaint.py:594)."""
        flow, conf, log_conf = self.calc_batch_device(src, tgt)
        return np.asarray(flow), np.asarray(conf), np.asarray(log_conf)

    def calc_batch_f16(self, src, tgt):
        """Like calc_batch but downloads flow+confidence as float16 and
        skips the log-confidence pull — half the bytes per pair on the
        host link (the keyframe pipeline's pairwise flow phase ships
        O(N^2) pairs; flow resolution 1/2048 px and conf 1/2048 are far
        below the 0.95-threshold granularity)."""
        flow, conf, _ = self.calc_batch_device(src, tgt)
        return (np.asarray(flow.astype(jnp.float16)),
                np.asarray(conf.astype(jnp.float16)))

    def calc_batch_bidir_f16(self, src, tgt):
        """Both directions per pair from one RAFT program: returns numpy
        f16 (flow_st, conf_st, flow_ts, conf_ts). flow_st lives in the
        tgt frame (pointing at src), flow_ts in the src frame. Halves
        the RAFT work of any consumer that needs both directed pairs —
        the keyframe pipeline's pairwise flow phase always does."""
        src = jnp.asarray(src).astype(jnp.float32)
        tgt = jnp.asarray(tgt).astype(jnp.float32)
        src_p, (h, w) = pad_to_multiple(src, 8)
        tgt_p, _ = pad_to_multiple(tgt, 8)
        f_st, c_st, f_ts, c_ts = _flow_conf_batch_bidir(
            self.params, self.cfg, src_p, tgt_p)
        crop = lambda a: np.asarray(a[:, :h, :w].astype(jnp.float16))
        return crop(f_st), crop(c_st), crop(f_ts), crop(c_ts)

    def calc_batch_device(self, src, tgt):
        """Async variant: returns device arrays without host sync, so the
        caller can dispatch flow for frame t+1 while frame t's denoise is
        still in flight (the streaming overlap, SURVEY §2.7 host⇄device
        staging row)."""
        # upload in the caller's dtype (uint8 frames are 4x lighter on
        # the ~80MB/s link) and cast on device
        src = jnp.asarray(src).astype(jnp.float32)
        tgt = jnp.asarray(tgt).astype(jnp.float32)
        src_p, (h, w) = pad_to_multiple(src, 8)
        tgt_p, _ = pad_to_multiple(tgt, 8)
        b = src_p.shape[0]
        if self.chunk == 0 or b <= self.chunk:
            flow, conf, log_conf = _flow_conf_batch(self.params, self.cfg,
                                                    src_p, tgt_p)
        else:
            parts = [_flow_conf_batch(self.params, self.cfg,
                                      src_p[i:i + self.chunk],
                                      tgt_p[i:i + self.chunk])
                     for i in range(0, b, self.chunk)]
            flow = jnp.concatenate([p[0] for p in parts], axis=0)
            conf = jnp.concatenate([p[1] for p in parts], axis=0)
            log_conf = jnp.concatenate([p[2] for p in parts], axis=0)
        return flow[:, :h, :w], conf[:, :h, :w], log_conf[:, :h, :w]
