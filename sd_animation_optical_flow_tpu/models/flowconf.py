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

A LEARNED uncertainty decoder (the reference's trained head,
pdcnet_of.py:66-75: confidence = softmax(weight_map)[0]) is also
provided: a small conv head over RAFT's final GRU hidden state predicts
a per-pixel Laplace scale b of the flow error; confidence =
P(|e_x|<R) * P(|e_y|<R) = (1-exp(-R/b))^2. It trains with
training/flow_train.py:uncertainty_train_step (NLL, flow frozen) on the
same synthetic-augmentation data as the flow trainer, and composes with
fb-consistency via FlowConfidenceConfig.uncertainty =
"fb" | "learned" | "min".
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
    # RAFTConfig defaults corr_dtype="bfloat16": per-pair device time is
    # ~neutral (the lookup is gather-op-bound) but the halved corr-HBM is
    # what lets flow_batch=8 fit next to the resident SD models (f32
    # OOMs at batch 8; 539 vs 716 ms/pair bidir — DECISIONS.md round 3).
    raft: RAFTConfig = RAFTConfig()
    # conf = exp(-e_fb^2 / (2 sigma^2)); sigma=1.03 => conf(1/3 px)~0.95
    fb_sigma: float = 1.03
    # relative slack term (classic fb-consistency): tolerated error grows
    # with flow magnitude
    fb_alpha: float = 0.01
    # confidence source: "fb" (forward-backward consistency, default),
    # "learned" (trained uncertainty decoder — the reference's PDCNet+
    # trained head analog, pdcnet_of.py:66-75), or "min" (elementwise
    # minimum of both: a pixel must pass BOTH checks). "learned"/"min"
    # require uncertainty-head params (estimator head_params).
    uncertainty: str = "fb"
    # learned confidence = P(|e_x|<R)P(|e_y|<R) under the predicted
    # per-pixel Laplace scale; R=1/3 px aligns conf~0.95 with the fb
    # calibration (DECISIONS.md round-2 study)
    learned_radius: float = 1.0 / 3.0


# ---------------------------------------------------------------------------
# learned uncertainty decoder (reference: pdcnet_of.py:66-75 — PDCNet+'s
# confidence is a TRAINED head; here a conv head over RAFT's final GRU
# hidden state + predicted flow predicts a per-pixel Laplace scale of
# the flow error, trained by training/flow_train.py:uncertainty_train_step)
# ---------------------------------------------------------------------------

def uncertainty_head_init(rng, hidden_dim: int = 128):
    from .layers import conv2d_init
    k = jax.random.split(rng, 3)
    in_ch = hidden_dim + 2                    # GRU state + low-res flow
    return {"conv1": conv2d_init(k[0], in_ch, 128, 3),
            "conv2": conv2d_init(k[1], 128, 64, 3),
            "out": conv2d_init(k[2], 64, 1, 1)}


def uncertainty_head_apply(params, net, flow_low):
    """net [N,H/8,W/8,hidden], flow_low [N,H/8,W/8,2] ->
    log_b [N,H/8,W/8] (log Laplace scale of per-axis flow error,
    full-res pixel units)."""
    from .layers import conv2d
    x = jnp.concatenate([net, flow_low * 0.125], axis=-1)
    x = jax.nn.relu(conv2d(params["conv1"], x))
    x = jax.nn.relu(conv2d(params["conv2"], x))
    # clamp for numeric sanity: b in [e^-6, e^6] px
    return jnp.clip(conv2d(params["out"], x)[..., 0], -6.0, 6.0)


def learned_confidence(log_b_low, out_hw, radius: float):
    """Upsample the 1/8-res log-scale to full res (bilinear, like the
    reference's uncertainty decoder output resize) and map to
    P(|e_x|<R)P(|e_y|<R) = (1 - exp(-R/b))^2 in (0,1)."""
    h, w = out_hw
    log_b = jax.image.resize(log_b_low, (log_b_low.shape[0], h, w),
                             method="bilinear")
    b = jnp.exp(log_b)
    p = 1.0 - jnp.exp(-radius / b)
    return p * p


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
                     iters: int | None = None, head_params=None):
    """src/tgt [B, H, W, 3] RGB float 0-255 (H, W multiples of 8).

    Returns (flow [B,H,W,2] target-frame, conf [B,H,W], log_conf)."""
    b = src.shape[0]
    if cfg.uncertainty == "learned":
        # single-direction fast path: the backward field is consumed
        # only by fb-consistency; pure 'learned' confidence needs the
        # forward GRU state + the (forward-flow-only) out-of-bounds
        # sentinel. Halves the flow program — the same economy as the
        # reference's PDCNet+ single-pass uncertainty decoder
        # (pdcnet_of.py:66-75 runs one direction).
        assert head_params is not None, \
            "uncertainty='learned' needs trained head params"
        flow_low, flow_fwd, net = raft_apply(
            params, cfg.raft, tgt, src, iters=iters, with_features=True)
        log_b = uncertainty_head_apply(head_params, net, flow_low)
        conf_l = learned_confidence(log_b, flow_fwd.shape[1:3],
                                    cfg.learned_radius)
        h, w = flow_fwd.shape[1:3]
        sx = jnp.arange(w, dtype=jnp.float32)[None, None, :] \
            + flow_fwd[..., 0]
        sy = jnp.arange(h, dtype=jnp.float32)[None, :, None] \
            + flow_fwd[..., 1]
        inb = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
        log_conf = jnp.where(inb, jnp.log(conf_l + 1e-30), -1e4)
        conf = jnp.where(inb, conf_l, 0.0)
        return flow_fwd, conf, log_conf
    # one RAFT batch of 2B: [tgt->src | src->tgt]
    img1 = jnp.concatenate([tgt, src], axis=0)
    img2 = jnp.concatenate([src, tgt], axis=0)
    want_feats = cfg.uncertainty != "fb"
    if want_feats:
        flow_low2, flow_up, net2 = raft_apply(
            params, cfg.raft, img1, img2, iters=iters, with_features=True)
    else:
        _, flow_up = raft_apply(params, cfg.raft, img1, img2, iters=iters)
    flow_fwd, flow_bwd = flow_up[:b], flow_up[b:]
    conf, log_conf = jax.vmap(
        lambda f, bwd: fb_confidence(f, bwd, sigma=cfg.fb_sigma,
                                     alpha=cfg.fb_alpha))(flow_fwd, flow_bwd)
    if want_feats:
        assert head_params is not None, \
            "uncertainty='learned'/'min' needs trained head params"
        log_b = uncertainty_head_apply(head_params, net2[:b],
                                       flow_low2[:b])
        conf_l = learned_confidence(log_b, flow_fwd.shape[1:3],
                                    cfg.learned_radius)
        conf_new = conf_l if cfg.uncertainty == "learned" \
            else jnp.minimum(conf, conf_l)
        # keep the out-of-bounds sentinel from the fb pass
        log_conf = jnp.where(log_conf <= -1e4, -1e4,
                             jnp.log(conf_new + 1e-30))
        conf = jnp.where(log_conf <= -1e4,
                         jnp.zeros_like(conf_new), conf_new) \
            if cfg.uncertainty == "learned" else conf_new
    return flow_fwd, conf, log_conf


@functools.partial(jax.jit, static_argnames=("cfg", "iters"))
def _flow_conf_batch_bidir(params, cfg: FlowConfidenceConfig, src, tgt,
                           iters: int | None = None, head_params=None):
    """Both directions of each pair from ONE RAFT batch.

    The confidence estimate already runs RAFT forward AND backward per
    pair (the fb-consistency check needs both fields); the reverse pair
    (t, s) is exactly those same two fields with roles swapped, so the
    keyframe pipeline's O(N^2) pairwise phase gets the reverse entry for
    free — one RAFT program instead of two per unordered pair
    (reference analog: PDCNetAux caches each *directed* pair separately,
    ofgen_keyframe_inpaint.py:585-600).

    With cfg.uncertainty "learned"/"min" the trained decoder is applied
    to BOTH directions (the 2B RAFT batch already carries each
    direction's GRU state), so one run uses a single confidence
    semantics across the pairwise and back-fill phases.

    Returns (flow_st [B,H,W,2] in t-coords, conf_st,
             flow_ts in s-coords, conf_ts) — bit-identical to two
    ``_flow_conf_batch`` calls (the encoders are per-image: instance
    norm + inference-mode batch norm)."""
    b = src.shape[0]
    img1 = jnp.concatenate([tgt, src], axis=0)
    img2 = jnp.concatenate([src, tgt], axis=0)
    want_feats = cfg.uncertainty != "fb"
    if want_feats:
        flow_low2, flow_up, net2 = raft_apply(
            params, cfg.raft, img1, img2, iters=iters, with_features=True)
    else:
        _, flow_up = raft_apply(params, cfg.raft, img1, img2, iters=iters)
    flow_fwd, flow_bwd = flow_up[:b], flow_up[b:]
    fb = jax.vmap(lambda f, bwd: fb_confidence(
        f, bwd, sigma=cfg.fb_sigma, alpha=cfg.fb_alpha))
    conf_st, logc_st = fb(flow_fwd, flow_bwd)
    conf_ts, logc_ts = fb(flow_bwd, flow_fwd)
    if want_feats:
        assert head_params is not None, \
            "uncertainty='learned'/'min' needs trained head params"
        log_b = uncertainty_head_apply(head_params, net2, flow_low2)
        conf_l = learned_confidence(log_b, flow_fwd.shape[1:3],
                                    cfg.learned_radius)
        if cfg.uncertainty == "learned":
            # learned head, zeroed ONLY at out-of-bounds pixels — the
            # same mask the single-direction fast path applies (a pixel
            # whose source lands outside the frame has nothing to warp
            # from). The fb log-conf sentinel is NOT reused here: it can
            # also fire on catastrophic fb error, which would silently
            # mix fb semantics into the pure-learned mode and make the
            # two 'learned' paths disagree.
            def _oob(flow):
                h, w = flow.shape[1:3]
                sx = jnp.arange(w, dtype=jnp.float32)[None, None, :] \
                    + flow[..., 0]
                sy = jnp.arange(h, dtype=jnp.float32)[None, :, None] \
                    + flow[..., 1]
                return ((sx >= 0) & (sx <= w - 1)
                        & (sy >= 0) & (sy <= h - 1))
            conf_st = jnp.where(_oob(flow_fwd), conf_l[:b], 0.0)
            conf_ts = jnp.where(_oob(flow_bwd), conf_l[b:], 0.0)
        else:
            conf_st = jnp.minimum(conf_st, conf_l[:b])
            conf_ts = jnp.minimum(conf_ts, conf_l[b:])
    return flow_fwd, conf_st, flow_bwd, conf_ts


class FlowConfidenceEstimator:
    """Drop-in ``calc`` / ``calc_batch`` provider (pdcnet_of.py API)."""

    def __init__(self, params, cfg: FlowConfidenceConfig = FlowConfidenceConfig(),
                 chunk: int = 0, head_params=None):
        self.params = params
        self.cfg = cfg
        # trained uncertainty-decoder params (uncertainty_head_init);
        # required when cfg.uncertainty is "learned" or "min". Applied
        # uniformly: calc_batch AND the bidir pairwise path (both
        # directions' GRU states ride the same 2B RAFT batch).
        self.head_params = head_params
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
            self.params, self.cfg, src_p, tgt_p,
            head_params=self.head_params)
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
            flow, conf, log_conf = _flow_conf_batch(
                self.params, self.cfg, src_p, tgt_p,
                head_params=self.head_params)
        else:
            parts = [_flow_conf_batch(self.params, self.cfg,
                                      src_p[i:i + self.chunk],
                                      tgt_p[i:i + self.chunk],
                                      head_params=self.head_params)
                     for i in range(0, b, self.chunk)]
            flow = jnp.concatenate([p[0] for p in parts], axis=0)
            conf = jnp.concatenate([p[1] for p in parts], axis=0)
            log_conf = jnp.concatenate([p[2] for p in parts], axis=0)
        return flow[:, :h, :w], conf[:, :h, :w], log_conf[:, :h, :w]
