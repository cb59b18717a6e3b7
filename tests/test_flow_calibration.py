"""Flow-confidence calibration study (VERDICT r1 item 7).

The reference's masks come from PDCNet+'s learned uncertainty
(reference: pdcnet_of.py:66-75, confidence = softmax(weight_map)[0]),
thresholded at 0.95 for the pixel pipeline's inpaint mask
(ofgen_pixel_inpaint.py:262) and 0.5/0.9 for the keyframe pipeline
(ofgen_keyframe_inpaint.py:737). Our replacement derives confidence from
forward-backward round-trip error with conf = exp(-e^2 / (2 sigma^2 +
alpha*mag2)), sigma=1.03 (models/flowconf.py).

Real video pairs cannot enter this environment, so this study validates
the calibration on synthetic motion with REALISTIC statistics: smooth
large-displacement fields + an independently moving occluder (the two
phenomena that produce inpaint-mask pixels in the pipelines), with
RAFT-like estimator noise injected on top of ground truth. What is
pinned:

  1. the analytic anchor: conf(1/3 px round trip) ~ 0.95 — the design
     point that makes the reference's 0.95 threshold meaningful;
  2. mask RECALL: pixels whose true warp is unverifiable (occluded /
     disoccluded) fall below 0.95 confidence;
  3. mask PRECISION: well-matched pixels under realistic estimator
     noise (EPE ~0.1-0.2 px, RAFT-things-level) stay ABOVE 0.95 —
     i.e. the mask does not balloon into the whole frame;
  4. the keyframe pipeline's looser 0.5 threshold tolerates ~1 px of
     estimator disagreement (its use: scoring frame connectivity,
     ofgen_keyframe_inpaint.py:666-670).

Numbers recorded in DECISIONS.md ("flow-confidence calibration").
"""

import jax.numpy as jnp
import numpy as np

from sd_animation_optical_flow_tpu.models import flowconf as FC

SIGMA = FC.FlowConfidenceConfig().fb_sigma
ALPHA = FC.FlowConfidenceConfig().fb_alpha


def _smooth_field(rng, h, w, scale, amplitude):
    """Low-frequency Gaussian random field: realistic camera/scene
    motion (smooth, large displacement)."""
    gh, gw = max(h // scale, 2), max(w // scale, 2)
    coarse = rng.standard_normal((gh, gw, 2)).astype(np.float32)
    # bilinear upsample to full res
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
    field = (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
             + c10 * fy * (1 - fx) + c11 * fy * fx)
    return field * amplitude


def _sample_bilinear(field, x, y):
    """field [H,W,2] sampled at float coords (clamped)."""
    h, w = field.shape[:2]
    x = np.clip(x, 0, w - 1.001)
    y = np.clip(y, 0, h - 1.001)
    x0, y0 = x.astype(int), y.astype(int)
    fx, fy = (x - x0)[..., None], (y - y0)[..., None]
    return (field[y0, x0] * (1 - fy) * (1 - fx)
            + field[y0, x0 + 1] * (1 - fy) * fx
            + field[y0 + 1, x0] * fy * (1 - fx)
            + field[y0 + 1, x0 + 1] * fy * fx)


def _invert_field(fwd):
    """True inverse of a smooth displacement field by fixed-point
    iteration: bwd(x) = -fwd(x + bwd(x)). For a NON-uniform field,
    bwd != -fwd on the same grid (the naive negation leaves |J|*|u|
    of spurious round-trip error — larger than the thresholds under
    study, so the inverse must be exact)."""
    h, w = fwd.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bwd = -fwd.copy()
    for _ in range(25):
        bwd = -_sample_bilinear(fwd, xx + bwd[..., 0], yy + bwd[..., 1])
    return bwd.astype(np.float32)


def _make_scene(rng, h=128, w=192, bg_amp=6.0, fg_shift=(22.0, 9.0)):
    """Smooth background motion + an independently moving square
    occluder. Returns (fwd, bwd, occluded_mask) where fwd maps target
    coords -> source offsets (the pipelines' convention) and
    ``occluded`` marks target pixels whose true correspondence is
    invalid (disoccluded background: visible now, hidden in source)."""
    bg = _smooth_field(rng, h, w, scale=32, amplitude=bg_amp)
    bg_bwd = _invert_field(bg)

    # foreground square in the TARGET frame, moved by fg_shift from its
    # source position
    cy, cx, r = h // 2, w // 2, min(h, w) // 6
    fg_mask_tgt = np.zeros((h, w), bool)
    fg_mask_tgt[cy - r:cy + r, cx - r:cx + r] = True
    sy, sx = fg_shift
    fwd = bg.copy()
    fwd[fg_mask_tgt] = (-sx, -sy)        # flow[...,0]=x, [...,1]=y

    # source-frame foreground position
    fg_mask_src = np.zeros((h, w), bool)
    fg_mask_src[int(cy - sy) - r:int(cy - sy) + r,
                int(cx - sx) - r:int(cx - sx) + r] = True

    # backward flow (source -> target offsets)
    bwd = bg_bwd.copy()
    bwd[fg_mask_src] = (sx, sy)

    # disocclusion: background pixels in the target whose source
    # location lands under the source-frame foreground — their true
    # correspondence is hidden (these are what inpainting must fill)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    src_x = np.clip(np.rint(xx + fwd[..., 0]).astype(int), 0, w - 1)
    src_y = np.clip(np.rint(yy + fwd[..., 1]).astype(int), 0, h - 1)
    occluded = fg_mask_src[src_y, src_x] & ~fg_mask_tgt
    return fwd.astype(np.float32), bwd.astype(np.float32), occluded


def _conf(fwd, bwd):
    c, _ = FC.fb_confidence(jnp.asarray(fwd), jnp.asarray(bwd),
                            sigma=SIGMA, alpha=ALPHA)
    return np.asarray(c)


def test_analytic_anchor_third_px():
    """The design point: a 1/3 px round-trip error sits at ~0.95
    confidence — the reference's pixel-pipeline mask threshold."""
    e = 1.0 / 3.0
    conf = np.exp(-e ** 2 / (2 * SIGMA ** 2))
    assert 0.945 < conf < 0.955
    # and 1 px sits comfortably below 0.95 but above 0.5: gray zone
    conf1 = np.exp(-1.0 / (2 * SIGMA ** 2))
    assert 0.5 < conf1 < 0.95


def test_occlusion_recall_and_noise_precision():
    """On the synthetic scene: >=90% of disoccluded pixels fall below
    the 0.95 mask threshold (recall — those pixels get inpainted), and
    under RAFT-like estimator noise (EPE ~0.15 px) <=15% of truly
    well-matched pixels do (precision — the mask does not balloon)."""
    rng = np.random.default_rng(42)
    fwd, bwd, occluded = _make_scene(rng)
    h, w = occluded.shape

    # estimator noise: smooth low-amplitude error field, EPE ~0.15 px
    # (RAFT-things on clean frames), on BOTH directions independently
    nf = _smooth_field(rng, h, w, scale=8, amplitude=0.15)
    nb = _smooth_field(rng, h, w, scale=8, amplitude=0.15)
    conf = _conf(fwd + nf, bwd + nb)

    # border pixels go out of bounds under bg motion; exclude them the
    # way the pipelines exclude the pad ring
    inner = np.zeros((h, w), bool)
    m = 12
    inner[m:-m, m:-m] = True

    mask = conf < 0.95                      # inpaint mask polarity
    occ = occluded & inner
    good = (~occluded) & inner
    recall = mask[occ].mean()
    false_rate = mask[good].mean()
    print(f"recall={recall:.3f} false_rate={false_rate:.3f}")
    assert recall >= 0.90, f"occlusion recall {recall:.3f}"
    assert false_rate <= 0.15, f"mask false rate {false_rate:.3f}"


def test_noise_sweep_mask_coverage():
    """Mask coverage as a function of estimator quality: at EPE<=0.2 px
    the 0.95-mask stays sparse (<20% of verifiable pixels), by 1 px it
    has grown substantially (>40%) — i.e. the threshold reacts in the
    px regime where warped pixels actually become unusable, matching
    the role PDCNet+'s 0.95 plays in the reference."""
    rng = np.random.default_rng(7)
    fwd, bwd, occluded = _make_scene(rng)
    h, w = occluded.shape
    inner = np.zeros((h, w), bool)
    inner[12:-12, 12:-12] = True
    good = (~occluded) & inner

    coverage = {}
    for amp in (0.1, 0.2, 0.5, 1.0):
        nf = _smooth_field(rng, h, w, scale=8, amplitude=amp)
        nb = _smooth_field(rng, h, w, scale=8, amplitude=amp)
        conf = _conf(fwd + nf, bwd + nb)
        coverage[amp] = float((conf < 0.95)[good].mean())
    print("coverage", coverage)
    assert coverage[0.1] < 0.20
    assert coverage[0.2] < 0.30
    assert coverage[1.0] > 0.40
    # monotone growth with noise
    assert coverage[0.1] <= coverage[0.5] <= coverage[1.0]


def test_keyframe_threshold_tolerance():
    """The keyframe pipeline scores frame connectivity with conf>=0.5
    sums (ofgen_keyframe_inpaint.py:666-670): a well-matched pair with
    ~1 px disagreement must still count as connected (conf>0.5), while
    the occluded region must not."""
    rng = np.random.default_rng(3)
    fwd, bwd, occluded = _make_scene(rng)
    h, w = occluded.shape
    nf = _smooth_field(rng, h, w, scale=8, amplitude=1.0)
    conf = _conf(fwd + nf, bwd)
    inner = np.zeros((h, w), bool)
    inner[12:-12, 12:-12] = True
    good = (~occluded) & inner
    assert (conf >= 0.5)[good].mean() > 0.80
    assert (conf >= 0.5)[occluded & inner].mean() < 0.10
