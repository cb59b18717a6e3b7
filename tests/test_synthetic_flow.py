"""Synthetic flow-scene suite + uncertainty pretraining loop.

The scenes feed the trained uncertainty decoder (VERDICT r3 ask #5 —
the reference ships PDCNet+'s head trained, pdcnet_of.py:66-75). These
tests pin the ground-truth geometry (the property everything downstream
depends on) and the full pretrain->evaluate loop at toy scale.
"""

import numpy as np

from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.training import synthetic_flow as SF
from sd_animation_optical_flow_tpu.training import \
    uncertainty_pretrain as UP


def test_scene_ground_truth_geometry():
    """img1[p] must photometrically match img2[p + flow[p]] on valid
    non-occluded pixels (the flow is the exact inverse of the render
    field, not a negation), and the occlusion masks must be non-trivial
    but sparse."""
    rng = np.random.default_rng(0)
    s = SF.render_scene(rng, 64, 96)
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    resampled = SF._sample_bilinear(s.img2, xx + s.flow[..., 0],
                                    yy + s.flow[..., 1])
    m = (s.valid > 0) & ~s.occluded
    # photometric jitter is <=6 gray levels + bilinear blur; a wrong
    # inverse would leave tens of levels of error
    err = np.abs(resampled - s.img1)[m].mean()
    assert err < 12.0, err
    for mask in (s.occluded, s.disoccluded):
        assert 0.005 < mask.mean() < 0.6, mask.mean()
    assert s.img1.min() >= 0 and s.img1.max() <= 255


def test_scene_randomization_varies():
    rng = np.random.default_rng(1)
    a = SF.render_scene(rng, 32, 40)
    b = SF.render_scene(rng, 32, 40)
    assert not np.allclose(a.flow, b.flow)
    assert not np.allclose(a.img1, b.img1)


def test_synthetic_batch_shapes():
    rng = np.random.default_rng(2)
    im1, im2, flow, valid, occ, dis = SF.synthetic_batch(rng, 3, 32, 40)
    assert im1.shape == im2.shape == (3, 32, 40, 3)
    assert flow.shape == (3, 32, 40, 2)
    assert valid.shape == occ.shape == dis.shape == (3, 32, 40)
    assert im1.dtype == np.float32


def test_pretrain_loop_runs():
    """Both training stages and both evaluators execute end-to-end at
    toy scale with finite results and the right structures (convergence
    is pinned on the COMMITTED artifacts by
    test_shipped_uncertainty_artifacts — RAFT needs far more steps than
    a unit test can afford)."""
    cfg = RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=3,
                        corr_dtype="float32")
    raft_p, m_flow = UP.train_raft_synthetic(
        cfg, steps=3, batch=1, h=64, w=96, iters=2, seed=0)
    assert np.isfinite(m_flow["epe"])

    head_p, m_head = UP.train_head_synthetic(
        raft_p, cfg, steps=3, batch=1, h=64, w=96, iters=2, seed=1)
    assert np.isfinite(m_head["nll"])
    assert set(head_p) == {"conv1", "conv2", "out"}

    epe = UP.eval_epe(raft_p, cfg, n_scenes=2, h=64, w=96, iters=2)
    assert np.isfinite(epe)
    ev = UP.evaluate_masks(raft_p, head_p, cfg, n_scenes=2, h=64, w=96)
    for mode in ("fb", "learned", "min"):
        assert 0.0 <= ev[mode]["recall@0.95"] <= 1.0
        assert 0.0 <= ev[mode]["false_rate@0.95"] <= 1.0
    # "min" masks everything either source masks: recall dominates both
    assert ev["min"]["recall@0.95"] >= max(ev["fb"]["recall@0.95"],
                                           ev["learned"]["recall@0.95"]) \
        - 1e-6


def test_shipped_uncertainty_artifacts():
    """The committed artifacts (artifacts/raft_synth.npz +
    uncertainty_head_synth.npz, produced by `cli.py train-uncertainty`)
    must actually be good: trained-RAFT held-out EPE far below the
    zero-flow baseline, and the learned mask quality in the same band
    as fb on held-out scenes (the numbers banked in DECISIONS.md)."""
    import os

    import jax

    from sd_animation_optical_flow_tpu.models import flowconf as FC
    from sd_animation_optical_flow_tpu.utils.checkpoint import load_pytree

    root = os.path.join(os.path.dirname(__file__), "..", "artifacts")
    cfg = RF.RAFTConfig(corr_dtype="float32")
    raft_p = load_pytree(os.path.join(root, "raft_synth.npz"),
                         RF.raft_init(jax.random.PRNGKey(0), cfg))
    head_p = load_pytree(
        os.path.join(root, "uncertainty_head_synth.npz"),
        FC.uncertainty_head_init(jax.random.PRNGKey(0), cfg.hidden_dim))

    epe = UP.eval_epe(raft_p, cfg, n_scenes=4, h=128, w=192, iters=12)
    # round-5 artifacts: 4000-step resumed RAFT measures 1.18 here
    # (held-out 16-scene eval: 1.30; zero-flow baseline ~4.4 px)
    assert epe < 1.5, epe

    ev = UP.evaluate_masks(raft_p, head_p, cfg, n_scenes=4,
                           h=128, w=192)
    assert ev["fb"]["recall@0.95"] > 0.9, ev
    assert ev["min"]["recall@0.95"] > 0.9, ev
    # threshold-free ranking quality: the trained head must order
    # disoccluded vs verifiable pixels far above chance (absolute
    # thresholded rates at 128x192 are dominated by the synthetic
    # RAFT's EPE — see evaluate_masks docstring). Round-5 measured:
    # fb 0.958, learned 0.853 (BCE-sharpened), min 0.972.
    assert ev["fb"]["auroc"] > 0.92, ev
    assert ev["learned"]["auroc"] > 0.80, ev
    assert ev["min"]["auroc"] > 0.94, ev
    assert ev["min"]["recall@0.95"] >= ev["fb"]["recall@0.95"] - 1e-6
