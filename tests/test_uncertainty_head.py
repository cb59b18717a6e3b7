"""Learned flow-uncertainty decoder (VERDICT r2 item 5).

The reference's confidence is a TRAINED head (PDCNet+,
pdcnet_of.py:66-75: confidence = softmax(weight_map)[0]); rounds 1-2
approximated it with forward-backward consistency. These tests pin the
learned head: NLL training reduces the loss and produces a positive
error/scale correlation (the head learns WHERE the flow is wrong), and
the estimator's "learned"/"min" confidence modes hold their contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.training import flow_train as FT


def _tiny_cfg():
    return RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2)


def _toy_batch(rng, n=2, h=32, w=48, shift=3):
    """Texture shifted right by `shift` px; the right strip is occluded
    (new content) so its ground-truth flow is invalid there."""
    r = np.random.default_rng(rng)
    im1 = r.random((n, h, w, 3), dtype=np.float32) * 255
    im2 = np.roll(im1, shift, axis=2)
    im2[:, :, :shift] = r.random((n, h, shift, 3), dtype=np.float32) * 255
    flow_gt = np.zeros((n, h, w, 2), np.float32)
    flow_gt[..., 0] = shift
    valid = np.ones((n, h, w), np.float32)
    return (jnp.asarray(im1), jnp.asarray(im2), jnp.asarray(flow_gt),
            jnp.asarray(valid))


def test_uncertainty_head_shapes(rng):
    cfg = _tiny_cfg()
    hp = FC.uncertainty_head_init(rng, hidden_dim=cfg.hidden_dim)
    net = jnp.zeros((2, 4, 6, cfg.hidden_dim))
    flow_low = jnp.zeros((2, 4, 6, 2))
    log_b = FC.uncertainty_head_apply(hp, net, flow_low)
    assert log_b.shape == (2, 4, 6)
    conf = FC.learned_confidence(log_b, (32, 48), radius=1 / 3)
    assert conf.shape == (2, 32, 48)
    assert float(conf.min()) >= 0.0 and float(conf.max()) <= 1.0


def test_uncertainty_train_step_learns(rng):
    """NLL must drop and the predicted scale must become positively
    correlated with the realized flow error on a frozen RAFT."""
    cfg = _tiny_cfg()
    k1, k2 = jax.random.split(rng)
    raft_p = RF.raft_init(k1, cfg)
    head_p = FC.uncertainty_head_init(k2, hidden_dim=cfg.hidden_dim)
    tx = FT.make_flow_optimizer(lr=3e-3)
    state = FT.init_flow_train_state(head_p, tx)
    im1, im2, gt, valid = _toy_batch(0)

    losses, corrs = [], []
    for _ in range(30):
        state, loss, metrics = FT.uncertainty_train_step(
            state, raft_p, cfg, tx, im1, im2, gt, valid, iters=2)
        losses.append(float(loss))
        corrs.append(float(metrics["err_scale_corr"]))
    print(f"uncertainty nll {losses[0]:.3f} -> {losses[-1]:.3f}, "
          f"corr {corrs[0]:.3f} -> {corrs[-1]:.3f}")
    assert losses[-1] < losses[0] - 0.1, (losses[0], losses[-1])
    assert corrs[-1] > 0.0, corrs[-1]


def test_estimator_learned_and_min_modes(rng):
    cfg_fb = FC.FlowConfidenceConfig(raft=_tiny_cfg())
    k1, k2 = jax.random.split(rng)
    raft_p = RF.raft_init(k1, cfg_fb.raft)
    head_p = FC.uncertainty_head_init(k2,
                                      hidden_dim=cfg_fb.raft.hidden_dim)
    g = np.random.default_rng(1)
    src = g.uniform(0, 255, (1, 32, 40, 3))
    tgt = np.roll(src, 2, axis=2)

    est_fb = FC.FlowConfidenceEstimator(raft_p, cfg_fb)
    flow_fb, conf_fb, log_fb = est_fb.calc_batch(src, tgt)

    for mode in ("learned", "min"):
        cfg = FC.FlowConfidenceConfig(
            raft=cfg_fb.raft, uncertainty=mode)
        est = FC.FlowConfidenceEstimator(raft_p, cfg, head_params=head_p)
        flow, conf, log_conf = est.calc_batch(src, tgt)
        # flow is untouched by the confidence source
        np.testing.assert_allclose(flow, flow_fb, atol=1e-5)
        assert conf.shape == conf_fb.shape
        assert float(conf.min()) >= 0.0 and float(conf.max()) <= 1.0
        # log_conf stays consistent with conf away from the OOB sentinel
        inb = log_conf > -100
        np.testing.assert_allclose(np.log(conf + 1e-30)[inb],
                                   log_conf[inb], atol=1e-3)
        if mode == "min":
            assert np.all(conf <= conf_fb + 1e-6)


def test_bidir_pairwise_applies_learned_head(rng):
    """ADVICE r3 (medium): with uncertainty="learned"/"min" the bidir
    pairwise path must apply the trained head too — one run, one
    confidence semantics across the keyframe pipeline's pairwise and
    back-fill phases. Each direction of the bidir program must agree
    with the corresponding single-direction calc_batch call."""
    cfg_base = _tiny_cfg()
    k1, k2 = jax.random.split(rng)
    raft_p = RF.raft_init(k1, cfg_base)
    head_p = FC.uncertainty_head_init(k2, hidden_dim=cfg_base.hidden_dim)
    g = np.random.default_rng(3)
    src = g.uniform(0, 255, (2, 32, 40, 3))
    tgt = np.roll(src, 2, axis=2)

    for mode in ("fb", "learned", "min"):
        cfg = FC.FlowConfidenceConfig(raft=cfg_base, uncertainty=mode)
        est = FC.FlowConfidenceEstimator(raft_p, cfg, head_params=head_p)
        f_st, c_st, f_ts, c_ts = est.calc_batch_bidir_f16(src, tgt)
        # direction s->t stored in t coords == calc_batch(src, tgt)
        flow_ref, conf_ref, _ = est.calc_batch(src, tgt)
        np.testing.assert_allclose(f_st, flow_ref, atol=2e-2)
        np.testing.assert_allclose(c_st, conf_ref, atol=2e-3)
        # reverse direction == calc_batch(tgt, src)
        flow_rev, conf_rev, _ = est.calc_batch(tgt, src)
        np.testing.assert_allclose(f_ts, flow_rev, atol=2e-2)
        np.testing.assert_allclose(c_ts, conf_rev, atol=2e-3)
