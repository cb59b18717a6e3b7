"""Flow training path: per-iteration RAFT outputs, sequence loss,
jitted train step (training/flow_train.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.training import flow_train as FT


def _tiny_cfg():
    return RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2, small=True)


def test_raft_all_iters_shapes(rng):
    cfg = _tiny_cfg()
    params = RF.raft_init(rng, cfg)
    im = jnp.zeros((1, 32, 48, 3))
    fl, fu = RF.raft_apply(params, cfg, im, im, iters=3, all_iters=True)
    assert fl.shape == (3, 1, 4, 6, 2)
    assert fu.shape == (3, 1, 32, 48, 2)
    # final test-mode flow equals the last all_iters entry
    fl2, fu2 = RF.raft_apply(params, cfg, im, im, iters=3)
    np.testing.assert_allclose(np.asarray(fu[-1]), np.asarray(fu2),
                               atol=1e-5)


def test_sequence_loss_weighting():
    """Later iterations weigh more (gamma^(N-1-i)); perfect final
    prediction with bad early ones beats the reverse."""
    gt = jnp.ones((1, 8, 8, 2))
    valid = jnp.ones((1, 8, 8))
    bad = jnp.zeros((1, 8, 8, 2))
    good_last = jnp.stack([bad, gt])
    good_first = jnp.stack([gt, bad])
    l1, m1 = FT.sequence_loss(good_last, gt, valid, gamma=0.5)
    l2, m2 = FT.sequence_loss(good_first, gt, valid, gamma=0.5)
    assert float(l1) < float(l2)
    assert float(m1["epe"]) == 0.0          # metrics use the final iter
    assert float(m2["epe"]) > 0.0


def test_sequence_loss_masks_invalid_and_extreme():
    gt = jnp.ones((1, 4, 4, 2)) * 1000.0    # beyond max_flow
    preds = jnp.zeros((1, 1, 4, 4, 2))
    valid = jnp.ones((1, 4, 4))
    loss, m = FT.sequence_loss(preds, gt, valid, max_flow=400.0)
    assert float(loss) == 0.0               # everything masked
    gt2 = jnp.ones((1, 4, 4, 2))
    loss2, _ = FT.sequence_loss(preds, gt2, jnp.zeros((1, 4, 4)))
    assert float(loss2) == 0.0              # invalid mask respected


def test_flow_train_step_learns(rng):
    """A few steps on a constant-flow target must reduce the loss."""
    cfg = _tiny_cfg()
    params = RF.raft_init(rng, cfg)
    r = np.random.default_rng(0)
    im1 = jnp.asarray(r.random((1, 32, 48, 3), dtype=np.float32) * 255)
    im2 = jnp.asarray(r.random((1, 32, 48, 3), dtype=np.float32) * 255)
    gt = jnp.full((1, 32, 48, 2), 0.5)
    valid = jnp.ones((1, 32, 48))

    tx = FT.make_flow_optimizer(lr=1e-3)
    st = FT.init_flow_train_state(params, tx)
    losses = []
    for _ in range(6):
        st, loss, metrics = FT.flow_train_step(st, cfg, tx, im1, im2,
                                               gt, valid, iters=2)
        losses.append(float(loss))
    assert int(st.step) == 6
    assert np.isfinite(losses).all()
    assert min(losses[3:]) < losses[0]


def test_flow_evaluate_on_synthetic_dataset(rng, tmp_path, np_rng):
    from PIL import Image
    from sd_animation_optical_flow_tpu.training import flow_data as FD
    from sd_animation_optical_flow_tpu.training import flow_eval as FE
    from sd_animation_optical_flow_tpu.utils.flow_io import write_flo

    root = tmp_path / "chairs"
    root.mkdir()
    for i in range(2):
        a = (np_rng.random((40, 56, 3)) * 255).astype(np.uint8)
        Image.fromarray(a).save(root / f"{i:05d}_img1.ppm")
        Image.fromarray(a).save(root / f"{i:05d}_img2.ppm")
        write_flo(str(root / f"{i:05d}_flow.flo"),
                  np.zeros((40, 56, 2), np.float32))
    ds = FD.flying_chairs(str(root))
    cfg = _tiny_cfg()
    params = RF.raft_init(rng, cfg)
    m = FE.evaluate(params, cfg, ds, iters=2)
    assert set(m) == {"epe", "1px", "3px", "5px", "n"}
    assert m["n"] == 2.0
    assert np.isfinite(m["epe"])
    assert 0.0 <= m["1px"] <= 1.0
