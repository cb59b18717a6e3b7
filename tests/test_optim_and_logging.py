"""Tests for AdamW-with-EMA-wings and the image-logging utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.training.optim import (
    EMAWingsState, adamw_with_ema_wings, ema_params_of)
from sd_animation_optical_flow_tpu.utils import logging_images as LI


def test_adamw_ema_wings_tracks_params(rng):
    tx = adamw_with_ema_wings(lr=0.1, ema_decay=0.5, ema_power=1.0)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    assert isinstance(state, EMAWingsState)
    np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 1.0)

    grads = {"w": jnp.ones((4,))}
    for _ in range(5):
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    # params moved down (positive grads); ema lags behind params
    assert float(params["w"][0]) < 1.0
    ema = float(state.ema_params["w"][0])
    assert float(params["w"][0]) < ema < 1.0
    assert int(state.step) == 5


def test_adamw_ema_wings_warmup_decay():
    """At step 1 the effective decay is min(ema_decay, 1-1^-1) = 0, so
    the EMA equals the fresh params exactly (ldm/util.py:194)."""
    tx = adamw_with_ema_wings(lr=0.1, ema_decay=0.9999, ema_power=1.0)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.ones((2,))}, state, params)
    new_params = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(state.ema_params["w"]),
                               np.asarray(new_params["w"]), rtol=1e-6)


def test_ema_params_of_finds_state():
    tx = adamw_with_ema_wings(lr=0.1)
    params = {"w": jnp.zeros((2,))}
    state = tx.init(params)
    ema = ema_params_of((state,))       # nested tuple
    assert "w" in ema
    with pytest.raises(ValueError):
        ema_params_of((jnp.zeros(1),))


def test_adamw_ema_wings_requires_params():
    tx = adamw_with_ema_wings()
    state = tx.init({"w": jnp.zeros(1)})
    with pytest.raises(AssertionError):
        tx.update({"w": jnp.zeros(1)}, state, None)


# ---------------------------------------------------------------------------
# logging images
# ---------------------------------------------------------------------------

def test_count_params():
    params = {"a": jnp.zeros((2, 3)), "b": [jnp.zeros((4,))]}
    assert LI.count_params(params) == 10


def test_make_grid_layout():
    imgs = np.arange(6 * 4 * 4 * 3, dtype=np.float32).reshape(6, 4, 4, 3)
    grid = LI.make_grid(imgs, nrow=3, padding=1)
    # 2 rows x 3 cols of 4x4 tiles with 1px padding
    assert grid.shape == (2 * 5 + 1, 3 * 5 + 1, 3)
    np.testing.assert_allclose(grid[1:5, 1:5], imgs[0])
    np.testing.assert_allclose(grid[6:10, 1:5], imgs[3])


def test_log_txt_as_img():
    out = LI.log_txt_as_img((64, 32), ["hello", "world"], size=10)
    assert out.shape == (2, 32, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # text renders darker-than-white pixels
    assert (out < 0.99).any()


def test_denoise_row_grid():
    rows = [np.zeros((2, 4, 4, 3), np.float32) + i for i in range(3)]
    grid = LI.denoise_row_grid(rows)
    # batch-major rows, step-minor columns: 2 rows x 3 cols
    assert grid.shape == (2 * 6 + 2, 3 * 6 + 2, 3)


def test_to_uint8_range():
    x = np.array([[-1.0, 0.0, 1.0]])[..., None]
    u = LI.to_uint8(x)
    assert u.dtype == np.uint8
    assert u.ravel().tolist()[:3] == [0, 127, 255]


# ---------------------------------------------------------------------------
# finetune-family training conditioning (hybrid concat + adm)
# ---------------------------------------------------------------------------

def test_p_losses_hybrid_and_adm(rng):
    from sd_animation_optical_flow_tpu.diffusion.schedule import \
        make_linear_schedule
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.training.losses import p_losses

    cfg = U.UNetConfig(in_channels=9, model_channels=16, channel_mult=(1,),
                       attention_resolutions=(), num_heads=2,
                       context_dim=16, num_classes=8)
    params = U.unet_init(rng, cfg)
    sched = make_linear_schedule(100)
    x0 = jnp.zeros((2, 8, 8, 4))
    cc = jnp.ones((2, 8, 8, 5))          # 4-latent + 5-concat = 9ch UNet
    ctx = jnp.zeros((2, 3, 16))
    y = jnp.array([1, 3])
    loss = p_losses(params, cfg, sched, x0, ctx, jax.random.PRNGKey(1),
                    c_concat=cc, y=y)
    assert np.isfinite(float(loss))
    # gradients flow
    g = jax.grad(lambda p: p_losses(p, cfg, sched, x0, ctx,
                                    jax.random.PRNGKey(1), c_concat=cc,
                                    y=y))(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert total > 0.0


def test_train_step_with_concat(rng):
    from sd_animation_optical_flow_tpu.diffusion.schedule import \
        make_linear_schedule
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.training import train_step as TS

    cfg = U.UNetConfig(in_channels=5, model_channels=16, channel_mult=(1,),
                       attention_resolutions=(), num_heads=2,
                       context_dim=16)
    params = U.unet_init(rng, cfg)
    sched = make_linear_schedule(100)
    tx = TS.make_optimizer(lr=1e-4)
    state = TS.init_train_state(params, tx)
    step = TS.make_train_step(cfg, sched, tx)
    x0 = jnp.zeros((2, 8, 8, 4))
    cc = jnp.ones((2, 8, 8, 1))
    ctx = jnp.zeros((2, 3, 16))
    state, loss = step(state, x0, ctx, jax.random.PRNGKey(2), cc)
    assert int(state.step) == 1 and np.isfinite(float(loss))


def test_log_images_panel_dict():
    """log_images builds the reference's debug panel dict
    (ddpm.py:1083-1214): all panels are uint8 HWC grids."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sd_animation_optical_flow_tpu.utils.log_images import log_images
    from tests.test_pipeline import _tiny_bundle

    sd = _tiny_bundle(jax.random.PRNGKey(3))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3) * 2 - 1, jnp.float32)
    out = log_images(sd, imgs, ["a b", "c d"], ddim_steps=4,
                     cfg_scale=3.0, n_diffusion_row=3)
    for key in ("inputs", "reconstruction", "conditioning",
                "diffusion_row", "samples", "samples_cfg_scale_3.00"):
        assert key in out, key
        panel = out[key]
        assert panel.dtype == np.uint8 and panel.ndim == 3, key
