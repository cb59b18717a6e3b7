"""RAFT-small, PLMS, EMA, distributions tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_animation_optical_flow_tpu.diffusion import ddim as D
from sd_animation_optical_flow_tpu.diffusion import distributions as DIST
from sd_animation_optical_flow_tpu.diffusion import plms as PLMS
from sd_animation_optical_flow_tpu.diffusion.schedule import (
    make_ddim_params, make_linear_schedule)
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.training import ema as EMA


def test_raft_small_shapes(rng):
    cfg = RF.RAFTConfig.small_config(iters=2, corr_levels=2, corr_radius=2)
    assert cfg.small and cfg.hidden_dim == 96
    params = RF.raft_init(rng, cfg)
    img = jax.random.uniform(rng, (1, 32, 48, 3)) * 255
    flow_low, flow_up = RF.raft_apply(params, cfg, img, img)
    assert flow_low.shape == (1, 4, 6, 2)
    assert flow_up.shape == (1, 32, 48, 2)
    assert bool(jnp.isfinite(flow_up).all())


def _oracle(sched, x0):
    def model_fn(x, t, ctx, control=None):
        a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        x0b = jnp.concatenate([x0, x0]) if x.shape[0] != x0.shape[0] else x0
        return (x - a * x0b) / s
    return model_fn


def test_plms_recovers_x0_with_oracle(rng):
    sched = make_linear_schedule()
    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    ddim = make_ddim_params(sched, 50)
    t_enc = 20
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    x_t = D.stochastic_encode(ddim, x0, t_enc, noise)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    out = PLMS.plms_decode(_oracle(sched, x0), sched, ddim, x_t, cond, cond,
                           t_enc, rng=rng)
    err = np.abs(np.asarray(out - x0))
    assert err.mean() < 0.05


def test_ema_warmup_and_convergence():
    p0 = {"w": jnp.zeros((4,))}
    state = EMA.ema_init(p0)
    target = {"w": jnp.ones((4,))}
    for _ in range(200):
        state = EMA.ema_update(state, target, decay=0.99)
    assert int(state.num_updates) == 200
    # converged close to target under warm-up decay schedule
    assert float(jnp.abs(EMA.ema_params(state)["w"] - 1.0).max()) < 0.1


def test_distributions(rng):
    mean = jnp.zeros((1, 4, 4, 2))
    logvar = jnp.zeros((1, 4, 4, 2))
    np.testing.assert_allclose(np.asarray(DIST.kl(mean, logvar)), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(DIST.mode(mean, logvar)),
                               np.zeros((1, 4, 4, 2)))
    s = DIST.sample(mean, logvar, rng)
    assert s.shape == mean.shape
    # unit-gaussian NLL of its own mean = 0.5*log(2pi) per element
    nll0 = DIST.nll(mean, logvar, mean)
    np.testing.assert_allclose(np.asarray(nll0),
                               0.5 * np.log(2 * np.pi) * 32, rtol=1e-5)
    m2 = jnp.ones_like(mean)
    assert float(DIST.kl(m2, logvar)[0]) > 0
