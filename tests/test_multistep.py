"""Parity pins for the unified multistep sampler engine.

diffusion/multistep.py claims exact DDIM (eta=0) and DPM-Solver++(2M)
math from one compiled scan fed coefficient *data*. These tests pin:
  * coefficient-form DDIM == ddim.ddim_decode (the reference decode
    walk, guided_ldm.py:133-158),
  * coefficient-form 2M == dpm_solver.dpmpp_2m_decode,
  * padding slots are exact no-ops,
  * one jit cache entry serves both samplers (the engine's reason to
    exist: one ~140MB TPU executable instead of one per sampler),
  * bf16 carry stays bf16 (dpm_solver bf16-carry lesson).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sd_animation_optical_flow_tpu.diffusion.ddim as D
import sd_animation_optical_flow_tpu.diffusion.multistep as M
import sd_animation_optical_flow_tpu.diffusion.schedule as S
from sd_animation_optical_flow_tpu.diffusion.dpm_solver import (
    dpmpp_2m_decode, uniform_timesteps_desc)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _toy_model():
    """Deterministic eps-model sensitive to x, t, AND ctx (so CFG has
    a real effect); understands the dedup tuple-ctx protocol the same
    way models.unet does (stem once conceptually; here just doubles)."""
    def model_fn(x, t, ctx, control=None):
        if isinstance(ctx, tuple):
            ctx = jnp.concatenate(ctx, axis=0)
            x = jnp.concatenate([x, x], axis=0)
            t = jnp.concatenate([t, t], axis=0)
        tt = (t.astype(x.dtype) / 1000.0).reshape(-1, 1, 1, 1)
        cm = ctx.mean(axis=(1, 2)).astype(x.dtype).reshape(-1, 1, 1, 1)
        return jnp.tanh(0.9 * x + tt) + 0.05 * jnp.sin(3.0 * x) + 0.1 * cm
    return model_fn


def _setup(rng, dtype=jnp.float32, b=2):
    x = jax.random.normal(rng, (b, 8, 8, 4), dtype)
    cond = D.CondBundle(crossattn=jnp.ones((b, 3, 8), dtype) * 0.3)
    uncond = D.CondBundle(crossattn=jnp.zeros((b, 3, 8), dtype))
    return x, cond, uncond


def test_ddim_coeff_parity(rng):
    sched = S.make_linear_schedule()
    ddim = S.make_ddim_params(sched, 50)
    t_enc = 20
    model = _toy_model()
    x, cond, uncond = _setup(rng)
    ref = D.ddim_decode(model, sched, ddim, x, cond, uncond, t_enc,
                        cfg_scale=7.0, rng=rng)
    co = M.make_ddim_coeffs(ddim, t_enc)
    out = M.multistep_decode(model, co, x, cond, uncond, cfg_scale=7.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_dpmpp_coeff_parity(rng):
    sched = S.make_linear_schedule()
    ddim = S.make_ddim_params(sched, 50)
    model = _toy_model()
    x, cond, uncond = _setup(rng)
    dts = uniform_timesteps_desc(sched, int(ddim.timesteps[20]), 10)
    ref = dpmpp_2m_decode(model, sched, dts, x, cond, uncond,
                          cfg_scale=7.0)
    co = M.make_dpmpp_coeffs(sched, dts)
    out = M.multistep_decode(model, co, x, cond, uncond, cfg_scale=7.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_padding_slots_are_noops(rng):
    sched = S.make_linear_schedule()
    ddim = S.make_ddim_params(sched, 50)
    model = _toy_model()
    x, cond, uncond = _setup(rng)
    dts = uniform_timesteps_desc(sched, int(ddim.timesteps[20]), 10)
    out = M.multistep_decode(model, M.make_dpmpp_coeffs(sched, dts),
                             x, cond, uncond)
    outp = M.multistep_decode(
        model, M.make_dpmpp_coeffs(sched, dts, pad_to=20),
        x, cond, uncond)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(outp))


def test_one_executable_serves_both_samplers(rng):
    sched = S.make_linear_schedule()
    ddim = S.make_ddim_params(sched, 50)
    model = _toy_model()
    x, cond, uncond = _setup(rng)

    @jax.jit
    def run(co, x):
        return M.multistep_decode(model, co, x, cond, uncond,
                                  cfg_scale=7.0)

    co_ddim = M.make_ddim_coeffs(ddim, 20)
    dts = uniform_timesteps_desc(sched, int(ddim.timesteps[20]), 10)
    co_dpm = M.make_dpmpp_coeffs(sched, dts, pad_to=20)
    a = run(co_ddim, x)
    b = run(co_dpm, x)
    assert run._cache_size() == 1, (
        "DDIM-20 and padded DPM++-10 coefficients must hit ONE compiled "
        "program — that is the engine's contract")
    assert not np.allclose(np.asarray(a), np.asarray(b))  # different math


def test_dedup_matches_plain_cfg(rng):
    sched = S.make_linear_schedule()
    ddim = S.make_ddim_params(sched, 50)
    model = _toy_model()
    x, cond, uncond = _setup(rng)
    co = M.make_ddim_coeffs(ddim, 8)
    plain = M.multistep_decode(model, co, x, cond, uncond, cfg_scale=7.0)
    dedup = M.multistep_decode(model, co, x, cond, uncond, cfg_scale=7.0,
                               cfg_dedup=True)
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)


def test_bf16_carry_stays_bf16(rng):
    sched = S.make_linear_schedule()
    ddim = S.make_ddim_params(sched, 50)
    model = _toy_model()
    x, cond, uncond = _setup(rng, dtype=jnp.bfloat16)
    dts = uniform_timesteps_desc(sched, int(ddim.timesteps[20]), 10)
    co = M.make_dpmpp_coeffs(sched, dts, pad_to=20)
    out = jax.jit(lambda c, x: M.multistep_decode(model, c, x, cond,
                                                  uncond))(co, x)
    assert out.dtype == jnp.bfloat16


def test_dpmpp10_quality_parity_with_ddim20(rng):
    """The north-star re-scope (BASELINE.md) claims DPM++(2M) at half
    the step count is an equal-quality sampler, not a turbo
    approximation. With the oracle eps-model (exact eps for any x_t),
    both samplers must recover x0; the 10-step second-order solver's
    residual must be in the same band as 20-step DDIM's (DDIM's own
    floor is the alphas_cumprod[0] != 1 terminal residual)."""
    import sd_animation_optical_flow_tpu.diffusion.ddim as D

    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    sched = S.make_linear_schedule()

    def model_fn(x, t, ctx, control=None):
        a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        x0b = jnp.concatenate([x0, x0], 0) if x.shape[0] != x0.shape[0] \
            else x0
        return (x - a * x0b) / s

    ddim = S.make_ddim_params(sched, 50)
    t_enc = 20
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    x_t = D.stochastic_encode(ddim, x0, t_enc, noise)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))

    out_ddim = M.multistep_decode(model_fn, M.make_ddim_coeffs(ddim, t_enc),
                                  x_t, cond, cond, cfg_scale=1.0)
    dts = uniform_timesteps_desc(sched, int(ddim.timesteps[t_enc]), 10)
    out_dpm = M.multistep_decode(
        model_fn, M.make_dpmpp_coeffs(sched, dts, pad_to=t_enc),
        x_t, cond, cond, cfg_scale=1.0)
    err_ddim = float(np.abs(np.asarray(out_ddim) - np.asarray(x0)).mean())
    err_dpm = float(np.abs(np.asarray(out_dpm) - np.asarray(x0)).mean())
    # dpmpp-10's data-prediction output has no terminal-alpha residual:
    # it must be at least as close to the oracle x0 as ddim-20
    assert err_dpm <= err_ddim * 1.05, (err_dpm, err_ddim)
    assert err_dpm < 0.05, err_dpm
