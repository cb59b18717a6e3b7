"""Schedule + DDIM sampler math tests (closed-form and parity checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_animation_optical_flow_tpu.diffusion import ddim as D
from sd_animation_optical_flow_tpu.diffusion import schedule as S


def test_linear_schedule_values():
    sched = S.make_linear_schedule(1000, 0.00085, 0.0120)
    betas = np.asarray(sched.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-5)
    np.testing.assert_allclose(betas[-1], 0.0120, rtol=1e-5)
    ac = np.asarray(sched.alphas_cumprod)
    assert np.all(np.diff(ac) < 0) and 0 < ac[-1] < ac[0] < 1


def test_ddim_uniform_timesteps():
    sched = S.make_linear_schedule()
    ddim = S.make_ddim_params(sched, 50)
    ts = np.asarray(ddim.timesteps)
    # reference: arange(0, 1000, 20) + 1  (util.py:46-58)
    np.testing.assert_array_equal(ts, np.arange(0, 1000, 20) + 1)
    np.testing.assert_allclose(np.asarray(ddim.alphas),
                               np.asarray(sched.alphas_cumprod)[ts])
    np.testing.assert_allclose(np.asarray(ddim.alphas_prev)[0],
                               np.asarray(sched.alphas_cumprod)[0])
    assert np.all(np.asarray(ddim.sigmas) == 0)  # eta = 0


def test_q_sample_consistency(rng):
    sched = S.make_linear_schedule()
    x0 = jax.random.normal(rng, (2, 4, 4, 4))
    noise = jnp.ones_like(x0)
    t = jnp.asarray([0, 999])
    xt = S.q_sample(sched, x0, t, noise)
    a = np.asarray(sched.sqrt_alphas_cumprod)
    s = np.asarray(sched.sqrt_one_minus_alphas_cumprod)
    ref0 = a[0] * np.asarray(x0[0]) + s[0]
    np.testing.assert_allclose(np.asarray(xt[0]), ref0, rtol=1e-5)


def test_v_param_roundtrip(rng):
    sched = S.make_linear_schedule()
    k1, k2 = jax.random.split(rng)
    x0 = jax.random.normal(k1, (1, 4, 4, 4))
    noise = jax.random.normal(k2, (1, 4, 4, 4))
    t = jnp.asarray([500])
    xt = S.q_sample(sched, x0, t, noise)
    v = S.get_v(sched, x0, t, noise)
    eps = S.predict_eps_from_z_and_v(sched, xt, t, v)
    x0_rec = S.predict_start_from_z_and_v(sched, xt, t, v)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


def _oracle_model(x0):
    """A model that knows the true x0 and returns exact eps for any x_t.

    With eps-param DDIM (eta=0), decoding from stochastic_encode(x0, t_enc)
    must then recover x0 exactly — a closed-form check of the whole
    scanned sampler."""
    sched = S.make_linear_schedule()

    def model_fn(x, t, ctx, control=None):
        a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        x0b = jnp.concatenate([x0, x0], axis=0) if x.shape[0] != x0.shape[0] else x0
        return (x - a * x0b) / s

    return sched, model_fn


def test_ddim_decode_recovers_x0_with_oracle(rng):
    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    sched, model_fn = _oracle_model(x0)
    ddim = S.make_ddim_params(sched, 50)
    t_enc = 20
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    x_t = D.stochastic_encode(ddim, x0, t_enc, noise)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    uncond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))

    # NOTE: reference's stochastic_encode indexes alphas at t_enc while the
    # first decode step uses index t_enc-1 (one step less noisy). The
    # oracle still recovers x0 because eps is recomputed per-step from x_t.
    out = D.ddim_decode(model_fn, sched, ddim, x_t, cond, uncond, t_enc,
                        cfg_scale=7.0, rng=rng)
    # DDIM's last step lands at alphas_cumprod[0] ~= 0.99915 (not exactly 1),
    # so a sqrt(1 - 0.99915) ~= 2.9% eps residual remains by construction.
    err = np.abs(np.asarray(out) - np.asarray(x0))
    assert err.max() < 0.15 and err.mean() < 0.03
    # and decoding reduced the distance vs the noised input massively
    assert err.mean() < 0.05 * np.abs(np.asarray(x_t - x0)).mean()


def test_ddim_decode_inpaint_keeps_known_region(rng):
    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    sched, model_fn = _oracle_model(x0)
    ddim = S.make_ddim_params(sched, 50)
    t_enc = 10
    init_latent = x0 * 0.5
    nmask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)  # top half inpainted
    noise = jax.random.normal(jax.random.fold_in(rng, 2), x0.shape)
    x_t = D.stochastic_encode(ddim, init_latent, t_enc, noise)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    out = D.ddim_decode(model_fn, sched, ddim, x_t, cond, cond, t_enc,
                        rng=rng, init_latent=init_latent, nmask=nmask)
    # composite like the facade does (guided_ldm_inpainting.py:337-338)
    final = init_latent * (1 - nmask) + out * nmask
    np.testing.assert_allclose(np.asarray(final[:, 4:]),
                               np.asarray(init_latent[:, 4:]), atol=1e-6)
    # inpainted half was driven toward the oracle's x0
    assert np.abs(np.asarray(final[:, :4] - x0[:, :4])).mean() < \
        np.abs(np.asarray(init_latent[:, :4] - x0[:, :4])).mean()


def test_guidance_blending_pulls_to_target(rng):
    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    sched, model_fn = _oracle_model(x0)
    ddim = S.make_ddim_params(sched, 50)
    t_enc = 20
    target = -x0
    noise = jax.random.normal(jax.random.fold_in(rng, 3), x0.shape)
    x_t = D.stochastic_encode(ddim, x0, t_enc, noise)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    gs = jnp.ones((t_enc, 1, 1, 1, 1))  # full-strength guidance every step
    out = D.ddim_decode(model_fn, sched, ddim, x_t, cond, cond, t_enc,
                        rng=rng, guidance_latent=target,
                        guidance_strength=gs)
    # with strength 1.0 each step pred_x0 == target, so decode lands on
    # target (up to the ~3% alphas_cumprod[0] residual)
    err = np.abs(np.asarray(out) - np.asarray(target))
    assert err.mean() < 0.2
    assert err.mean() < np.abs(np.asarray(out) - np.asarray(x0)).mean()


def test_guidance_progress_matches_reference_formula():
    p = D.guidance_progress(20, 50)
    assert p.shape == (20,)
    np.testing.assert_allclose(p[0], (0 + 30 + 1) / 50)
    np.testing.assert_allclose(p[-1], 1.0)


def test_norm_thresholding_matches_torch_reference():
    """sampling_util parity: norm/spatial thresholding vs a literal torch
    transcription of ldm/models/diffusion/sampling_util.py (NHWC here, so
    the spatial variant reduces the trailing channel axis)."""
    import torch
    from sd_animation_optical_flow_tpu.diffusion import sampling_util as SU

    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 5, 3).astype(np.float32) * 4.0
    value = 1.5

    # torch oracle (b c h w layout)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    s = xt.pow(2).flatten(1).mean(1).sqrt().clamp(min=value)
    s = s[(...,) + (None,) * (xt.ndim - s.ndim)]
    want = (xt * (value / s)).numpy()
    got = np.moveaxis(np.asarray(SU.norm_thresholding(jnp.asarray(x), value)),
                      -1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    s2 = xt.pow(2).mean(1, keepdim=True).sqrt().clamp(min=value)
    want2 = (xt * (value / s2)).numpy()
    got2 = np.moveaxis(
        np.asarray(SU.spatial_norm_thresholding(jnp.asarray(x), value)), -1, 1)
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


def test_ddim_dynamic_threshold_bounds_pred_x0(rng):
    """dynamic_threshold rescales pred_x0 toward RMS<=value each step; with
    an oracle eps=0 model the final latent RMS cannot exceed the threshold
    by more than the dir_xt contribution (here exactly value * sqrt(a0))."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)

    sched = make_linear_schedule(timesteps=100)
    ddim = make_ddim_params(sched, 10)
    x = jax.random.normal(rng, (1, 8, 8, 4)) * 10.0
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    model = lambda x, t, c, control=None: jnp.zeros_like(x)
    out = D.ddim_decode(model, sched, ddim, x, cond, cond, 4,
                        cfg_scale=1.0, dynamic_threshold=0.5)
    rms = float(jnp.sqrt(jnp.mean(out.astype(jnp.float32) ** 2)))
    out_raw = D.ddim_decode(model, sched, ddim, x, cond, cond, 4,
                            cfg_scale=1.0)
    rms_raw = float(jnp.sqrt(jnp.mean(out_raw.astype(jnp.float32) ** 2)))
    assert rms <= 0.5 + 1e-4
    assert rms_raw > rms


def test_ddim_sample_full_chain_shapes_and_mask(rng):
    """ddim_sample runs the full ddim chain from noise; with mask/x0 the
    masked (mask=1) region tracks the re-noised x0 chain (ddim.py:154-157
    polarity: mask 1 = keep known region)."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)

    sched = make_linear_schedule(timesteps=100)
    ddim = make_ddim_params(sched, 8)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    model = lambda x, t, c, control=None: jnp.zeros_like(x)

    out = D.ddim_sample(model, sched, ddim, cond, cond,
                        shape=(1, 8, 8, 4), rng=rng, cfg_scale=1.0)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()

    # eps=0 oracle: pred_x0 = x/sqrt(a_t); the known half (mask=1) is
    # re-imposed from x0 each step, so it ends close to x0 exactly
    x0 = jnp.ones((1, 8, 8, 4))
    mask = jnp.zeros((8, 8, 1)).at[:4].set(1.0)
    out_m = D.ddim_sample(model, sched, ddim, cond, cond,
                          shape=(1, 8, 8, 4), rng=rng, cfg_scale=1.0,
                          mask=mask, x0=x0)
    known = np.asarray(out_m)[0, :4]
    free = np.asarray(out_m)[0, 4:]
    # last step re-imposes q_sample(x0, t_min) then denoises once: the
    # known region must sit far closer to x0 than the free region
    assert abs(known.mean() - 1.0) < abs(free.mean() - 1.0)


def test_ddim_encode_inverts_decode_for_linear_model(rng):
    """DDIM inversion consistency: with the oracle eps model e(x,t)=0 the
    encode recurrence reduces to x * sqrt(a_next/a) telescoping to
    x0 * sqrt(a_last/a_first); check against the closed form."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)

    sched = make_linear_schedule(timesteps=100)
    ddim = make_ddim_params(sched, 10)
    x0 = jax.random.normal(rng, (1, 4, 4, 4))
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    model = lambda x, t, c, control=None: jnp.zeros_like(x)

    got = D.ddim_encode(model, sched, ddim, x0, cond, t_enc=5)
    a = np.asarray(ddim.alphas_prev)
    an = np.asarray(ddim.alphas)
    factor = 1.0
    for i in range(5):
        factor *= np.sqrt(an[i] / a[i])
    np.testing.assert_allclose(np.asarray(got), np.asarray(x0) * factor,
                               rtol=1e-4, atol=1e-5)


def test_ddim_temperature_and_ucg_schedule(rng):
    """temperature scales the stochastic term (eta>0); cfg_schedule
    overrides the scalar CFG scale per step."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)

    sched = make_linear_schedule(timesteps=100)
    ddim = make_ddim_params(sched, 10, eta=1.0)
    x = jax.random.normal(rng, (1, 8, 8, 4))
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    model = lambda x, t, c, control=None: jnp.zeros_like(x)

    cold = D.ddim_decode(model, sched, ddim, x, cond, cond, 4,
                         cfg_scale=1.0, rng=rng, temperature=0.0)
    hot = D.ddim_decode(model, sched, ddim, x, cond, cond, 4,
                        cfg_scale=1.0, rng=rng, temperature=1.0)
    # temperature=0 with eta=1 = deterministic chain; hot differs
    assert not np.allclose(np.asarray(cold), np.asarray(hot))

    # cfg_schedule of all ones == cfg_scale=1 exactly
    a = D.ddim_decode(model, sched, ddim, x, cond, cond, 4,
                      cfg_scale=5.0, rng=rng,
                      cfg_schedule=jnp.ones((4,)))
    b = D.ddim_decode(model, sched, ddim, x, cond, cond, 4,
                      cfg_scale=1.0, rng=rng)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ddim_quantize_denoised_hook(rng):
    """quantize_fn snaps pred_x0 to the VQ codebook each step
    (ddim.py:239-240 quantize_denoised); with an eps=0 oracle and a
    one-vector codebook the final latent collapses onto that vector's
    direction."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)
    from sd_animation_optical_flow_tpu.models import vq as VQ

    sched = make_linear_schedule(timesteps=100)
    ddim = make_ddim_params(sched, 10)
    cfg = VQ.VQConfig(n_embed=1, embed_dim=4)
    qp = {"embedding": jnp.full((1, 4), 0.7, jnp.float32)}
    quant = lambda z: VQ.quantize(qp, cfg, z)[0]

    x = jax.random.normal(rng, (1, 8, 8, 4))
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    model = lambda x, t, c, control=None: jnp.zeros_like(x)
    out = D.ddim_decode(model, sched, ddim, x, cond, cond, 10,
                        cfg_scale=1.0, quantize_fn=quant)
    # last step: x_prev = sqrt(a_prev)*q(pred_x0) + dir; a_prev(index 0)
    # = alphas_cumprod_prev[ts0] ~ 1 and e_t = 0 -> out ~ 0.7 everywhere
    np.testing.assert_allclose(np.asarray(out),
                               np.full((1, 8, 8, 4), 0.7), atol=1e-2)


def test_ddpm_posterior_coefs_match_torch_formulas():
    """Posterior buffers vs a literal numpy transcription of the
    reference's register_schedule (ddpm.py:170-192, v_posterior=0)."""
    from sd_animation_optical_flow_tpu.diffusion import ddpm_sampler as DS
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_linear_schedule)

    sched = make_linear_schedule(timesteps=50)
    pc = DS.posterior_coefs(sched)
    betas = np.asarray(sched.betas, np.float64)
    acp = np.asarray(sched.alphas_cumprod, np.float64)
    acp_prev = np.append(1.0, acp[:-1])
    var = betas * (1.0 - acp_prev) / (1.0 - acp)
    np.testing.assert_allclose(np.asarray(pc.variance), var, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pc.mean_coef1),
                               betas * np.sqrt(acp_prev) / (1 - acp),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pc.mean_coef2),
                               (1 - acp_prev) * np.sqrt(1 - betas) / (1 - acp),
                               rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pc.log_variance_clipped),
        np.log(np.maximum(var, 1e-20)), rtol=1e-4)


def test_ddpm_p_sample_loop_oracle(rng):
    """Ancestral chain with the eps=0 oracle and clip_denoised: each step
    x0-hat = x/sqrt(acp_t) clipped to [-1,1]; the chain stays finite and
    the final sample is bounded by the last-step posterior (t=0 mean =
    x0-hat, no noise)."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion import ddpm_sampler as DS
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_linear_schedule)

    sched = make_linear_schedule(timesteps=20)
    cond = D.CondBundle(crossattn=jnp.zeros((2, 3, 8)))
    model = lambda x, t, c, control=None: jnp.zeros_like(x)
    out = DS.p_sample_loop(model, sched, cond, shape=(2, 8, 8, 4), rng=rng)
    a = np.asarray(out)
    assert a.shape == (2, 8, 8, 4)
    assert np.isfinite(a).all()
    assert np.abs(a).max() <= 1.0 + 1e-5     # t=0 returns clipped x0-hat

    # intermediates contract
    out2, inter = DS.p_sample_loop(model, sched, cond, shape=(1, 8, 8, 4),
                                   rng=rng, return_intermediates=4)
    assert inter.shape == (4, 1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(inter[-1]), np.asarray(out2))


def test_ddpm_p_sample_cfg_batching(rng):
    """CFG path: cfg_scale != 1 doubles the batch through the model; with
    a model returning eps = c*0 the CFG combination collapses to the
    plain path — outputs must match exactly."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion import ddpm_sampler as DS
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_linear_schedule)

    sched = make_linear_schedule(timesteps=10)
    pc = DS.posterior_coefs(sched)
    x = jax.random.normal(rng, (1, 4, 4, 4))
    t = jnp.array([5], jnp.int32)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    model = lambda x, t, c, control=None: jnp.zeros_like(x)
    a = DS.p_sample(model, sched, pc, x, t, cond, cond, rng=rng,
                    cfg_scale=5.0)
    b = DS.p_sample(model, sched, pc, x, t, cond, None, rng=rng,
                    cfg_scale=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cfg_interval_caching(rng):
    """cfg_interval=1 vs >1: with a model whose cond/uncond difference is
    CONSTANT in t, caching the difference is exact — outputs match the
    full CFG path bitwise; with interval covering all steps only one
    full-batch call happens (checked via call counting)."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)

    sched = make_linear_schedule(timesteps=100)
    ddim = make_ddim_params(sched, 10)
    x = jax.random.normal(rng, (1, 8, 8, 4))
    c1 = D.CondBundle(crossattn=jnp.ones((1, 3, 8)))
    c0 = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))

    # eps = per-sample mean(ctx) * 0.1: cond/uncond diff independent of x, t
    def model(xx, tt, cc, control=None):
        m = 0.1 * jnp.mean(cc, axis=(1, 2))          # [B]
        return jnp.zeros_like(xx) + m[:, None, None, None]

    full = D.ddim_decode(model, sched, ddim, x, c1, c0, 6, cfg_scale=4.0,
                         rng=rng)
    cached = D.ddim_decode(model, sched, ddim, x, c1, c0, 6, cfg_scale=4.0,
                           rng=rng, cfg_interval=3)
    np.testing.assert_allclose(np.asarray(full), np.asarray(cached),
                               atol=1e-6)

    # the cached path actually runs half-batch calls between refreshes
    calls = {"full": 0, "half": 0}

    def counting_model(xx, tt, cc, control=None):
        if xx.shape[0] == 2:
            calls["full"] += 1
        else:
            calls["half"] += 1
        return jnp.zeros_like(xx)

    # trace-time counting: run WITHOUT jit by calling step math directly
    # through the public API (scan traces each branch once; we only check
    # both branches exist in the traced program)
    D.ddim_decode(counting_model, sched, ddim, x, c1, c0, 4,
                  cfg_scale=4.0, rng=rng, cfg_interval=2)
    assert calls["full"] >= 1 and calls["half"] >= 1


def test_deepcache_interval_one_matches_plain(rng):
    """deepcache_interval=1 runs the full net every step through the
    deepcache split — outputs must match the plain path exactly (the
    split forward computes the identical function); interval>1 stays
    finite and close for a tiny UNet."""
    import jax.numpy as jnp
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.models.layers import numpy_init

    cfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                       attention_resolutions=(1,), num_heads=2,
                       context_dim=32)
    with numpy_init():
        params = U.unet_init(jax.random.PRNGKey(0), cfg)
    sched = make_linear_schedule(timesteps=50)
    ddim = make_ddim_params(sched, 10)
    b, h, w = 1, 8, 8
    x = jax.random.normal(rng, (b, h, w, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 5, 32))
    cond = D.CondBundle(crossattn=ctx)
    uncond = D.CondBundle(crossattn=jnp.zeros_like(ctx))

    def model(xx, tt, cc, control=None):
        return U.unet_apply(params, cfg, xx, tt, cc)[0]

    def full_fn(xx, tt, cc):
        return U.unet_apply_deepcache(params, cfg, xx, tt, cc,
                                      want_deep_cache=True)

    def cached_fn(xx, tt, cc, deep):
        return U.unet_apply_deepcache(params, cfg, xx, tt, cc,
                                      deep_cache=deep)[0]

    dc0 = jnp.zeros(U.deepcache_feat_shape(cfg, 2 * b, h, w))
    plain = D.ddim_decode(model, sched, ddim, x, cond, uncond, 4,
                          cfg_scale=3.0, rng=rng)
    dc1 = D.ddim_decode(model, sched, ddim, x, cond, uncond, 4,
                        cfg_scale=3.0, rng=rng, deepcache_interval=1,
                        deepcache_fns=(full_fn, cached_fn),
                        deepcache_init=dc0)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(dc1),
                               rtol=2e-5, atol=2e-5)

    dc2 = D.ddim_decode(model, sched, ddim, x, cond, uncond, 4,
                        cfg_scale=3.0, rng=rng, deepcache_interval=2,
                        deepcache_fns=(full_fn, cached_fn),
                        deepcache_init=dc0)
    a2 = np.asarray(dc2)
    assert np.isfinite(a2).all()
    # approximation should stay in the same ballpark as the exact chain
    rel = np.abs(a2 - np.asarray(plain)).mean() / \
        (np.abs(np.asarray(plain)).mean() + 1e-6)
    assert rel < 0.5, rel


def test_dpmpp_bf16_carry_dtype_stable():
    """bf16 regression: the 2M correction mixes f32 log-SNR coefficients
    with the latent; under bf16 inference that promoted the scan carry
    to f32 and broke tracing (found by bench.py's dpmpp secondary
    headline on TPU). The combination must stay in f32 internally but
    return the carry in x.dtype."""
    from sd_animation_optical_flow_tpu.diffusion.dpm_solver import (
        dpmpp_2m_decode, uniform_timesteps_desc)

    sched = S.make_linear_schedule()
    dts = uniform_timesteps_desc(sched, 400, 6)
    x = jnp.ones((2, 4, 4, 3), jnp.bfloat16) * 0.3

    def model(z, ts, ctx, control=None):
        return (z * 0.1).astype(z.dtype)

    cond = D.CondBundle(crossattn=jnp.ones((2, 3, 8), jnp.bfloat16))
    out = dpmpp_2m_decode(model, sched, dts, x, cond, cond,
                          cfg_scale=2.0)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_facade_dpmpp_pinned_steps(rng):
    """sampler="dpmpp:N" pins the solver step count independently of
    the DDIM schedule — the product API for the >=4 f/s north-star
    operating point (10 solver steps at strength 0.4/50)."""
    import jax.numpy as jnp

    import sd_animation_optical_flow_tpu.models.clip as CL
    import sd_animation_optical_flow_tpu.models.unet as U
    import sd_animation_optical_flow_tpu.models.vae as V
    import sd_animation_optical_flow_tpu.pipelines.facades as F
    from sd_animation_optical_flow_tpu.pipelines.tokenizer import \
        PromptTokenizer

    k = jax.random.split(rng, 4)
    vcfg = V.VAEConfig(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1)
    ucfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                        attention_resolutions=(1,), num_heads=2,
                        context_dim=32)
    ccfg = CL.CLIPTextConfig(vocab_size=100, width=32, layers=1, heads=2)
    sd = F.StableDiffusionBundle(
        unet_params=U.unet_init(k[0], ucfg), unet_cfg=ucfg,
        vae_params=V.vae_init(k[1], vcfg), vae_cfg=vcfg,
        clip_params=CL.clip_text_init(k[2], ccfg), clip_cfg=ccfg,
        tokenizer=PromptTokenizer(hf_name_or_path=None))
    img = jax.random.uniform(k[3], (1, 32, 32, 3), jnp.float32) * 2 - 1
    outA, _ = F.img2img(sd, img, "a", "", 0.4, 50, seed=3,
                        sampler="dpmpp:3")
    outB, _ = F.img2img(sd, img, "a", "", 0.4, 50, seed=3,
                        sampler="dpmpp:5")
    assert outA.shape == img.shape
    assert np.isfinite(np.asarray(outA)).all()
    # different solver step counts produce different trajectories
    assert not np.allclose(np.asarray(outA), np.asarray(outB))
