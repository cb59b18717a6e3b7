"""RAFT / correlation / flow-confidence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.ops import correlation as C


def test_all_pairs_correlation_values(np_rng):
    f1 = np_rng.standard_normal((1, 3, 4, 8)).astype(np.float32)
    f2 = np_rng.standard_normal((1, 3, 4, 8)).astype(np.float32)
    corr = C.all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2))
    assert corr.shape == (1, 3, 4, 3, 4)
    ref = np.einsum("hwd,uvd->hwuv", f1[0], f2[0]) / np.sqrt(8)
    np.testing.assert_allclose(np.asarray(corr[0]), ref, rtol=1e-4,
                               atol=1e-6)


def test_lookup_at_integer_coords(np_rng):
    f1 = np_rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
    f2 = np_rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
    pyr = C.build_pyramid(C.all_pairs_correlation(jnp.asarray(f1),
                                                  jnp.asarray(f2)), 2)
    coords = RF.coords_grid(1, 4, 4)
    out = C.lookup_pyramid(pyr, coords, radius=1)
    assert out.shape == (1, 4, 4, 2 * 9)
    # center tap of level 0 (dy=0, dx=0 is channel 4 of the first 9)
    ref = np.einsum("hwd,hwd->hw", f1[0], f2[0]) / np.sqrt(8)
    np.testing.assert_allclose(np.asarray(out[0, :, :, 4]), ref, rtol=1e-4)


def test_alt_correlation_matches_pyramid_lookup(np_rng):
    f1 = np_rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    f2 = np_rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    f1j, f2j = jnp.asarray(f1), jnp.asarray(f2)
    coords = RF.coords_grid(1, 8, 8) + 0.3  # fractional offsets
    radius = 2

    pyr = C.build_pyramid(C.all_pairs_correlation(f1j, f2j), 2)
    via_volume = C.lookup_pyramid(pyr, coords, radius)

    f2_pyr = C.fmap_pyramid(f2j, 2)
    on_the_fly = C.alt_correlation_xla(f1j, f2_pyr, coords, radius)

    # level 0 must agree exactly (no pooling involved); both compute
    # <f1[p], bilerp(f2, coords+off)>/sqrt(D) — the alt_cuda_corr contract
    np.testing.assert_allclose(np.asarray(on_the_fly[..., :25]),
                               np.asarray(via_volume[..., :25]),
                               rtol=1e-4, atol=1e-4)


def test_convex_upsample_with_peaked_mask(np_rng):
    flow = np_rng.standard_normal((1, 2, 3, 2)).astype(np.float32)
    # mask peaked on the center neighbor (k=4) for all 8x8 positions
    mask = np.full((1, 2, 3, 9, 8, 8), -100.0, np.float32)
    mask[:, :, :, 4] = 100.0
    up = RF.upsample_flow_convex(jnp.asarray(flow),
                                 jnp.asarray(mask.reshape(1, 2, 3, 576)))
    assert up.shape == (1, 16, 24, 2)
    # each 8x8 block equals 8*flow of its cell
    np.testing.assert_allclose(np.asarray(up[0, 0:8, 0:8]),
                               np.broadcast_to(8 * flow[0, 0, 0], (8, 8, 2)),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(up[0, 8:16, 16:24]),
                               np.broadcast_to(8 * flow[0, 1, 2], (8, 8, 2)),
                               rtol=1e-4)


def test_raft_apply_shapes(rng):
    cfg = RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2)
    params = RF.raft_init(rng, cfg)
    img = jax.random.uniform(rng, (1, 32, 48, 3)) * 255
    flow_low, flow_up = RF.raft_apply(params, cfg, img, img)
    assert flow_low.shape == (1, 4, 6, 2)
    assert flow_up.shape == (1, 32, 48, 2)
    assert bool(jnp.isfinite(flow_up).all())


def test_raft_alternate_corr_path(rng):
    cfg = RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2,
                        alternate_corr=True)
    params = RF.raft_init(rng, cfg)
    img = jax.random.uniform(rng, (1, 32, 32, 3)) * 255
    _, flow_up = RF.raft_apply(params, cfg, img, img)
    assert flow_up.shape == (1, 32, 32, 2)

    # both corr paths agree on the final flow
    cfg2 = RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2)
    _, flow_up2 = RF.raft_apply(params, cfg2, img, img)
    np.testing.assert_allclose(np.asarray(flow_up), np.asarray(flow_up2),
                               rtol=1e-3, atol=1e-4)


def test_fb_confidence_consistent_flows():
    h, w = 16, 16
    fwd = jnp.full((h, w, 2), 2.0)      # uniform shift
    bwd = -fwd
    conf, log_conf = FC.fb_confidence(fwd, bwd, sigma=1.0, alpha=0.01)
    inner = np.asarray(conf)[:-2, :-2]  # in-bounds region
    np.testing.assert_allclose(inner, 1.0, atol=1e-5)
    assert np.all(np.asarray(log_conf) <= 0)


def test_fb_confidence_inconsistent_is_low():
    h, w = 16, 16
    fwd = jnp.full((h, w, 2), 2.0)
    bwd = jnp.full((h, w, 2), 2.0)      # wrong sign -> 4px roundtrip error
    conf, _ = FC.fb_confidence(fwd, bwd, sigma=1.0, alpha=0.01)
    assert float(conf[:-2, :-2].max()) < 0.05


def test_fb_confidence_out_of_bounds_zero():
    fwd = jnp.full((8, 8, 2), 100.0)
    bwd = -fwd
    conf, _ = FC.fb_confidence(fwd, bwd, sigma=1.0, alpha=0.01)
    np.testing.assert_allclose(np.asarray(conf), 0.0, atol=1e-30)


def test_flow_confidence_estimator_api(rng):
    cfg = FC.FlowConfidenceConfig(raft=RF.RAFTConfig(iters=2, corr_levels=2,
                                                     corr_radius=2))
    params = RF.raft_init(rng, cfg.raft)
    est = FC.FlowConfidenceEstimator(params, cfg)
    src = np.random.default_rng(0).uniform(0, 255, (30, 42, 3))
    tgt = np.roll(src, 2, axis=1)
    flow, conf, log_conf = est.calc(src, tgt)     # unpadded odd sizes OK
    assert flow.shape == (30, 42, 2)
    assert conf.shape == (30, 42)
    assert np.all((conf >= 0) & (conf <= 1))
    inb = log_conf > -100  # out-of-bounds pixels carry the -1e4 sentinel
    np.testing.assert_allclose(np.log(conf + 1e-30)[inb], log_conf[inb],
                               atol=1e-3)

    bflow, bconf, _ = est.calc_batch(np.stack([src, src]),
                                     np.stack([tgt, tgt]))
    assert bflow.shape == (2, 30, 42, 2)
    np.testing.assert_allclose(bflow[0], bflow[1], atol=1e-5)


def test_calc_batch_bidir_matches_directed(rng):
    """One bidir program matches the two directed calc_batch calls (the
    encoders are per-image, so batch composition cannot change values;
    equality is CPU-bit-exact, but the extra outputs can shift XLA
    fusion on TPU and drift low f16 bits, so compare with a small
    tolerance rather than atol=0)."""
    cfg = FC.FlowConfidenceConfig(raft=RF.RAFTConfig(iters=2, corr_levels=2,
                                                     corr_radius=2))
    params = RF.raft_init(rng, cfg.raft)
    est = FC.FlowConfidenceEstimator(params, cfg)
    g = np.random.default_rng(1)
    src = g.uniform(0, 255, (2, 32, 40, 3))
    tgt = np.roll(src, 3, axis=2)

    f_st, c_st, f_ts, c_ts = est.calc_batch_bidir_f16(src, tgt)
    assert f_st.shape == (2, 32, 40, 2) and f_ts.shape == (2, 32, 40, 2)
    d_st_f, d_st_c, _ = est.calc_batch(src, tgt)
    d_ts_f, d_ts_c, _ = est.calc_batch(tgt, src)
    np.testing.assert_allclose(f_st, d_st_f.astype(np.float16),
                               rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(c_st, d_st_c.astype(np.float16),
                               rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(f_ts, d_ts_f.astype(np.float16),
                               rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(c_ts, d_ts_c.astype(np.float16),
                               rtol=2e-2, atol=1e-2)


def test_raft_bf16_corr_pyramid_close_to_f32(rng):
    """bf16 corr-pyramid storage (the CLI default: halves the flow
    program's HBM so flow_batch 8 fits on one v5e next to the resident
    SD bundle — DECISIONS.md flow-ceiling probe) must not move the
    refined flow materially: the pyramid feeds the GRU through a
    bilinear lookup, so ~3 decimal digits of corr precision suffice."""
    cfg32 = RF.RAFTConfig(iters=4, corr_levels=2, corr_radius=2)
    cfg16 = RF.RAFTConfig(iters=4, corr_levels=2, corr_radius=2,
                          corr_dtype="bfloat16")
    params = RF.raft_init(rng, cfg32)
    k1, k2 = jax.random.split(rng)
    img1 = jax.random.uniform(k1, (1, 32, 48, 3)) * 255
    img2 = jnp.roll(img1, 2, axis=2)
    _, f32_up = RF.raft_apply(params, cfg32, img1, img2)
    _, bf_up = RF.raft_apply(params, cfg16, img1, img2)
    err = float(jnp.abs(f32_up - bf_up).max())
    span = float(jnp.abs(f32_up).max())
    assert err <= 0.05 * max(span, 1.0), (err, span)


def test_forward_interpolate_identity_for_zero_flow():
    from sd_animation_optical_flow_tpu.models.raft import forward_interpolate
    flow = np.zeros((8, 10, 2), np.float32)
    flow[2:6, 2:8] = 0.0
    out = forward_interpolate(flow)
    np.testing.assert_allclose(out, flow, atol=1e-6)


def test_forward_interpolate_constant_shift():
    from sd_animation_optical_flow_tpu.models.raft import forward_interpolate
    flow = np.ones((12, 16, 2), np.float32) * 2.0
    out = forward_interpolate(flow)
    # constant flow scattered forward and re-gridded stays constant
    np.testing.assert_allclose(out, flow, atol=1e-5)
    assert out.dtype == np.float32
