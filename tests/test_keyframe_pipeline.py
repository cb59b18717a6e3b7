"""Hierarchical keyframe pipeline component + end-to-end tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.pipelines import keyframe_inpaint as KI
from tests.test_pipeline import _synthetic_frames, _tiny_bundle


@pytest.fixture(scope="module")
def flow_est():
    cfg = FC.FlowConfidenceConfig(
        raft=RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2))
    return FC.FlowConfidenceEstimator(
        RF.raft_init(jax.random.PRNGKey(0), cfg.raft), cfg)


def test_frame_indices_ops():
    fi = KI.FrameIndices([5, 1, 3, 3])
    assert fi.indices == [1, 3, 5]
    fi.add(7)
    fi.add(KI.FrameIndices([2]))
    assert fi.indices == [1, 2, 3, 5, 7]
    fi.remove(KI.FrameIndices([3, 7]))
    assert fi.indices == [1, 2, 5]

    windows = list(KI.FrameIndices(range(10)).conv_indices(4, 2, 2))
    assert windows[0].indices == [0, 2]       # kernel 4, dilation 2
    assert windows[1].indices == [2, 4]

    adj = KI.FrameIndices([0, 10, 20, 30]).adjacent_frames(11, 2)
    assert adj.indices == [10, 20]


def test_video_workspace_roundtrip(tmp_path):
    frames = _synthetic_frames(6, 64, 64)
    ws = KI.VideoWorkspace(str(tmp_path / "ws"), frames=frames,
                           size=(64, 64), keep_every=2)
    assert ws.num_frames == 3
    raw = ws.get_raw_frame(1)
    assert raw.shape == (64, 64, 3)
    assert ws.get_ai_frame(1) is None and not ws.generated(1)
    ws.put_ai_frame(1, raw)
    assert ws.generated(1)
    np.testing.assert_array_equal(ws.get_ai_frame(1), raw)

    kv = ((jnp.ones((1, 8, 4)), jnp.zeros((1, 8, 4))),
          (jnp.ones((1, 2, 6)) * 2, jnp.ones((1, 2, 6))))
    ws.put_kv(1, kv)
    kv2 = ws.get_kv(1)
    assert len(kv2) == 2
    np.testing.assert_allclose(np.asarray(kv2[1][0]), 2.0)
    ws.remove_kv(1)
    assert ws.get_kv(1) is None

    # resume: re-opening with no frames picks up the extracted set
    ws2 = KI.VideoWorkspace(str(tmp_path / "ws"), size=(64, 64))
    assert ws2.num_frames == 3


def test_flow_cache_and_pairwise(tmp_path, flow_est):
    frames = _synthetic_frames(4, 32, 32)
    ws = KI.VideoWorkspace(str(tmp_path / "ws"), frames=frames,
                           size=(32, 32), keep_every=1)
    fc = KI.FlowCache(flow_est, str(tmp_path / "ws"), batch_size=4)
    idx = KI.FrameIndices([0, 1, 2])
    mat = fc.calculate_pairwise(ws, idx)
    assert mat.shape == (3, 3, 32, 32, 3)
    # diagonal: zero flow, confidence 1
    np.testing.assert_allclose(mat[1, 1, :, :, :2], 0.0)
    np.testing.assert_allclose(mat[1, 1, :, :, 2], 1.0)
    assert len(fc.cached_pair) == 6
    # cache hit path: same call reuses npy files
    mat2 = fc.calculate_pairwise(ws, idx)
    np.testing.assert_allclose(mat, mat2)
    m21 = fc.calculate_multiple_to_one(ws, idx, 1)
    assert m21.shape == (3, 1, 32, 32, 3)
    np.testing.assert_allclose(m21[1, 0], mat[1, 1])
    fc.purge()
    assert len(fc.cached_pair) == 0


def test_flow_cache_bidir_dedup(tmp_path, flow_est):
    """The pairwise phase runs ONE RAFT program per unordered pair and
    the stored entries match the directed single-pair results."""
    calls = []

    class Counting:
        def calc_batch_bidir_f16(self, src, tgt):
            calls.append(len(src))
            return flow_est.calc_batch_bidir_f16(src, tgt)

    frames = _synthetic_frames(3, 32, 32)
    ws = KI.VideoWorkspace(str(tmp_path / "ws"), frames=frames,
                           size=(32, 32), keep_every=1)
    fc = KI.FlowCache(Counting(), str(tmp_path / "ws"), batch_size=8)
    idx = KI.FrameIndices([0, 1, 2])
    mat = fc.calculate_pairwise(ws, idx)
    # 6 directed pairs -> 3 unordered -> one batch of 3 pairs
    assert sum(calls) == 3
    assert len(fc.cached_pair) == 6
    for i, s in enumerate(idx):
        for j, t in enumerate(idx):
            if s == t:
                continue
            ref_f, ref_c, _ = flow_est.calc(
                ws.get_raw_frame(s)[..., ::-1].astype(np.float32),
                ws.get_raw_frame(t)[..., ::-1].astype(np.float32))
            # batch-1 vs batch-3 programs tile differently: low-bit
            # drift only (the same-batch bidir parity test pins atol=0)
            np.testing.assert_allclose(mat[i, j, :, :, :2], ref_f,
                                       atol=2e-3)
            np.testing.assert_allclose(mat[i, j, :, :, 2], ref_c,
                                       atol=2e-3)


def test_keyframe_conv_selects_best_connected(tmp_path, flow_est):
    frames = _synthetic_frames(6, 32, 32)
    ws = KI.VideoWorkspace(str(tmp_path / "ws"), frames=frames,
                           size=(32, 32), keep_every=1)
    fc = KI.FlowCache(flow_est, str(tmp_path / "ws"), batch_size=8)
    out = KI.keyframe_conv(fc, str(tmp_path / "d01"), ws,
                           KI.FrameIndices(range(6)), kernel_size=3,
                           stride=3, dilation=1)
    assert 1 <= len(out) <= 2
    # resumable: second call reads the saved selections
    out2 = KI.keyframe_conv(fc, str(tmp_path / "d01"), ws,
                            KI.FrameIndices(range(6)), 3, 3, 1)
    assert out.indices == out2.indices


def test_greedy_warp_merge(tmp_path):
    frames = _synthetic_frames(3, 32, 32)
    ws = KI.VideoWorkspace(str(tmp_path / "ws"), frames=frames,
                           size=(32, 32), keep_every=1)
    ws.put_ai_frame(0, np.full((32, 32, 3), 100, np.uint8))
    ws.put_ai_frame(2, np.full((32, 32, 3), 200, np.uint8))
    refs = KI.FrameIndices([0, 2])
    flow_mat = np.zeros((2, 1, 32, 32, 3), np.float32)
    flow_mat[0, 0, :, :, 2] = 0.9         # ref 0 confident everywhere...
    flow_mat[1, 0, :16, :, 2] = 1.0       # ref 2 only on the top half
    flow_mat[0, 0, :16, :, 2] = 0.2       # ...except the top half
    merged, mask = KI.greedy_warp_merge(ws, refs, flow_mat, thres=0.5)
    # ref 0 (more confident mass) is picked first and fills the bottom;
    # ref 2 then covers the remaining top half; covered regions are
    # subtracted so the first pick wins overlaps (:1021-1023)
    assert (merged[16:] == 100).all()
    assert (merged[:16] == 200).all()
    assert (mask == 255).all()


def test_fused_prep_matches_host_path(tmp_path, flow_est):
    """_fused_prep_impl (one program: flow+warp+merge+morphology) must
    reproduce the staged host path — greedy_warp_merge over
    calc_batch flow + the ellipse-7 dilate — given the same f32 flow
    fields; padded duplicate references must be no-ops."""
    rng = np.random.default_rng(3)
    frames = np.ascontiguousarray(
        rng.integers(0, 255, (3, 40, 48, 3), np.uint8))
    ws = KI.VideoWorkspace(str(tmp_path / "ws"), frames=frames,
                           size=(48, 40), keep_every=1)   # cv2 (W, H)
    ai0 = np.ascontiguousarray(rng.integers(0, 255, (40, 48, 3), np.uint8))
    ai2 = np.ascontiguousarray(rng.integers(0, 255, (40, 48, 3), np.uint8))
    ws.put_ai_frame(0, ai0)
    ws.put_ai_frame(2, ai2)
    refs, idx = [0, 2], 1

    # host path, fed the estimator's f32 flow (the production host path
    # reads the same fields through an f16 cache; f32-vs-f16 only moves
    # pixels sitting exactly on the threshold)
    src = np.stack([frames[s][..., ::-1] for s in refs])
    tgt = np.stack([frames[idx][..., ::-1]] * 2)
    flow, conf, _ = flow_est.calc_batch(src, tgt)
    flow_mat = np.concatenate([flow, conf[..., None]], -1)[:, None]
    merged_h, covered_h = KI.greedy_warp_merge(
        ws, KI.FrameIndices(refs), flow_mat, thres=0.5)
    from sd_animation_optical_flow_tpu.ops.filters import (dilate,
                                                           ellipse_kernel)
    mask2_h = np.asarray(dilate(jnp.asarray(255 - covered_h),
                                ellipse_kernel(7))).astype(np.uint8)

    # exact parity of the merge/morphology half, driven with the SAME
    # flow fields — incl. padded duplicate references (must be no-ops)
    ai = np.stack([ai0, ai2])
    for pad in (0, 2):
        flow_p = np.concatenate([flow] + [flow[1:]] * pad, 0)
        conf_p = np.concatenate([conf] + [conf[1:]] * pad, 0)
        ai_p = np.concatenate([ai] + [ai[1:]] * pad, 0)
        merged, covered, mask2, img_m, ref_m = KI._warp_merge_morph(
            jnp.asarray(flow_p), jnp.asarray(conf_p), jnp.asarray(ai_p),
            jnp.asarray(frames[idx]), thres=0.5, expand="dilate")
        np.testing.assert_array_equal(np.asarray(merged), merged_h)
        np.testing.assert_array_equal(np.asarray(covered), covered_h)
        np.testing.assert_array_equal(np.asarray(mask2), mask2_h)
        # model-space outputs match the host conversions
        np.testing.assert_allclose(
            np.asarray(img_m),
            np.asarray(KI.bgr_u8_to_model(merged_h)[0]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ref_m),
            np.asarray(KI.bgr_u8_to_model(frames[idx])[0]), atol=1e-6)

    # the full one-program path: the inlined RAFT may differ from the
    # standalone calc_batch program in float association, so allow a
    # small drift but require near-total agreement
    merged, covered, mask2, _, _ = KI.fused_flow_warp_merge(
        flow_est, ws, refs, idx, thres=0.5, expand="dilate", n_pad=3)
    diff = np.abs(np.asarray(merged).astype(np.int16)
                  - merged_h.astype(np.int16))
    assert np.mean(diff <= 4) > 0.99, np.mean(diff <= 4)
    assert np.mean(np.asarray(covered) == covered_h) > 0.99
    # expand="none" returns the raw uncovered mask for host Laplacian
    # expansion (crossattn mode)
    _, covered, mask2, _, _ = KI.fused_flow_warp_merge(
        flow_est, ws, refs, idx, thres=0.5, expand="none")
    np.testing.assert_array_equal(np.asarray(mask2),
                                  255 - np.asarray(covered))


def test_expand_mask_adds_edges():
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255                      # strong vertical edge
    mask = np.zeros((32, 32), np.uint8)
    out = KI.expand_mask(mask, img)
    assert out[16, 16] == 255              # edge region added
    assert out[16, 2] == 0                 # flat region untouched


def test_concat_ref_kv():
    kv1 = ((jnp.ones((1, 4, 8)), jnp.ones((1, 4, 8))),)
    kv2 = ((jnp.zeros((1, 6, 8)), jnp.zeros((1, 6, 8))),)
    out = KI.concat_ref_kv([kv1, kv2, None])
    assert out[0][0].shape == (1, 10, 8)
    assert KI.concat_ref_kv([None]) is None


def test_keyframe_pipeline_end_to_end(tmp_path, flow_est):
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    sd = _tiny_bundle(k1)
    sd9 = _tiny_bundle(k2, in_channels=9)
    frames = _synthetic_frames(6, 64, 64)
    ws = KI.VideoWorkspace(str(tmp_path / "ws"), frames=frames,
                           size=(64, 64), keep_every=1)
    cfg = KI.KeyframeInpaintConfig(
        size=(64, 64), keep_every=1, kernel_size=3, stride=3, dilation=1,
        n_seed_frames=2, num_ref_for_generation=1,
        denoising_strength=0.3, ddim_steps=8)
    KI.run(ws, sd, sd9, flow_est, tagger=None, cfg=cfg)
    for i in range(ws.num_frames):
        assert ws.generated(i), f"frame {i} not generated"
        assert ws.get_ai_frame(i).shape == (64, 64, 3)


def test_level_batched_backfill_matches_serial(tmp_path, flow_est):
    """level_batch>1 must reproduce the serial back-fill (same refs,
    same tiled noise) in warp_and_inpaint mode, where no K/V chaining
    applies (the crossattn level-0 chain is per-chunk by design)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    sd = _tiny_bundle(k1)
    sd9 = _tiny_bundle(k2, in_channels=9)
    frames = _synthetic_frames(5, 64, 64)

    outs = {}
    for tag, lb in (("serial", 1), ("batched", 4)):
        ws = KI.VideoWorkspace(str(tmp_path / f"ws_{tag}"),
                               frames=frames, size=(64, 64), keep_every=1)
        cfg = KI.KeyframeInpaintConfig(
            size=(64, 64), keep_every=1, kernel_size=5, stride=5,
            dilation=1, n_seed_frames=1, num_ref_for_generation=1,
            denoising_strength=0.3, ddim_steps=6, mode="warp_and_inpaint",
            level_batch=lb)
        KI.run(ws, sd, sd9, flow_est, tagger=None, cfg=cfg)
        outs[tag] = [ws.get_ai_frame(i) for i in range(ws.num_frames)]

    for i, (a, b) in enumerate(zip(outs["serial"], outs["batched"])):
        assert a is not None and b is not None
        # identical programs modulo batching; accumulation order in the
        # batched matmuls allows tiny drift -> 1-LSB uint8 tolerance
        close = np.mean(np.abs(a.astype(np.int16) - b.astype(np.int16)) <= 1)
        assert close > 0.99, f"frame {i}: {close}"


def test_level_batched_crossattn_completes(tmp_path, flow_est):
    """crossattn + level_batch: per-frame reference K/V batches through
    one program; per-chunk level-0 chaining stores/cleans K/V like the
    serial loop."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    sd = _tiny_bundle(k1)
    sd9 = _tiny_bundle(k2, in_channels=9)
    frames = _synthetic_frames(6, 64, 64)
    ws = KI.VideoWorkspace(str(tmp_path / "ws_ca"), frames=frames,
                           size=(64, 64), keep_every=1)
    cfg = KI.KeyframeInpaintConfig(
        size=(64, 64), keep_every=1, kernel_size=6, stride=6, dilation=1,
        n_seed_frames=1, num_ref_for_generation=1,
        denoising_strength=0.3, ddim_steps=6,
        mode="warp_and_inpaint_crossattn", level_batch=3)
    KI.run(ws, sd, sd9, flow_est, tagger=None, cfg=cfg)
    for i in range(ws.num_frames):
        assert ws.generated(i), f"frame {i} not generated"


def test_batch_per_frame_ref_kv_matches_sequential():
    """img2img_inpaint_batch with per-frame reference_kv (batch dim B)
    must match B sequential img2img_inpaint calls each injecting its own
    frame's K/V."""
    from sd_animation_optical_flow_tpu.pipelines import facades as F
    sd = _tiny_bundle(jax.random.PRNGKey(9), in_channels=9)
    rng = np.random.default_rng(3)
    B, H, W = 2, 32, 32
    imgs = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    refs = rng.uniform(-1, 1, (B, H, W, 3)).astype(np.float32)
    masks = (rng.uniform(size=(B, H, W)) > 0.6).astype(np.float32)
    prompts = ["a", "b"]

    # capture per-frame KV from a first pass, then inject per-frame
    _, kv = F.img2img_inpaint_batch(
        sd, imgs, prompts, "", masks, refs, denoising_strength=0.4,
        ddim_steps=5, mask_blur=4, capture_kv=True)
    kv_frames = F.split_kv_batch(kv, B)
    assert kv[0][0].shape[0] == B and kv_frames[0][0][0].shape[0] == 1

    stacked = tuple(
        (jnp.concatenate([kv_frames[i][l][0] for i in range(B)], axis=0),
         jnp.concatenate([kv_frames[i][l][1] for i in range(B)], axis=0))
        for l in range(len(kv)))
    out_b = F.img2img_inpaint_batch(
        sd, imgs, prompts, "", masks, refs, denoising_strength=0.4,
        ddim_steps=5, mask_blur=4, reference_kv=stacked)

    for i in range(B):
        out_i, _, _, _ = F.img2img_inpaint(
            sd, imgs[i:i + 1], prompts[i], "", denoising_strength=0.4,
            ddim_steps=5, reference_img=refs[i:i + 1], mask=masks[i],
            mask_blur=4, reference_kv=kv_frames[i],
            want_init_decoded=False)
        np.testing.assert_allclose(np.asarray(out_b[i]),
                                   np.asarray(out_i[0]), atol=2e-2)
