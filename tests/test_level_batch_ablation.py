"""Quality ablation of the level-batch K/V-chain approximation
(VERDICT r2 item 4).

The serial reference-faithful level-0 back-fill chains self-attention
K/V frame-to-frame: each frame injects the K/V of the immediately
preceding generated frame (reference:
ofgen_keyframe_inpaint.py:1210-1228). The batched back-fill
(_backfill_level_batched) instead injects the PREVIOUS CHUNK'S LAST
frame's K/V into every frame of the next chunk — a documented
approximation. This test bounds its output divergence with the same
protocol as tests/test_kv_ablation.py: the approximation must move the
converted frames LESS than disabling the K/V mechanism entirely does,
i.e. chunked chaining preserves the mechanism's effect.
"""

import numpy as np
import jax
import pytest

import dataclasses

from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.pipelines import keyframe_inpaint as KI
from tests.test_kv_ablation import _perturb_zeros
from tests.test_pipeline import _synthetic_frames, _tiny_bundle


@pytest.fixture(scope="module")
def flow_est():
    cfg = FC.FlowConfidenceConfig(
        raft=RF.RAFTConfig(iters=2, corr_levels=2, corr_radius=2))
    return FC.FlowConfidenceEstimator(
        RF.raft_init(jax.random.PRNGKey(0), cfg.raft), cfg)


@pytest.mark.slow
def test_level_batch_kv_chain_divergence(tmp_path, flow_est):
    k1, k2, kp = jax.random.split(jax.random.PRNGKey(11), 3)
    sd = _tiny_bundle(k1)
    sd9 = _tiny_bundle(k2, in_channels=9)
    # zero-init output convs hide the attention path on random weights
    # (see test_kv_ablation._perturb_zeros) — perturb so K/V injection
    # has a measurable effect
    sd9 = dataclasses.replace(
        sd9, unet_params=_perturb_zeros(sd9.unet_params, kp))
    frames = _synthetic_frames(7, 64, 64)

    def run(tag, level_batch, use_kv=True):
        ws = KI.VideoWorkspace(str(tmp_path / f"ws_{tag}"), frames=frames,
                               size=(64, 64), keep_every=1)
        cfg = KI.KeyframeInpaintConfig(
            size=(64, 64), keep_every=1, kernel_size=7, stride=7,
            dilation=1, n_seed_frames=1, num_ref_for_generation=1,
            denoising_strength=0.3, ddim_steps=6,
            mode="warp_and_inpaint_crossattn", level_batch=level_batch,
            use_reference_kv=use_kv)
        KI.run(ws, sd, sd9, flow_est, tagger=None, cfg=cfg)
        return np.stack([ws.get_ai_frame(i).astype(np.float32)
                         for i in range(ws.num_frames)])

    serial = run("serial", 1)
    batched = run("batched", 3)       # 6 back-fill frames -> 2 chunks
    nokv = run("nokv", 1, use_kv=False)

    d_chain = float(np.abs(serial - batched).mean())
    d_kv = float(np.abs(serial - nokv).mean())
    print(f"level-batch ablation (u8 scale): chunked-chain divergence "
          f"{d_chain:.3f} vs no-KV divergence {d_kv:.3f}")
    # The mechanism must matter at all for the bound to be meaningful
    # (tiny perturbed-random models move ~0.1 u8 levels; measured 0.095)
    assert d_kv > 0.03, d_kv
    # and the chunked chain must preserve most of the mechanism's
    # effect: its divergence stays well under the no-KV ablation
    # (measured 0.017 vs 0.095 — 5.6x smaller)
    assert d_chain < 0.5 * d_kv, (d_chain, d_kv)
