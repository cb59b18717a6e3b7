"""Warp-as-guidance (ofgen) pipeline test."""

import os

import jax
import numpy as np

from sd_animation_optical_flow_tpu.pipelines import ofgen as OF
from tests.test_pipeline import _synthetic_frames, _tiny_bundle


def test_ofgen_run(tmp_path):
    sd = _tiny_bundle(jax.random.PRNGKey(21))
    frames = list(_synthetic_frames(4, 64, 64))

    def flow_calc(prev, cur):
        # synthetic 1px-right forward flow
        f = np.zeros(prev.shape[:2] + (2,), np.float32)
        f[..., 0] = 1.0
        return f

    cfg = OF.OfgenConfig(denoising_strength=0.3, ddim_steps=6)
    out_dir = OF.run(frames, str(tmp_path / "of"), sd, flow_calc, None, cfg)
    files = sorted(os.listdir(out_dir))
    assert sum(f.startswith("converted_") for f in files) == 4
    assert sum(f.startswith("raw_") for f in files) == 4
    # wrapped_ written for every frame after the first
    assert sum(f.startswith("wrapped_") for f in files) == 3


def test_guidance_schedule_weights():
    dist = np.zeros((8, 8), np.float32)
    dist[0, 0] = 5.0
    cfg = OF.OfgenConfig()
    sched = OF.make_guidance_schedule(dist, cfg)
    early = sched(0.5)
    late = sched(0.9)
    assert early[1, 1] == cfg.weight_early
    assert late[1, 1] == cfg.weight_late
    assert early[0, 0] == cfg.weight_moving   # fast-moving pixel
