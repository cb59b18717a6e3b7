"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding (pjit/shard_map over a Mesh) is exercised without TPU pods —
the standard JAX pattern (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: this environment force-registers an 'axon' TPU platform that wins
# over the JAX_PLATFORMS env var; the config update below is the override
# that actually sticks.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

# If a persistent compile cache is enabled via env (e.g. someone exports
# JAX_COMPILATION_CACHE_DIR to speed repeated runs), veto CPU entries:
# foreign-host CPU AOT executables can SIGILL on deserialization — one
# killed a full quick-tier run (see utils/compile_cache.py).
from sd_animation_optical_flow_tpu.utils.compile_cache import \
    install_tpu_only_guard  # noqa: E402

install_tpu_only_guard()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Compile-heavy tests (measured >8s wall on CPU, pipeline scans / big
# models). `pytest -m "not slow"` is the quick tier (10-15 min on a stock
# CPU host — XLA compiles dominate and scale with core count); the full
# suite stays the default.
_SLOW_TESTS = {
    "test_keyframe_pipeline_end_to_end", "test_raft_small_shapes",
    "test_train_step_with_concat", "test_flow_train_step_learns",
    "test_log_images_panel_dict", "test_ofgen_run",
    "test_unet_class_conditioning_changes_output",
    "test_p_losses_hybrid_and_adm",
    "test_sharded_train_step_runs_and_reduces_loss",
    "test_img2img_dpmpp_sampler", "test_pixel_inpaint_pipeline_end_to_end",
    "test_img2img_deepcache_knob", "test_run_batched_matches_run",
    "test_deepcache_interval_one_matches_plain",
    "test_facade_with_controlnet", "test_raft_apply_shapes",
    "test_img2img_inpaint_batch_matches_sequential",
    "test_img2img_shape_and_determinism",
    "test_dpt_depth_shapes_and_nonneg", "test_npz_roundtrip_unet",
    "test_txt2img_and_inversion", "test_upscale_end_to_end",
    "test_img2img_pixel_space_guidance",
    "test_hed_network_and_port_roundtrip",
    "test_sharded_unet_forward_matches_single",
    "test_img2img_inpaint_contract", "test_controlnet_residual_shapes",
    "test_depth2img_end_to_end", "test_img2img_latent_inpaint",
    "test_upscale_fixed_noise_level_deterministic",
    "test_flow_confidence_estimator_api", "test_unet_port_and_parity",
    "test_cli_port_writes_pytrees", "test_flow_cache_and_pairwise",
    "test_dpt_nonsquare_pos_embed", "test_raft_all_iters_shapes",
    "test_vq_roundtrip_shapes", "test_raft_alternate_corr_path",
    "test_img2img_with_guidance",
    "test_alt_correlation_matches_pyramid_lookup",
    "test_unet_strip_matches_materialized_biases",
    "test_strip_generation_modes_use_mfr",
    "test_strip_sp_denoise_matches_single",
    "test_level_batched_backfill_matches_serial",
    "test_level_batched_crossattn_completes",
    "test_bidir_pairwise_applies_learned_head",
    "test_pretrain_loop_runs", "test_shipped_uncertainty_artifacts",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
