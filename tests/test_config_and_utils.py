"""Config system, CLI surface, DPM-Solver, flow viz/IO, profiling."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu import config as C
from sd_animation_optical_flow_tpu.diffusion import ddim as D
from sd_animation_optical_flow_tpu.diffusion import dpm_solver as DS
from sd_animation_optical_flow_tpu.diffusion.schedule import (
    make_ddim_params, make_linear_schedule)
from sd_animation_optical_flow_tpu.utils import flow_io as FIO
from sd_animation_optical_flow_tpu.utils import flow_viz as FV
from sd_animation_optical_flow_tpu.utils.profiling import StageTimer


def test_builtin_specs():
    assert C.SD15.unet.in_channels == 4
    assert C.SD15_INPAINT9.unet.in_channels == 9
    assert C.SD15_INPAINT9.conditioning_key == "hybrid"


def test_load_native_yaml():
    spec = C.load_spec(os.path.join(os.path.dirname(C.__file__), "..",
                                    "configs", "sd15.yaml"))
    assert spec.unet.model_channels == 320
    assert spec.vae.ch == 128
    assert spec.scale_factor == 0.18215


def test_load_reference_schema_yaml(tmp_path):
    # the reference's OmegaConf target-style schema keeps working
    doc = """
model:
  target: guided_ldm.GuidedLDM
  params:
    linear_start: 0.00085
    linear_end: 0.012
    timesteps: 1000
    scale_factor: 0.18215
    conditioning_key: hybrid
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        in_channels: 9
        out_channels: 4
        model_channels: 320
        attention_resolutions: [4, 2, 1]
        num_res_blocks: 2
        channel_mult: [1, 2, 4, 4]
        num_heads: 8
        context_dim: 768
    first_stage_config:
      target: ldm.models.autoencoder.AutoencoderKL
      params:
        embed_dim: 4
        ddconfig: {ch: 128, ch_mult: [1, 2, 4, 4], num_res_blocks: 2,
                   z_channels: 4, in_channels: 3, out_ch: 3}
    cond_stage_config:
      target: ldm.modules.encoders.modules.FrozenCLIPEmbedder
"""
    p = tmp_path / "ref.yaml"
    p.write_text(doc)
    spec = C.load_spec(str(p))
    assert spec.unet.in_channels == 9
    assert spec.conditioning_key == "hybrid"
    assert spec.unet.attention_resolutions == (4, 2, 1)


def test_cli_parser_contract():
    from sd_animation_optical_flow_tpu.cli import main
    import argparse
    with pytest.raises(SystemExit):
        main(["pixel-inpaint"])  # missing -i/-o like the reference CLI
    for cmd in ("depth2img", "upscale"):
        with pytest.raises(SystemExit) as e:
            main([cmd, "--help"])
        assert e.value.code == 0


def _oracle(sched, x0):
    def model_fn(x, t, ctx, control=None):
        a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
        x0b = jnp.concatenate([x0, x0]) if x.shape[0] != x0.shape[0] else x0
        return (x - a * x0b) / s
    return model_fn


def test_dpmpp_2m_recovers_x0_with_oracle(rng):
    sched = make_linear_schedule()
    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    model_fn = _oracle(sched, x0)
    t_start = 401
    ts = DS.uniform_timesteps_desc(sched, t_start, 10)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t0 = jnp.asarray([t_start])
    from sd_animation_optical_flow_tpu.diffusion.schedule import q_sample
    x = q_sample(sched, x0, t0, noise)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    out = DS.dpmpp_2m_decode(model_fn, sched, ts, x, cond, cond,
                             cfg_scale=7.0, rng=rng)
    err = np.abs(np.asarray(out - x0))
    assert err.mean() < 0.02     # x0-prediction output: tighter than DDIM


def test_dpmpp_matches_ddim_quality_fewer_steps(rng):
    """With the oracle, 10 DPM++ steps land at least as close as 20 DDIM
    steps — the sampler's reason to exist."""
    sched = make_linear_schedule()
    x0 = jax.random.normal(rng, (1, 8, 8, 4))
    model_fn = _oracle(sched, x0)
    ddim = make_ddim_params(sched, 50)
    t_enc = 20
    noise = jax.random.normal(jax.random.fold_in(rng, 2), x0.shape)
    x_t = D.stochastic_encode(ddim, x0, t_enc, noise)
    cond = D.CondBundle(crossattn=jnp.zeros((1, 3, 8)))
    ddim_out = D.ddim_decode(model_fn, sched, ddim, x_t, cond, cond, t_enc,
                             rng=rng)
    ts = DS.uniform_timesteps_desc(sched, int(ddim.timesteps[t_enc]), 10)
    dpm_out = DS.dpmpp_2m_decode(model_fn, sched, ts, x_t, cond, cond,
                                 rng=rng)
    e_ddim = np.abs(np.asarray(ddim_out - x0)).mean()
    e_dpm = np.abs(np.asarray(dpm_out - x0)).mean()
    assert e_dpm <= e_ddim * 1.05


def test_flow_viz():
    wheel = FV.make_colorwheel()
    assert wheel.shape == (55, 3)
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 3.0
    img = FV.flow_to_image(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # uniform flow -> uniform color
    assert (img == img[0, 0]).all()
    bgr = FV.flow_to_image(flow, convert_to_bgr=True)
    np.testing.assert_array_equal(bgr[..., ::-1], img)


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).standard_normal((6, 9, 2)).astype(
        np.float32)
    path = str(tmp_path / "t.flo")
    FIO.write_flo(path, flow)
    np.testing.assert_array_equal(FIO.read_flo(path), flow)


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(1).standard_normal((5, 7, 3)).astype(
        np.float32)
    path = str(tmp_path / "t.pfm")
    FIO.write_pfm(path, img)
    out, scale = FIO.read_pfm(path)
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_kitti_flow_roundtrip(tmp_path):
    flow = (np.random.default_rng(2).standard_normal((4, 6, 2)) * 10
            ).astype(np.float32)
    path = str(tmp_path / "t.png")
    FIO.write_flow_kitti(path, flow)
    out, valid = FIO.read_flow_kitti(path)
    np.testing.assert_allclose(out, flow, atol=1 / 64)
    assert (valid == 1).all()


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2
    json.loads(t.report())


def test_cli_port_writes_pytrees(tmp_path):
    """`port` CLI: builds the (random-weight) bundle for a spec and
    writes unet/vae/clip npz pytrees loadable via utils.checkpoint."""
    import jax
    from sd_animation_optical_flow_tpu import cli as CLI
    from sd_animation_optical_flow_tpu.utils import checkpoint as CK
    from sd_animation_optical_flow_tpu import config as C

    # tiny native-schema YAML so the port is fast
    spec = tmp_path / "tiny.yaml"
    spec.write_text(
        "unet: {model_channels: 16, channel_mult: [1, 2], "
        "attention_resolutions: [1], num_heads: 2, context_dim: 32}\n"
        "vae: {ch: 16, ch_mult: [1, 2], num_res_blocks: 1}\n"
        "clip: {vocab_size: 128, width: 32, layers: 1, heads: 2}\n")
    out = tmp_path / "ported"
    CLI.main(["port", "--spec", str(spec), "-o", str(out)])
    for name in ("unet", "vae", "clip"):
        assert (out / f"{name}.npz").exists(), name
    sd = C.create_model(str(spec))
    loaded = CK.load_pytree(str(out / "unet.npz"), sd.unet_params)
    assert jax.tree.structure(loaded) == jax.tree.structure(sd.unet_params)


def test_device_put_tree_packed_force_roundtrip():
    """Packed upload (one transfer per dtype + on-device split) must
    reproduce every leaf; force=True drains the async transfer before
    returning (needed for honest phase timing through the axon tunnel,
    where block_until_ready does not block — DECISIONS.md round-3
    upload-drain entry)."""
    import numpy as np
    from sd_animation_optical_flow_tpu.utils.staging import \
        device_put_tree_packed
    tree = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.full((5,), 2.5, np.float32),
            "empty": np.zeros((0,), np.float32),
            "ints": np.arange(3, dtype=np.int32),
            "single_dtype": np.ones((2, 2), np.uint8)}
    for force in (False, True):
        out = device_put_tree_packed(tree, force=force)
        for k in tree:
            np.testing.assert_array_equal(np.asarray(out[k]), tree[k])
            assert out[k].dtype == tree[k].dtype
