"""Weight porting + golden numerics: torch SD modules (ldm naming) vs
our JAX models with the ported weights — the parity check that makes
real checkpoints drop in correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sd_animation_optical_flow_tpu.models import clip as CL
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models import vae as V
from sd_animation_optical_flow_tpu.utils import port_weights as PW
from tests.torch_sd_ref import TorchUNet, TorchVAEDecoder, TorchVAEEncoder


def _np_state_dict(mod, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in
            mod.state_dict().items()}


UCFG = U.UNetConfig(in_channels=4, out_channels=4, model_channels=32,
                    num_res_blocks=2, attention_resolutions=(1,),
                    channel_mult=(1, 2), num_heads=4, context_dim=64)


def test_unet_port_and_parity():
    torch.manual_seed(0)
    tmodel = TorchUNet(model_channels=32, channel_mult=(1, 2),
                       attention_resolutions=(1,), num_heads=4,
                       context_dim=64).eval()
    sd = _np_state_dict(tmodel, "model.diffusion_model.")
    params, missing = PW.port_unet(sd, UCFG)
    assert not missing, f"missing keys: {missing[:8]}"

    x = np.random.default_rng(0).standard_normal((2, 16, 16, 4)).astype(
        np.float32)
    t = np.asarray([3, 500])
    ctx = np.random.default_rng(1).standard_normal((2, 7, 64)).astype(
        np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(t),
                     torch.from_numpy(ctx)).permute(0, 2, 3, 1).numpy()
    out, kv = U.unet_apply(params, UCFG, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-4)
    assert len(kv) == 6    # 2 enc + 1 mid + 3 dec transformers


def test_vae_port_and_parity():
    torch.manual_seed(1)
    enc = TorchVAEEncoder(ch=32, ch_mult=(1, 2), num_res_blocks=1).eval()
    dec = TorchVAEDecoder(ch=32, ch_mult=(1, 2), num_res_blocks=1).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    sd = {}
    sd.update(_np_state_dict(enc, "first_stage_model.encoder."))
    sd.update(_np_state_dict(dec, "first_stage_model.decoder."))
    sd.update(_np_state_dict(quant, "first_stage_model.quant_conv."))
    sd.update(_np_state_dict(post, "first_stage_model.post_quant_conv."))

    vcfg = V.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    params, missing = PW.port_vae(sd, vcfg)
    assert not missing, f"missing: {missing[:8]}"

    x = np.random.default_rng(2).standard_normal((1, 16, 16, 3)).astype(
        np.float32)
    with torch.no_grad():
        moments = quant(enc(torch.from_numpy(x).permute(0, 3, 1, 2)))
        mean_ref = moments.chunk(2, dim=1)[0].permute(0, 2, 3, 1).numpy()
    mean, _ = V.encode_moments(params, vcfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=2e-3,
                               atol=2e-4)

    z = np.random.default_rng(3).standard_normal((1, 8, 8, 4)).astype(
        np.float32)
    with torch.no_grad():
        img_ref = dec(post(torch.from_numpy(z).permute(0, 3, 1, 2)))
        img_ref = img_ref.permute(0, 2, 3, 1).numpy()
    img = V.decode(params, vcfg, jnp.asarray(z) * vcfg.scale_factor)
    np.testing.assert_allclose(np.asarray(img), img_ref, rtol=2e-3,
                               atol=2e-4)


def test_clip_port_and_parity():
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel
    hf_cfg = HFConfig(vocab_size=1000, hidden_size=64,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=4, max_position_embeddings=77)
    torch.manual_seed(2)
    tmodel = CLIPTextModel(hf_cfg).eval()
    sd = _np_state_dict(tmodel, "")
    cfg = CL.CLIPTextConfig(vocab_size=1000, width=64, layers=2, heads=4)
    params, missing = PW.port_clip_text(sd, cfg, prefix="text_model.")
    assert not missing, f"missing: {missing[:8]}"

    ids = np.random.default_rng(4).integers(0, 1000, (2, 77)).astype(
        np.int32)
    with torch.no_grad():
        ref = tmodel(input_ids=torch.from_numpy(ids.astype(np.int64))
                     ).last_hidden_state.numpy()
    out = CL.clip_text_apply(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def make_raft_state_dict(init):
    """Reference-named ('module.'-prefixed) torch-layout state dict
    synthesized from a raft_init pytree — the fixture both the
    structure test and the torch golden-parity test drive."""
    sd = {}

    def emit_conv(name, p):
        w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        sd["module." + name + ".weight"] = w
        if "b" in p:
            sd["module." + name + ".bias"] = np.asarray(p["b"])

    def emit_bn(name, p):
        sd["module." + name + ".weight"] = np.asarray(p["scale"])
        sd["module." + name + ".bias"] = np.asarray(p["bias"])
        sd["module." + name + ".running_mean"] = np.asarray(p["mean"])
        sd["module." + name + ".running_var"] = np.asarray(p["var"])

    for net, norm in (("fnet", "instance"), ("cnet", "batch")):
        emit_conv(f"{net}.conv1", init[net]["conv1"])
        if norm == "batch":
            emit_bn(f"{net}.norm1", init[net]["norm1"])
        for li, (u1, u2) in enumerate(init[net]["layers"], start=1):
            for ui, u in ((0, u1), (1, u2)):
                base = f"{net}.layer{li}.{ui}"
                emit_conv(base + ".conv1", u["conv1"])
                emit_conv(base + ".conv2", u["conv2"])
                if norm == "batch":
                    emit_bn(base + ".norm1", u["norm1"])
                    emit_bn(base + ".norm2", u["norm2"])
                if "down" in u:
                    emit_conv(base + ".downsample.0", u["down"])
                    if norm == "batch":
                        emit_bn(base + ".downsample.1", u["norm3"])
        emit_conv(f"{net}.conv2", init[net]["conv2"])
    up = init["update"]
    for n in ("convc1", "convc2", "convf1", "convf2", "conv"):
        emit_conv(f"update_block.encoder.{n}", up["encoder"][n])
    for n in up["gru"]:
        emit_conv(f"update_block.gru.{n}", up["gru"][n])
    emit_conv("update_block.flow_head.conv1", up["flow_head"]["conv1"])
    emit_conv("update_block.flow_head.conv2", up["flow_head"]["conv2"])
    emit_conv("update_block.mask.0", up["mask"]["conv1"])
    emit_conv("update_block.mask.2", up["mask"]["conv2"])
    return sd


def test_raft_port_structure(rng):
    """port_raft output matches raft_init's tree structure exactly."""
    from sd_animation_optical_flow_tpu.models import raft as RF
    cfg = RF.RAFTConfig()
    init = RF.raft_init(rng, cfg)
    sd = make_raft_state_dict(init)

    ported, missing = PW.port_raft(sd)
    assert not missing
    # round trip: ported == init exactly
    flat_a = jax.tree_util.tree_leaves_with_path(init)
    flat_b = jax.tree_util.tree_leaves_with_path(ported)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-6)


def test_raft_golden_parity(rng):
    """Ported-RAFT numerics vs torch semantics (VERDICT r3 ask #8:
    extend golden parity to ported RAFT weights). A reference-named
    state dict drives tests/torch_raft_ref.py's functional torch
    forward (grid_sample align_corners, eval-mode instance/batch norm,
    floor avg_pool) and port_raft + raft_apply on the same weights;
    flow_low AND the convex-upsampled flow_up must agree."""
    from sd_animation_optical_flow_tpu.models import raft as RF
    from tests.torch_raft_ref import raft_forward

    cfg = RF.RAFTConfig(iters=4, corr_dtype="float32")
    init = RF.raft_init(rng, cfg)
    sd = make_raft_state_dict(init)
    ported, missing = PW.port_raft(sd)
    assert not missing

    g = np.random.default_rng(11)
    # big enough that the 4-level corr pyramid bottoms out at 2x2
    # (1x1 would divide by zero in torch grid normalization - real
    # RAFT resolutions never reach it)
    img1 = g.uniform(0, 255, (2, 128, 160, 3)).astype(np.float32)
    img2 = g.uniform(0, 255, (2, 128, 160, 3)).astype(np.float32)

    tsd = {k[len("module."):]: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
    ref_low, ref_up = raft_forward(tsd, t1, t2, iters=4)

    flow_low, flow_up = RF.raft_apply(ported, cfg, jnp.asarray(img1),
                                      jnp.asarray(img2), iters=4)
    out_low = np.moveaxis(np.asarray(flow_low), -1, 1)
    out_up = np.moveaxis(np.asarray(flow_up), -1, 1)
    np.testing.assert_allclose(out_low, ref_low.numpy(), atol=2e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(out_up, ref_up.numpy(), atol=2e-3,
                               rtol=1e-3)


def test_port_vq_roundtrip():
    """Build a VQ state dict in torch layout from our own tiny params'
    shapes and check the ported pytree matches structurally + the
    codebook numerically."""
    import jax
    import jax.numpy as jnp
    from sd_animation_optical_flow_tpu.models.vae import VAEConfig
    from sd_animation_optical_flow_tpu.models import vq as VQ
    from sd_animation_optical_flow_tpu.utils.port_weights import port_vq

    bb = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                   z_channels=3, embed_dim=3, double_z=False,
                   scale_factor=1.0)
    cfg = VQ.VQConfig(backbone=bb, n_embed=16, embed_dim=3)
    ref = VQ.vq_init(jax.random.PRNGKey(0), cfg)

    # serialize our params into the torch/ldm key layout
    sd = {}

    def put_conv(name, p):
        sd[name + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        if "b" in p:
            sd[name + ".bias"] = np.asarray(p["b"])

    def put_norm(name, p):
        sd[name + ".weight"] = np.asarray(p["scale"])
        sd[name + ".bias"] = np.asarray(p["bias"])

    def put_res(name, p):
        put_norm(name + ".norm1", p["norm1"])
        put_conv(name + ".conv1", p["conv1"])
        put_norm(name + ".norm2", p["norm2"])
        put_conv(name + ".conv2", p["conv2"])
        if "nin_shortcut" in p:
            put_conv(name + ".nin_shortcut", p["nin_shortcut"])

    def put_attn(name, p):
        put_norm(name + ".norm", p["norm"])
        for k in ("q", "k", "v", "proj_out"):
            put_conv(f"{name}.{k}", p[k])

    pre = "first_stage_model."
    enc = ref["encoder"]
    put_conv(pre + "encoder.conv_in", enc["conv_in"])
    for lvl, lp in enumerate(enc["down"]):
        for b, blk in enumerate(lp["blocks"]):
            put_res(pre + f"encoder.down.{lvl}.block.{b}", blk)
        if "downsample" in lp:
            put_conv(pre + f"encoder.down.{lvl}.downsample.conv",
                     lp["downsample"])
    for k in ("block_1", "block_2"):
        put_res(pre + f"encoder.mid.{k}", enc["mid"][k])
    put_attn(pre + "encoder.mid.attn_1", enc["mid"]["attn_1"])
    put_norm(pre + "encoder.norm_out", enc["norm_out"])
    put_conv(pre + "encoder.conv_out", enc["conv_out"])

    dec = ref["decoder"]
    put_conv(pre + "decoder.conv_in", dec["conv_in"])
    for k in ("block_1", "block_2"):
        put_res(pre + f"decoder.mid.{k}", dec["mid"][k])
    put_attn(pre + "decoder.mid.attn_1", dec["mid"]["attn_1"])
    n_lvl = len(bb.ch_mult)
    # our decoder list is coarsest->finest; torch names finest = 0
    for i, lp in enumerate(dec["up"]):
        lvl = n_lvl - 1 - i
        for b, blk in enumerate(lp["blocks"]):
            put_res(pre + f"decoder.up.{lvl}.block.{b}", blk)
        if "upsample" in lp:
            put_conv(pre + f"decoder.up.{lvl}.upsample.conv", lp["upsample"])
    put_norm(pre + "decoder.norm_out", dec["norm_out"])
    put_conv(pre + "decoder.conv_out", dec["conv_out"])
    put_conv(pre + "quant_conv", ref["quant_conv"])
    put_conv(pre + "post_quant_conv", ref["post_quant_conv"])
    sd[pre + "quantize.embedding.weight"] = np.asarray(
        ref["quantize"]["embedding"])

    ported, missing = port_vq(sd, cfg)
    assert not missing, missing[:5]
    # ported tree must reproduce the source tree exactly
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ported)[0],
            jax.tree_util.tree_flatten_with_path(ref)[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))
    # and produce identical model outputs
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    q1, _, i1 = VQ.vq_encode(ref, cfg, x)
    q2, _, i2 = VQ.vq_encode(ported, cfg, x)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)


def test_port_t5_encoder_golden_vs_transformers():
    """Golden parity: our T5 encoder vs transformers T5EncoderModel on a
    tiny random-init gated-gelu (v1.1-style) config with ported weights."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import T5Config as HFT5Config, T5EncoderModel

    from sd_animation_optical_flow_tpu.models import text_encoders as TE
    from sd_animation_optical_flow_tpu.utils.port_weights import \
        port_t5_encoder

    hf_cfg = HFT5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        is_encoder_decoder=False, use_cache=False)
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = TE.T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=48,
                      heads=4, layers=2, rel_buckets=8,
                      rel_max_distance=16)
    params, missing = port_t5_encoder(sd, cfg)
    assert not [m for m in missing if "embed_tokens" not in m], missing

    ids = np.array([[3, 7, 12, 25, 1, 0, 0, 0]], dtype=np.int64)
    attn = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(attn)
                 ).last_hidden_state.numpy()
    out = TE.t5_encoder_apply(params, cfg, jnp.asarray(ids),
                              jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_openclip_tower_golden_vs_hf_clip():
    """Golden parity for the OpenCLIP-style tower: HF CLIPTextModel with
    hidden_act='gelu' (erf) has the identical block topology; penultimate
    mode must equal hidden_states[-2] + final layer norm."""
    import jax.numpy as jnp
    import torch
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    from sd_animation_optical_flow_tpu.models import text_encoders as TE

    hf_cfg = HFCfg(vocab_size=64, hidden_size=32, intermediate_size=128,
                   num_hidden_layers=3, num_attention_heads=4,
                   max_position_embeddings=12, hidden_act="gelu")
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    from sd_animation_optical_flow_tpu.utils.port_weights import \
        port_openclip_text
    cfg = TE.OpenCLIPTextConfig(vocab_size=64, max_position=12, width=32,
                                layers=3, heads=4, penultimate=True)
    params, missing = port_openclip_text(sd, cfg)
    assert not [m for m in missing if "position_ids" not in m], missing

    ids = np.array([[5, 9, 13, 2, 1, 0, 7, 3, 11, 4, 6, 8]], np.int64)
    with torch.no_grad():
        hs = hf(input_ids=torch.from_numpy(ids),
                output_hidden_states=True).hidden_states
        ref = hf.text_model.final_layer_norm(hs[-2]).numpy()
    out = TE.openclip_text_apply(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# make_it_fit (fit_tensor / fit_state_dict)
# ---------------------------------------------------------------------------

def _fit_reference(old: np.ndarray, new_shape: tuple) -> np.ndarray:
    """Literal loop transcription of the make_it_fit semantics
    (ddpm.py:219-262) as the golden oracle."""
    old_shape = old.shape
    if len(new_shape) == 1:
        out = np.empty(new_shape, old.dtype)
        for i in range(new_shape[0]):
            out[i] = old[i % old_shape[0]]
        return out
    out = np.empty(new_shape, old.dtype)
    for i in range(new_shape[0]):
        for j in range(new_shape[1]):
            out[i, j] = old[i % old_shape[0], j % old_shape[1]]
    n_used_old = np.ones(old_shape[1])
    for j in range(new_shape[1]):
        n_used_old[j % old_shape[1]] += 1
    n_used_new = np.zeros(new_shape[1])
    for j in range(new_shape[1]):
        n_used_new[j] = n_used_old[j % old_shape[1]]
    n_used_new = n_used_new.reshape((1, -1) + (1,) * (len(new_shape) - 2))
    return out / n_used_new


@pytest.mark.parametrize("old_shape,new_shape", [
    ((4,), (9,)),
    ((320, 4, 3, 3), (320, 9, 3, 3)),       # 4ch -> 9ch inpaint conv
    ((8, 6), (12, 10)),
    ((5, 7, 2), (5, 7, 2)),                  # identity
])
def test_fit_tensor_matches_reference_loops(old_shape, new_shape):
    rng = np.random.RandomState(0)
    old = rng.randn(*old_shape).astype(np.float64)
    got = PW.fit_tensor(old, new_shape)
    want = old if old_shape == new_shape else _fit_reference(old, new_shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_fit_state_dict_selective():
    sd = {"a": np.ones((4,)), "b": np.ones((2, 2))}
    out = PW.fit_state_dict(sd, {"a": (6,), "c": (3,)})
    assert out["a"].shape == (6,)
    np.testing.assert_array_equal(out["b"], sd["b"])
