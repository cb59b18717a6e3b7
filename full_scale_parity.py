"""Full-scale golden parity: SD-1.5-sized modules, torch vs JAX.

The 40 dB warp-PSNR gate (BASELINE.md) wants real SD-1.5 weights, which
cannot enter this environment (no network). The agreed substitute
(VERDICT r1 item 5): run the weight-porting + numerics parity check at
FULL scale — 320-ch UNet on 64x96 latents (512x768 pixels, the
reference's working resolution, ofgen_pixel_inpaint.py:324), 128-ch VAE
at 512x768, ViT-L-sized CLIP text tower — with randomly initialized
torch modules in the reference's ldm state-dict naming
(tests/torch_sd_ref.py), ported through utils/port_weights, and compare
outputs in f32 on CPU.

This is the same check the per-module unit tests run at toy scale
(tests/test_port_weights.py), promoted to the exact shapes/channel
counts real checkpoints have — so a real SD-1.5/inpaint checkpoint
dropping in is a pure re-run of `cli.py port` away, with numerics
already proven at its scale.

Usage: JAX_PLATFORMS=cpu python full_scale_parity.py [unet|vae|clip|all]
Prints per-module max|err| and PSNR (20*log10(peak_ref_range/rmse)).
Numbers recorded in DECISIONS.md.
"""

import os
import sys
import time

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var; this is the
# only reliable way to force CPU here (same trick as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _psnr(ref, out):
    ref = np.asarray(ref, np.float64)
    out = np.asarray(out, np.float64)
    rmse = np.sqrt(np.mean((ref - out) ** 2))
    peak = ref.max() - ref.min()
    return 20.0 * np.log10(peak / max(rmse, 1e-12)), np.abs(ref - out).max()


def _np_state_dict(mod, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in
            mod.state_dict().items()}


def _report(name, ref, out, secs):
    psnr, mx = _psnr(ref, out)
    print(f"{name:<34s} PSNR {psnr:7.2f} dB   max|err| {mx:.3e}   "
          f"({secs:.0f}s)", flush=True)
    return psnr


def parity_unet():
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.utils import port_weights as PW
    from tests.torch_sd_ref import TorchUNet

    t0 = time.time()
    torch.manual_seed(0)
    cfg = U.UNetConfig()          # full SD-1.5: 320ch, (1,2,4,4), 8 heads
    tmodel = TorchUNet(model_channels=cfg.model_channels,
                       num_res_blocks=cfg.num_res_blocks,
                       attention_resolutions=(1, 2, 4),
                       channel_mult=tuple(cfg.channel_mult),
                       num_heads=cfg.num_heads,
                       context_dim=cfg.context_dim).eval()
    sd = _np_state_dict(tmodel, "model.diffusion_model.")
    params, missing = PW.port_unet(sd, cfg)
    assert not missing, f"missing: {missing[:8]}"

    rng = np.random.default_rng(0)
    # CFG batch 2 at the reference's 512x768 working resolution
    x = rng.standard_normal((2, 64, 96, 4)).astype(np.float32)
    t = np.asarray([21, 981])
    ctx = rng.standard_normal((2, 231, 768)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(t),
                     torch.from_numpy(ctx)).permute(0, 2, 3, 1).numpy()
    out, kv = U.unet_apply(params, cfg, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(ctx))
    assert len(kv) == 16          # the SD-1.5 transformer-layer count
    return _report("unet 320ch 2x64x96 (512x768)", ref,
                   np.asarray(out), time.time() - t0)


def parity_vae():
    from sd_animation_optical_flow_tpu.models import vae as V
    from sd_animation_optical_flow_tpu.utils import port_weights as PW
    from tests.torch_sd_ref import TorchVAEDecoder, TorchVAEEncoder

    t0 = time.time()
    torch.manual_seed(1)
    cfg = V.VAEConfig()           # full SD VAE: 128ch, (1,2,4,4), 2 blocks
    enc = TorchVAEEncoder(ch=cfg.ch, ch_mult=tuple(cfg.ch_mult),
                          num_res_blocks=cfg.num_res_blocks).eval()
    dec = TorchVAEDecoder(ch=cfg.ch, ch_mult=tuple(cfg.ch_mult),
                          num_res_blocks=cfg.num_res_blocks).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    sd = {}
    sd.update(_np_state_dict(enc, "first_stage_model.encoder."))
    sd.update(_np_state_dict(dec, "first_stage_model.decoder."))
    sd.update(_np_state_dict(quant, "first_stage_model.quant_conv."))
    sd.update(_np_state_dict(post, "first_stage_model.post_quant_conv."))
    params, missing = PW.port_vae(sd, cfg)
    assert not missing, f"missing: {missing[:8]}"

    rng = np.random.default_rng(2)
    img = (rng.random((1, 512, 768, 3), np.float32) * 2 - 1)
    with torch.no_grad():
        moments = quant(enc(torch.from_numpy(img).permute(0, 3, 1, 2)))
        mean = moments[:, :4]
        ref_dec = dec(post(mean)).permute(0, 2, 3, 1).numpy()
        ref_mean = mean.permute(0, 2, 3, 1).numpy()
    # encode: compare the posterior mean (sample=False path / 0.18215
    # scaling divided back out)
    lat = V.encode(params, cfg, jnp.asarray(img), sample=False)
    out_mean = np.asarray(lat) / cfg.scale_factor
    p1 = _report("vae encode-mean 512x768", ref_mean, out_mean,
                 time.time() - t0)
    t1 = time.time()
    out_dec = V.decode(params, cfg, jnp.asarray(ref_mean) * cfg.scale_factor)
    p2 = _report("vae decode 64x96 -> 512x768", ref_dec,
                 np.asarray(out_dec), time.time() - t1)
    return min(p1, p2)


def parity_clip():
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    from sd_animation_optical_flow_tpu.models import clip as CL
    from sd_animation_optical_flow_tpu.utils import port_weights as PW

    t0 = time.time()
    torch.manual_seed(2)
    hf_cfg = HFConfig(vocab_size=49408, hidden_size=768,
                      intermediate_size=3072, num_hidden_layers=12,
                      num_attention_heads=12,
                      max_position_embeddings=77)   # ViT-L/14 text tower
    tmodel = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    cfg = CL.CLIPTextConfig()
    params, missing = PW.port_clip_text(sd, cfg, prefix="text_model.")
    assert not missing, f"missing: {missing[:8]}"

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 49408, (2, 77), dtype=np.int64)
    ids[:, 0] = 49406
    ids[:, -1] = 49407
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = CL.clip_text_apply(params, cfg, jnp.asarray(ids))
    return _report("clip text ViT-L 12-layer 2x77", ref, np.asarray(out),
                   time.time() - t0)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    torch.set_num_threads(os.cpu_count() or 8)
    print(f"# full-scale golden parity  backend={jax.default_backend()}",
          flush=True)
    worst = []
    if what in ("unet", "all"):
        worst.append(parity_unet())
    if what in ("vae", "all"):
        worst.append(parity_vae())
    if what in ("clip", "all"):
        worst.append(parity_clip())
    print(f"# worst module PSNR: {min(worst):.2f} dB "
          f"({'PASS' if min(worst) >= 40.0 else 'FAIL'} vs 40 dB gate)")
