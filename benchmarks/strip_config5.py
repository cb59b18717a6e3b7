"""Config-5 bench: 2-tile MFR strip denoise e2e on one chip (sp=1).

The BASELINE config-5 workload: ControlNet-guided generation with the
banded strip self-attention (reference ofgen_keyframe_inpaint.py:824-858
self_attn mode + attention.py:243-310 forward_mfr band bias). Measures
one frame generated per call: [target | reference] 512x1536 strip,
20-step DDIM CFG 7, hed 0.7 + canny 0.3 ControlNets, KV capture on.

Usage: python benchmarks/strip_config5.py [N_REF=1] [STEPS-env]
"""
import os, time
import numpy as np
import jax, jax.numpy as jnp

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
_CACHE = os.path.join(_ROOT, ".jax_cache")
# TPU-scoped: foreign-host CPU AOT entries can SIGILL (utils/compile_cache.py)
from sd_animation_optical_flow_tpu.utils.compile_cache import enable_tpu_compile_cache
enable_tpu_compile_cache(_CACHE)

from sd_animation_optical_flow_tpu.models import clip as CL
from sd_animation_optical_flow_tpu.models import controlnet as CN
from sd_animation_optical_flow_tpu.models import hed as HED
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models import vae as V
from sd_animation_optical_flow_tpu.models.layers import cast_tree, numpy_init
from sd_animation_optical_flow_tpu.pipelines import facades as F
from sd_animation_optical_flow_tpu.pipelines import keyframe_inpaint as KI
from sd_animation_optical_flow_tpu.pipelines.tokenizer import PromptTokenizer
from sd_animation_optical_flow_tpu.utils.staging import device_put_tree_packed

N_REF = int(os.environ.get("N_REF", "1"))
STEPS = int(os.environ.get("STEPS", "50"))    # ds 0.4 -> 20 executed
DS = float(os.environ.get("DS", "0.4"))
DT = jnp.bfloat16
dev = jax.devices()[0]
H, W = 512, 768

cast_put = lambda p: device_put_tree_packed(cast_tree(p, DT), dev, force=True)

t0 = time.time()
with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    vcfg = V.VAEConfig()
    ucfg = U.UNetConfig(in_channels=9)   # inpaint UNet (self_attn mode
    ccfg = CL.CLIPTextConfig()           # inpaints the target tile)
    vae_p = V.vae_init(k[0], vcfg)
    unet_p = U.unet_init(k[1], ucfg)
    clip_p = CL.clip_text_init(k[2], ccfg)
    cn_cfg = U.UNetConfig()
    cn_p = CN.controlnet_init(k[3], cn_cfg)
    hed_p = HED.hed_init(k[4])
tok = PromptTokenizer(hf_name_or_path=None)
sd = F.StableDiffusionBundle(
    unet_params=cast_put(unet_p), unet_cfg=ucfg,
    vae_params=cast_put(vae_p), vae_cfg=vcfg,
    clip_params=cast_put(clip_p), clip_cfg=ccfg, tokenizer=tok, dtype=DT)
cn_p = cast_put(cn_p)
hed_p = cast_put(hed_p)
hed_fn = HED.make_hed_fn(hed_p)
print(f"# init {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
import cv2
base = (rng.random((H, W * (N_REF + 1) + 32, 3)) * 255).astype(np.uint8)
base = cv2.GaussianBlur(base, (0, 0), 5)

def one_call(shift):
    strip = np.ascontiguousarray(base[:, shift:shift + W * (N_REF + 1)])
    mask = np.zeros((H, W * (N_REF + 1)), np.uint8)
    mask[:, :W] = 255                        # denoise/inpaint tile 0 only
    controls = KI._default_controls((cn_p, cn_cfg, hed_fn), strip)
    out, _, _, kv = F.img2img_inpaint(
        sd, KI.bgr_u8_to_model(strip), "masterpiece,best quality", "",
        denoising_strength=DS, ddim_steps=STEPS,
        reference_img=KI.bgr_u8_to_model(strip),
        mask=mask.astype(np.float32) / 255.0, mask_blur=4,
        capture_kv=True, control_specs=controls,
        want_init_decoded=False,
        strip=U.StripConfig(n_tiles=N_REF + 1, mode="target"))
    jax.device_get(jnp.sum(out.astype(jnp.float32)))
    return out

t0 = time.time(); one_call(0)
print(f"# compile+first call {time.time()-t0:.1f}s", flush=True)
times = []
for i in range(3):
    t0 = time.time(); one_call((i + 1) * 8)
    times.append(time.time() - t0)
    print(f"# call {i}: {times[-1]:.2f}s", flush=True)
best = min(times)
print(f"RESULT config5 strip n_ref={N_REF} 512x768/tile {STEPS}-step "
      f"ds{DS}: {best:.2f} s/frame = {1.0/best:.3f} f/s "
      f"(hed+canny controlnets, band bias, KV capture)", flush=True)
