"""Probe: the keyframe pairwise-flow phase in isolation, with the real
kf-bundle residency (2 UNets + VAE + CLIP + RAFT), per-chunk timing."""
import os, shutil, time
import numpy as np
import jax, jax.numpy as jnp
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
# TPU-scoped: foreign-host CPU AOT entries can SIGILL (utils/compile_cache.py)
from sd_animation_optical_flow_tpu.utils.compile_cache import enable_tpu_compile_cache
enable_tpu_compile_cache(_CACHE)

from sd_animation_optical_flow_tpu.models import clip as CL
from sd_animation_optical_flow_tpu.models import raft as RF
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.models import vae as V
from sd_animation_optical_flow_tpu.models import flowconf as FC
from sd_animation_optical_flow_tpu.models.layers import numpy_init, cast_tree
from sd_animation_optical_flow_tpu.utils.staging import device_put_tree_packed
from sd_animation_optical_flow_tpu.pipelines import keyframe_inpaint as KI

DT = jnp.bfloat16
dev = jax.devices()[0]
cast_put = lambda p: device_put_tree_packed(cast_tree(p, DT), dev)
t0 = time.time()
with jax.default_device(jax.local_devices(backend="cpu")[0]), numpy_init(DT):
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    resident = [cast_put(U.unet_init(k[1], U.UNetConfig())),
                cast_put(U.unet_init(k[2], U.UNetConfig(in_channels=9))),
                cast_put(V.vae_init(k[0], V.VAEConfig())),
                cast_put(CL.clip_text_init(k[3], CL.CLIPTextConfig()))]
    fcfg = FC.FlowConfidenceConfig(raft=RF.RAFTConfig(
        corr_dtype=os.environ.get("CORR_DTYPE", "bfloat16")))
    raft_p = RF.raft_init(k[4], fcfg.raft)
est = FC.FlowConfidenceEstimator(cast_put(raft_p), fcfg)
print(f"# init {time.time()-t0:.1f}s", flush=True)

H, W = 512, 768
rng = np.random.default_rng(0)
base = (rng.random((H + 64, W + 64, 3)) * 255).astype(np.uint8)
import cv2
base = cv2.GaussianBlur(base, (0, 0), 9)
frames = np.stack([base[8+i:8+i+H, 8+i:8+i+W] for i in range(48)])
WS = "/tmp/kf_flow_phase_ws"
shutil.rmtree(WS, ignore_errors=True)
video = KI.VideoWorkspace(WS, frames=frames, size=(W, H), keep_every=3)

fc = KI.FlowCache(est, WS, int(os.environ.get("FB", "8")))
_orig = fc._compute_pairs
def timed(video, pairs, store_reverse=True):
    t = time.time()
    _orig(video, pairs, store_reverse=store_reverse)
    print(f"# chunk call: {len(pairs)} pairs (bs now {fc.batch_size}) "
          f"{time.time()-t:.1f}s", flush=True)
fc._compute_pairs = timed

idx = KI.FrameIndices.from_n(video.num_frames)
t0 = time.time()
kf = KI.keyframe_conv(fc, os.path.join(WS, "d01"), video, idx,
                      kernel_size=30, stride=15, dilation=2)
print(f"PHASE pairwise+conv: {time.time()-t0:.1f}s, keyframes={kf}",
      flush=True)
