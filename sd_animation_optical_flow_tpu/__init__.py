"""sd_animation_optical_flow_tpu — TPU-native flow-guided SD animation.

Public surface (lazy imports so ``import sd_animation_optical_flow_tpu``
stays cheap and jax-initialization-free):

  create_model / load_spec      — config-driven model construction
                                  (the instantiate_from_config analog)
  img2img / img2img_inpaint / img2img_latent_inpaint /
  img2img_inpaint_batch         — GuidedLDM facades
  img2img_depth2img / upscale   — LatentDiffusion specializations
  run_pixel_inpaint             — the README main pipeline
"""

# glibc allocator tuning (mallopt): without it every large numpy
# temporary re-pays this host's pathologically slow private-anon page
# faults; see utils/hostmem.py. Cheap, idempotent, opt-out via
# SDAOF_NO_MALLOC_TUNE=1. Deliberately the one eager import here.
from .utils.hostmem import tune_host_allocator as _tune

_tune()
del _tune

_LAZY = {
    "create_model": ("sd_animation_optical_flow_tpu.config", "create_model"),
    "load_spec": ("sd_animation_optical_flow_tpu.config", "load_spec"),
    "BundleSpec": ("sd_animation_optical_flow_tpu.config", "BundleSpec"),
    "StableDiffusionBundle": (
        "sd_animation_optical_flow_tpu.pipelines.facades",
        "StableDiffusionBundle"),
    "img2img": ("sd_animation_optical_flow_tpu.pipelines.facades",
                "img2img"),
    "img2img_inpaint": ("sd_animation_optical_flow_tpu.pipelines.facades",
                        "img2img_inpaint"),
    "img2img_latent_inpaint": (
        "sd_animation_optical_flow_tpu.pipelines.facades",
        "img2img_latent_inpaint"),
    "img2img_inpaint_batch": (
        "sd_animation_optical_flow_tpu.pipelines.facades",
        "img2img_inpaint_batch"),
    "img2img_depth2img": (
        "sd_animation_optical_flow_tpu.pipelines.specializations",
        "img2img_depth2img"),
    "upscale": ("sd_animation_optical_flow_tpu.pipelines.specializations",
                "upscale"),
    "run_pixel_inpaint": (
        "sd_animation_optical_flow_tpu.pipelines.pixel_inpaint", "run"),
    "txt2img": ("sd_animation_optical_flow_tpu.pipelines.facades",
                "txt2img"),
    "img2img_invert": ("sd_animation_optical_flow_tpu.pipelines.facades",
                       "img2img_invert"),
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
