"""Declarative model configuration and construction.

The reference drives its whole model graph from OmegaConf YAML with
dotted ``target:`` class paths (reference: ldm/util.py:72-88,
guided_ldm.py:244-248; configs guided_ldm_v15.yaml /
guided_ldm_inpaint4_v15.yaml / guided_ldm_inpaint9_v15.yaml). Here the
same idea is typed: a ``BundleSpec`` dataclass maps to a
StableDiffusionBundle, YAML files under configs/ provide the standard
SD-1.5 stacks, and ``create_model`` ALSO accepts the reference's own
YAML schema (known ``target`` strings are translated), so existing
configs keep working.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from .models.clip import CLIPTextConfig, clip_text_init
from .models.unet import UNetConfig, unet_init
from .models.vae import VAEConfig, vae_init
from .diffusion.schedule import make_linear_schedule
from .pipelines.facades import StableDiffusionBundle
from .pipelines.tokenizer import PromptTokenizer

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@dataclass
class BundleSpec:
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    scale_factor: float = 0.18215
    parameterization: str = "eps"
    conditioning_key: str = "crossattn"        # or 'hybrid'
    clip_skip: int = 0
    unet: UNetConfig = field(default_factory=UNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    clip: CLIPTextConfig = field(default_factory=CLIPTextConfig)

    def build(self, rng=None, state_dict=None,
              dtype=jnp.float32) -> StableDiffusionBundle:
        """Build the bundle: port weights when a state dict is given,
        random-init otherwise (weightless smoke mode)."""
        vae_cfg = VAEConfig(**{**self.vae.__dict__,
                               "scale_factor": self.scale_factor}) \
            if self.vae.scale_factor != self.scale_factor else self.vae
        if state_dict is not None:
            from .utils.port_weights import (port_clip_text, port_unet,
                                             port_vae)
            unet_p, m1 = port_unet(state_dict, self.unet)
            vae_p, m2 = port_vae(state_dict, vae_cfg)
            clip_p, m3 = port_clip_text(state_dict, self.clip)
            missing = m1 + m2 + m3
            if missing:
                # strict=False loading, like the reference
                # (ofgen_pixel_inpaint.py:19-25)
                print(f"[config] {len(missing)} keys missing from "
                      f"checkpoint (strict=False), e.g. {missing[:3]}")
        else:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            k1, k2, k3 = jax.random.split(rng, 3)
            from .models.layers import numpy_init
            # init straight in the serving dtype: staging f32 first
            # pushes multi-model init past the host's fast-memory
            # window (utils/hostmem.py)
            with jax.default_device(jax.local_devices(backend="cpu")[0]), \
                    numpy_init(dtype):
                unet_p = unet_init(k1, self.unet)
                vae_p = vae_init(k2, vae_cfg)
                clip_p = clip_text_init(k3, self.clip)
        from .models.layers import cast_tree
        from .utils.staging import device_put_tree_packed
        # params must live on the serving device: host leaves passed as
        # jit arguments are re-transferred on EVERY call (one RTT per
        # leaf through a remote runtime — see utils/staging.py)
        cast = lambda t: device_put_tree_packed(cast_tree(t, dtype))
        return StableDiffusionBundle(
            unet_params=cast(unet_p), unet_cfg=self.unet,
            vae_params=cast(vae_p), vae_cfg=vae_cfg,
            clip_params=cast(clip_p), clip_cfg=self.clip,
            sched=make_linear_schedule(self.timesteps, self.linear_start,
                                       self.linear_end),
            parameterization=self.parameterization,
            tokenizer=PromptTokenizer(), clip_skip=self.clip_skip,
            dtype=dtype)


SD15 = BundleSpec()
SD15_INPAINT9 = BundleSpec(conditioning_key="hybrid",
                           unet=UNetConfig(in_channels=9))
# depth2img: 4 latent + 1 depth channel (LatentDepth2ImageDiffusion,
# ddpm.py:1756-1807; consumed by pipelines/specializations.py)
SD15_DEPTH = BundleSpec(conditioning_key="hybrid",
                        unet=UNetConfig(in_channels=5))
# latent upscaler: 4 latent + 3 low-res channels, class-conditional on
# the augmentation noise level (LatentUpscaleDiffusion, ddpm.py:1426)
SD_UPSCALE = BundleSpec(conditioning_key="hybrid",
                        unet=UNetConfig(in_channels=7, num_classes=1000))


def _spec_from_reference_yaml(doc: dict) -> BundleSpec:
    """Translate the reference's OmegaConf schema (guided_ldm_*.yaml)."""
    m = doc["model"]["params"]
    up = m["unet_config"]["params"]
    unet = UNetConfig(
        in_channels=up.get("in_channels", 4),
        out_channels=up.get("out_channels", 4),
        model_channels=up.get("model_channels", 320),
        num_res_blocks=up.get("num_res_blocks", 2),
        attention_resolutions=tuple(up.get("attention_resolutions",
                                           (4, 2, 1))),
        channel_mult=tuple(up.get("channel_mult", (1, 2, 4, 4))),
        num_heads=up.get("num_heads", 8),
        transformer_depth=up.get("transformer_depth", 1),
        context_dim=up.get("context_dim", 768))
    dd = m["first_stage_config"]["params"]["ddconfig"]
    vae = VAEConfig(
        ch=dd.get("ch", 128), ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        in_channels=dd.get("in_channels", 3), out_ch=dd.get("out_ch", 3),
        z_channels=dd.get("z_channels", 4),
        embed_dim=m["first_stage_config"]["params"].get("embed_dim", 4),
        scale_factor=m.get("scale_factor", 0.18215))
    return BundleSpec(
        timesteps=m.get("timesteps", 1000),
        linear_start=m.get("linear_start", 0.00085),
        linear_end=m.get("linear_end", 0.0120),
        scale_factor=m.get("scale_factor", 0.18215),
        parameterization=m.get("parameterization", "eps"),
        conditioning_key=m.get("conditioning_key", "crossattn"),
        unet=unet, vae=vae)


def load_spec(path_or_name: str) -> BundleSpec:
    """YAML path (ours or the reference schema) or a builtin name
    ('sd15', 'sd15-inpaint9')."""
    builtins = {"sd15": SD15, "sd15-inpaint9": SD15_INPAINT9,
                "sd15-depth": SD15_DEPTH, "sd-upscale": SD_UPSCALE}
    if path_or_name in builtins:
        return builtins[path_or_name]
    import yaml
    with open(path_or_name) as f:
        doc = yaml.safe_load(f)
    if "model" in doc and "target" in doc.get("model", {}):
        return _spec_from_reference_yaml(doc)
    # native schema: flat sections. YAML sequences arrive as lists —
    # coerce to tuples so the frozen configs stay hashable (they ride
    # as jit static arguments).
    detuple = lambda d: {k: tuple(v) if isinstance(v, list) else v
                         for k, v in d.items()}
    unet = UNetConfig(**detuple(doc.get("unet", {})))
    vae = VAEConfig(**detuple(doc.get("vae", {})))
    clip = CLIPTextConfig(**detuple(doc.get("clip", {})))
    top = {k: v for k, v in doc.items()
           if k not in ("unet", "vae", "clip")}
    return BundleSpec(unet=unet, vae=vae, clip=clip, **detuple(top))


def create_model(path_or_name: str, ckpt_path: Optional[str] = None,
                 dtype=jnp.float32, rng=None) -> StableDiffusionBundle:
    """The reference's create_model + load_state_dict in one step
    (guided_ldm.py:232-248)."""
    spec = load_spec(path_or_name)
    state_dict = None
    if ckpt_path:
        from .utils.port_weights import load_state_dict
        state_dict = load_state_dict(ckpt_path)
    return spec.build(rng=rng, state_dict=state_dict, dtype=dtype)
