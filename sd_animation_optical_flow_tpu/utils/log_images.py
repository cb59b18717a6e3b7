"""log_images: the training/debug image-panel dictionary.

Parity surface of LatentDiffusion.log_images (reference:
ldm/models/diffusion/ddpm.py:1083-1382): inputs, VAE reconstruction,
prompt panel, forward-diffusion row, sampled images (DDIM), denoise row
of sampling intermediates, and a CFG-scaled sample set. Returns a dict
of uint8 HWC numpy images (grids), ready for the pipelines' vis dumps.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..diffusion import ddim as D
from ..diffusion.schedule import make_ddim_params_traced, q_sample
from .logging_images import (denoise_row_grid, log_txt_as_img, make_grid,
                             to_uint8)


def log_images(sd, images, prompts: Sequence[str], *,
               n_row: int = 4, sample: bool = True, ddim_steps: int = 20,
               cfg_scale: Optional[float] = None,
               uc_prompt: str = "", n_diffusion_row: int = 6,
               seed: int = 0) -> Dict[str, np.ndarray]:
    """images [N, H, W, 3] in [-1, 1]; prompts: one per image.

    Keys mirror the reference's dict (ddpm.py:1130-1214): 'inputs',
    'reconstruction', 'conditioning', 'diffusion_row', 'samples',
    'denoise_row', and 'samples_cfg_scale_{s}' when ``cfg_scale``.
    """
    rng = jax.random.PRNGKey(seed)
    k_enc, k_diff, k_samp, k_cfg = jax.random.split(rng, 4)
    images = jnp.asarray(images)
    n = images.shape[0]
    out: Dict[str, np.ndarray] = {}

    out["inputs"] = to_uint8(make_grid(np.asarray(images), nrow=n_row))

    z = sd.encode_image(images, k_enc)
    rec = sd.decode_latent(z)
    out["reconstruction"] = to_uint8(make_grid(np.asarray(rec), nrow=n_row))

    out["conditioning"] = to_uint8(make_grid(
        log_txt_as_img((images.shape[2], images.shape[1]), list(prompts)),
        nrow=n_row))

    # forward diffusion row: q_sample at evenly spaced t, decoded
    # (ddpm.py:1140-1152)
    T = sd.sched.num_timesteps
    row: List[np.ndarray] = []
    for t_scalar in np.linspace(0, T - 1, n_diffusion_row).astype(int):
        t = jnp.full((n,), int(t_scalar), jnp.int32)
        noise = jax.random.normal(k_diff, z.shape, z.dtype)
        zt = q_sample(sd.sched, z, t, noise)
        row.append(np.asarray(sd.decode_latent(zt)))
    out["diffusion_row"] = to_uint8(denoise_row_grid(row))

    if sample:
        ctx_c = jnp.concatenate([sd.get_learned_conditioning(p)
                                 for p in prompts], axis=0)
        ctx_u = jnp.tile(sd.get_learned_conditioning(uc_prompt), (n, 1, 1))
        ddim = make_ddim_params_traced(sd.sched, ddim_steps)

        def model_fn(x, t, ctx, control=None):
            from ..models import unet as U
            return U.unet_apply(sd.unet_params, sd.unet_cfg, x, t, ctx)[0]

        lat = D.ddim_sample(model_fn, sd.sched, ddim,
                            D.CondBundle(crossattn=ctx_c),
                            D.CondBundle(crossattn=ctx_u),
                            shape=z.shape, rng=k_samp, cfg_scale=1.0,
                            parameterization=sd.parameterization,
                            dtype=z.dtype)
        out["samples"] = to_uint8(
            make_grid(np.asarray(sd.decode_latent(lat)), nrow=n_row))

        if cfg_scale is not None:
            lat_cfg = D.ddim_sample(model_fn, sd.sched, ddim,
                                    D.CondBundle(crossattn=ctx_c),
                                    D.CondBundle(crossattn=ctx_u),
                                    shape=z.shape, rng=k_cfg,
                                    cfg_scale=float(cfg_scale),
                                    parameterization=sd.parameterization,
                                    dtype=z.dtype)
            out[f"samples_cfg_scale_{cfg_scale:.2f}"] = to_uint8(
                make_grid(np.asarray(sd.decode_latent(lat_cfg)),
                          nrow=n_row))
    return out
