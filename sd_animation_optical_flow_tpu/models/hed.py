"""HED soft-edge detector (ControlNet annotator network), TPU-native.

The reference imports ``apply_hed`` from the external
``controlnet_models.hed`` package (reference: controlnet.py:339,349) to
build the HED ControlNet hint. This is the same network in JAX: five
VGG-style conv blocks (64/128/256/512/512 channels; 2,2,3,3,3 convs)
with 2x max-pool between blocks, a learned per-channel input shift, and
a 1x1 single-channel projection per stage. The edge map is
sigmoid(mean of the five bilinear-upsampled side logits), scaled to
[0, 255] (the annotator's apply_hed contract).

Weights: the ControlNet annotator's ``ControlNetHED.pth`` state dict
(norm, blockN.convs.M.{weight,bias}, blockN.projection.{weight,bias})
via :func:`port_hed`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .layers import conv2d, conv2d_init
from ..ops.resize import resize


_BLOCKS = ((3, 64, 2), (64, 128, 2), (128, 256, 3),
           (256, 512, 3), (512, 512, 3))


def hed_init(rng):
    rngs = iter(jax.random.split(rng, 32))
    p = {"norm": jnp.zeros((3,), jnp.float32), "blocks": []}
    for in_ch, out_ch, n_convs in _BLOCKS:
        blk = {"convs": [], "projection": conv2d_init(next(rngs), out_ch, 1, 1)}
        ch = in_ch
        for _ in range(n_convs):
            blk["convs"].append(conv2d_init(next(rngs), ch, out_ch, 3))
            ch = out_ch
        p["blocks"].append(blk)
    return p


def hed_apply(params, x):
    """x [B, H, W, 3] float (0-255 BGR-as-loaded, like the annotator) ->
    five side logits, each [B, H/2^i, W/2^i, 1]."""
    h = x - params["norm"].astype(x.dtype)
    sides = []
    for i, blk in enumerate(params["blocks"]):
        if i > 0:
            # 2x2 max pool stride 2
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        for cp in blk["convs"]:
            h = jax.nn.relu(conv2d(cp, h))
        sides.append(conv2d(blk["projection"], h))
    return sides


def hed_edges(params, image_bgr_u8: np.ndarray) -> np.ndarray:
    """apply_hed contract: [H, W, 3] uint8 -> [H, W] uint8 edge map."""
    H, W = image_bgr_u8.shape[:2]
    x = jnp.asarray(image_bgr_u8, jnp.float32)[None]
    sides = hed_apply(params, x)
    ups = [resize(s[0], (H, W), "linear") for s in sides]
    logit = jnp.mean(jnp.stack([u[..., 0] for u in ups]), axis=0)
    edge = jax.nn.sigmoid(logit) * 255.0
    return np.asarray(jnp.clip(edge, 0, 255)).astype(np.uint8)


def make_hed_fn(params):
    """Build the ``hed_fn`` callable the ControlNet hint builders accept
    (models/controlnet.py hed_hint)."""
    return lambda img: hed_edges(params, img)


def port_hed(sd: dict) -> dict:
    """ControlNetHED.pth state dict (numpy tensors) -> hed params.

    Torch layout: norm [1,3,1,1]; block{i}.convs.{j}.weight [O,I,3,3];
    block{i}.projection.weight [1,O,1,1]."""
    def conv(name):
        w = np.asarray(sd[f"{name}.weight"])
        out = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)}
        b = sd.get(f"{name}.bias")
        if b is not None:
            out["b"] = jnp.asarray(np.asarray(b).reshape(-1), jnp.float32)
        return out

    p = {"norm": jnp.asarray(np.asarray(sd["norm"]).reshape(-1),
                             jnp.float32),
         "blocks": []}
    for i, (_in, _out, n_convs) in enumerate(_BLOCKS, start=1):
        blk = {"convs": [conv(f"block{i}.convs.{j}") for j in range(n_convs)],
               "projection": conv(f"block{i}.projection")}
        p["blocks"].append(blk)
    return p
