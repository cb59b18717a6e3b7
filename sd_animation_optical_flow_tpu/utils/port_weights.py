"""Checkpoint porting: SD/LDM torch state dicts -> framework pytrees.

The reference loads `.ckpt`/`.safetensors` state dicts with CompVis/LDM
naming (reference: guided_ldm.py:228-241, ofgen_pixel_inpaint.py:19-25
strict=False; ControlNet prefix-strip at controlnet.py:391-409).
This module maps those names onto the functional pytrees of
models/{unet,vae,clip,controlnet}.py with the layout conversions:

  torch conv [O, I, kh, kw] -> HWIO [kh, kw, I, O]
  torch linear [O, I]       -> [I, O]
  norm weight/bias          -> scale/bias

Inputs are dicts of numpy arrays (use ``load_state_dict`` for files);
no torch required at port time.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..models.clip import CLIPTextConfig
from ..models.unet import UNetConfig
from ..models.vae import VAEConfig

Array = np.ndarray
StateDict = Dict[str, Array]


def load_state_dict(path: str) -> StateDict:
    """Load .safetensors (preferred) or torch .ckpt into numpy arrays,
    unwrapping a nested 'state_dict' (guided_ldm.py:228-241)."""
    if path.endswith(".safetensors") or path.endswith(".safetensor"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x), jnp.float32)


class _Reader:
    """Prefix-scoped reader that records missing/used keys."""

    def __init__(self, sd: StateDict, prefix: str):
        self.sd = sd
        self.prefix = prefix
        self.missing: list = []
        self.used: set = set()

    def __call__(self, name: str) -> Optional[Array]:
        key = self.prefix + name
        if key not in self.sd:
            self.missing.append(key)
            return None
        self.used.add(key)
        return self.sd[key]

    def has(self, name: str) -> bool:
        return self.prefix + name in self.sd

    def conv(self, name: str) -> dict:
        w = self(name + ".weight")
        p = {"w": _f32(np.transpose(w, (2, 3, 1, 0)))} if w is not None \
            else {"w": None}
        b = self(name + ".bias")
        if b is not None:
            p["b"] = _f32(b)
        return p

    def linear(self, name: str, bias: bool = True) -> dict:
        w = self(name + ".weight")
        p = {"w": _f32(np.transpose(w))} if w is not None else {"w": None}
        if bias:
            b = self(name + ".bias")
            if b is not None:
                p["b"] = _f32(b)
        return p

    def norm(self, name: str) -> dict:
        return {"scale": _f32(self(name + ".weight")),
                "bias": _f32(self(name + ".bias"))}


# ---------------------------------------------------------------------------
# UNet (model.diffusion_model.*)
# ---------------------------------------------------------------------------

def _port_resblock(r: _Reader, base: str) -> dict:
    p = {
        "in_norm": r.norm(f"{base}.in_layers.0"),
        "in_conv": r.conv(f"{base}.in_layers.2"),
        "emb_lin": r.linear(f"{base}.emb_layers.1"),
        "out_norm": r.norm(f"{base}.out_layers.0"),
        "out_conv": r.conv(f"{base}.out_layers.3"),
    }
    if r.has(f"{base}.skip_connection.weight"):
        p["skip"] = r.conv(f"{base}.skip_connection")
    return p


def _port_transformer(r: _Reader, base: str, depth: int) -> dict:
    p = {
        "norm": r.norm(f"{base}.norm"),
        "proj_in": r.conv(f"{base}.proj_in"),
        "proj_out": r.conv(f"{base}.proj_out"),
        "blocks": [],
    }
    for d in range(depth):
        tb = f"{base}.transformer_blocks.{d}"
        p["blocks"].append({
            "norm1": r.norm(f"{tb}.norm1"),
            "attn1": {
                "to_q": r.linear(f"{tb}.attn1.to_q", bias=False),
                "to_k": r.linear(f"{tb}.attn1.to_k", bias=False),
                "to_v": r.linear(f"{tb}.attn1.to_v", bias=False),
                "to_out": r.linear(f"{tb}.attn1.to_out.0"),
            },
            "norm2": r.norm(f"{tb}.norm2"),
            "attn2": {
                "to_q": r.linear(f"{tb}.attn2.to_q", bias=False),
                "to_k": r.linear(f"{tb}.attn2.to_k", bias=False),
                "to_v": r.linear(f"{tb}.attn2.to_v", bias=False),
                "to_out": r.linear(f"{tb}.attn2.to_out.0"),
            },
            "norm3": r.norm(f"{tb}.norm3"),
            "ff_proj": r.linear(f"{tb}.ff.net.0.proj"),
            "ff_out": r.linear(f"{tb}.ff.net.2"),
        })
    return p


def port_unet(sd: StateDict, cfg: UNetConfig = UNetConfig(),
              prefix: str = "model.diffusion_model.") -> tuple:
    """Returns (params, missing_keys)."""
    r = _Reader(sd, prefix)
    params: dict = {
        "time_embed": [r.linear("time_embed.0"), r.linear("time_embed.2")],
    }

    input_blocks = [{"conv": r.conv("input_blocks.0.0")}]
    idx = 1
    ds = 1
    for lvl in range(len(cfg.channel_mult)):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _port_resblock(r, f"input_blocks.{idx}.0")}
            if ds in cfg.attention_resolutions:
                blk["transformer"] = _port_transformer(
                    r, f"input_blocks.{idx}.1", cfg.transformer_depth)
            input_blocks.append(blk)
            idx += 1
        if lvl != len(cfg.channel_mult) - 1:
            input_blocks.append({"down": r.conv(f"input_blocks.{idx}.0.op")})
            idx += 1
            ds *= 2
    params["input_blocks"] = input_blocks

    params["middle"] = {
        "res1": _port_resblock(r, "middle_block.0"),
        "transformer": _port_transformer(r, "middle_block.1",
                                         cfg.transformer_depth),
        "res2": _port_resblock(r, "middle_block.2"),
    }

    output_blocks = []
    for i, (lvl, _mult) in enumerate(
            [(l, m) for l, m in reversed(list(enumerate(cfg.channel_mult)))
             for _ in range(cfg.num_res_blocks + 1)]):
        blk = {"res": _port_resblock(r, f"output_blocks.{i}.0")}
        sub = 1
        if ds in cfg.attention_resolutions:
            blk["transformer"] = _port_transformer(
                r, f"output_blocks.{i}.{sub}", cfg.transformer_depth)
            sub += 1
        is_last_of_level = (i % (cfg.num_res_blocks + 1)
                            == cfg.num_res_blocks)
        if lvl != 0 and is_last_of_level:
            blk["up"] = r.conv(f"output_blocks.{i}.{sub}.conv")
            ds //= 2
        output_blocks.append(blk)
    params["output_blocks"] = output_blocks

    params["out"] = {"norm": r.norm("out.0"), "conv": r.conv("out.2")}
    return params, r.missing


# ---------------------------------------------------------------------------
# VAE (first_stage_model.*)
# ---------------------------------------------------------------------------

def _port_vae_res(r: _Reader, base: str) -> dict:
    p = {
        "norm1": r.norm(f"{base}.norm1"),
        "conv1": r.conv(f"{base}.conv1"),
        "norm2": r.norm(f"{base}.norm2"),
        "conv2": r.conv(f"{base}.conv2"),
    }
    if r.has(f"{base}.nin_shortcut.weight"):
        p["nin_shortcut"] = r.conv(f"{base}.nin_shortcut")
    return p


def _port_vae_attn(r: _Reader, base: str) -> dict:
    return {
        "norm": r.norm(f"{base}.norm"),
        "q": r.conv(f"{base}.q"),
        "k": r.conv(f"{base}.k"),
        "v": r.conv(f"{base}.v"),
        "proj_out": r.conv(f"{base}.proj_out"),
    }


def port_vae(sd: StateDict, cfg: VAEConfig = VAEConfig(),
             prefix: str = "first_stage_model.") -> tuple:
    r = _Reader(sd, prefix)
    n_lvl = len(cfg.ch_mult)

    enc: dict = {"conv_in": r.conv("encoder.conv_in"), "down": []}
    for lvl in range(n_lvl):
        lp = {"blocks": [
            _port_vae_res(r, f"encoder.down.{lvl}.block.{b}")
            for b in range(cfg.num_res_blocks)]}
        if lvl != n_lvl - 1:
            lp["downsample"] = r.conv(f"encoder.down.{lvl}.downsample.conv")
        enc["down"].append(lp)
    enc["mid"] = {
        "block_1": _port_vae_res(r, "encoder.mid.block_1"),
        "attn_1": _port_vae_attn(r, "encoder.mid.attn_1"),
        "block_2": _port_vae_res(r, "encoder.mid.block_2"),
    }
    enc["norm_out"] = r.norm("encoder.norm_out")
    enc["conv_out"] = r.conv("encoder.conv_out")

    dec: dict = {"conv_in": r.conv("decoder.conv_in")}
    dec["mid"] = {
        "block_1": _port_vae_res(r, "decoder.mid.block_1"),
        "attn_1": _port_vae_attn(r, "decoder.mid.attn_1"),
        "block_2": _port_vae_res(r, "decoder.mid.block_2"),
    }
    ups = []
    # our decoder stores levels coarsest->finest; torch names them by
    # level index (finest = 0) and runs them reversed (model.py:546-653)
    for lvl in reversed(range(n_lvl)):
        lp = {"blocks": [
            _port_vae_res(r, f"decoder.up.{lvl}.block.{b}")
            for b in range(cfg.num_res_blocks + 1)]}
        if lvl != 0:
            lp["upsample"] = r.conv(f"decoder.up.{lvl}.upsample.conv")
        ups.append(lp)
    dec["up"] = ups
    dec["norm_out"] = r.norm("decoder.norm_out")
    dec["conv_out"] = r.conv("decoder.conv_out")

    params = {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": r.conv("quant_conv"),
        "post_quant_conv": r.conv("post_quant_conv"),
    }
    return params, r.missing


# ---------------------------------------------------------------------------
# CLIP text encoder (cond_stage_model.transformer.text_model.*)
# ---------------------------------------------------------------------------

def port_clip_text(sd: StateDict, cfg: CLIPTextConfig = CLIPTextConfig(),
                   prefix: str = "cond_stage_model.transformer.text_model."
                   ) -> tuple:
    r = _Reader(sd, prefix)
    params: dict = {
        "token_embedding": _f32(r("embeddings.token_embedding.weight")),
        "position_embedding": _f32(
            r("embeddings.position_embedding.weight")),
        "final_ln": r.norm("final_layer_norm"),
        "layers": [],
    }
    for i in range(cfg.layers):
        base = f"encoder.layers.{i}"
        params["layers"].append({
            "ln1": r.norm(f"{base}.layer_norm1"),
            "q": r.linear(f"{base}.self_attn.q_proj"),
            "k": r.linear(f"{base}.self_attn.k_proj"),
            "v": r.linear(f"{base}.self_attn.v_proj"),
            "attn_out": r.linear(f"{base}.self_attn.out_proj"),
            "ln2": r.norm(f"{base}.layer_norm2"),
            "mlp_in": r.linear(f"{base}.mlp.fc1"),
            "mlp_out": r.linear(f"{base}.mlp.fc2"),
        })
    return params, r.missing


# ---------------------------------------------------------------------------
# ControlNet (control_model.* after prefix strip, controlnet.py:391-409)
# ---------------------------------------------------------------------------

def port_controlnet(sd: StateDict, cfg: UNetConfig = UNetConfig(),
                    prefix: str = "control_model.") -> tuple:
    # tolerate both prefixed and pre-stripped dicts
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    r = _Reader(sd, prefix)
    params: dict = {
        "time_embed": [r.linear("time_embed.0"), r.linear("time_embed.2")],
    }
    input_blocks = [{"conv": r.conv("input_blocks.0.0")}]
    zero_convs = [r.conv("zero_convs.0.0")]
    idx = 1
    ds = 1
    for lvl in range(len(cfg.channel_mult)):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _port_resblock(r, f"input_blocks.{idx}.0")}
            if ds in cfg.attention_resolutions:
                blk["transformer"] = _port_transformer(
                    r, f"input_blocks.{idx}.1", cfg.transformer_depth)
            input_blocks.append(blk)
            zero_convs.append(r.conv(f"zero_convs.{idx}.0"))
            idx += 1
        if lvl != len(cfg.channel_mult) - 1:
            input_blocks.append({"down": r.conv(f"input_blocks.{idx}.0.op")})
            zero_convs.append(r.conv(f"zero_convs.{idx}.0"))
            idx += 1
            ds *= 2
    params["input_blocks"] = input_blocks
    params["zero_convs"] = zero_convs
    params["middle"] = {
        "res1": _port_resblock(r, "middle_block.0"),
        "transformer": _port_transformer(r, "middle_block.1",
                                         cfg.transformer_depth),
        "res2": _port_resblock(r, "middle_block.2"),
    }
    params["middle_out"] = r.conv("middle_block_out.0")
    params["hint"] = [r.conv(f"input_hint_block.{j}")
                      for j in (0, 2, 4, 6, 8, 10, 12)]
    params["hint_out"] = r.conv("input_hint_block.14")
    return params, r.missing


# ---------------------------------------------------------------------------
# RAFT (raft-things.pth, 'module.'-prefixed DataParallel keys, ofgen.py:67)
# ---------------------------------------------------------------------------

def _port_raft_bn(r: _Reader, base: str) -> dict:
    return {"scale": _f32(r(f"{base}.weight")),
            "bias": _f32(r(f"{base}.bias")),
            "mean": _f32(r(f"{base}.running_mean")),
            "var": _f32(r(f"{base}.running_var"))}


def _port_raft_unit(r: _Reader, base: str, norm: str, stride: int) -> dict:
    p = {"conv1": r.conv(f"{base}.conv1"), "conv2": r.conv(f"{base}.conv2")}
    if norm == "batch":
        p["norm1"] = _port_raft_bn(r, f"{base}.norm1")
        p["norm2"] = _port_raft_bn(r, f"{base}.norm2")
    if stride != 1:
        p["down"] = r.conv(f"{base}.downsample.0")
        if norm == "batch":
            p["norm3"] = _port_raft_bn(r, f"{base}.downsample.1")
    return p


def _port_raft_encoder(r: _Reader, base: str, norm: str) -> dict:
    p = {"conv1": r.conv(f"{base}.conv1")}
    if norm == "batch":
        p["norm1"] = _port_raft_bn(r, f"{base}.norm1")
    layers = []
    for li, stride in ((1, 1), (2, 2), (3, 2)):
        layers.append([
            _port_raft_unit(r, f"{base}.layer{li}.0", norm, stride),
            _port_raft_unit(r, f"{base}.layer{li}.1", norm, 1)])
    p["layers"] = layers
    p["conv2"] = r.conv(f"{base}.conv2")
    return p


def port_raft(sd: StateDict, prefix: str = "module.") -> tuple:
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""
    r = _Reader(sd, prefix)
    params = {
        "fnet": _port_raft_encoder(r, "fnet", "instance"),
        "cnet": _port_raft_encoder(r, "cnet", "batch"),
        "update": {
            "encoder": {n: r.conv(f"update_block.encoder.{n}")
                        for n in ("convc1", "convc2", "convf1", "convf2",
                                  "conv")},
            "gru": {n: r.conv(f"update_block.gru.{n}")
                    for n in ("convz1", "convr1", "convq1",
                              "convz2", "convr2", "convq2")},
            "flow_head": {"conv1": r.conv("update_block.flow_head.conv1"),
                          "conv2": r.conv("update_block.flow_head.conv2")},
            "mask": {"conv1": r.conv("update_block.mask.0"),
                     "conv2": r.conv("update_block.mask.2")},
        },
    }
    return params, r.missing


# ---------------------------------------------------------------------------
# VQ first stage (first_stage_model.* with quantize.embedding)
# ---------------------------------------------------------------------------

def port_vq(sd: StateDict, cfg=None, prefix: str = "first_stage_model."
            ) -> tuple:
    """Port a VQModel first stage (reference: ldm/models/autoencoder.py:
    12-123 key scheme — the KL layout plus ``quantize.embedding.weight``).

    cfg: models.vq.VQConfig (backbone drives the encoder/decoder walk).
    """
    from ..models.vq import VQConfig
    cfg = cfg or VQConfig()
    params, missing = port_vae(sd, cfg.backbone, prefix)
    r = _Reader(sd, prefix)
    emb = r("quantize.embedding.weight")
    params["quantize"] = {"embedding": _f32(emb) if emb is not None
                          else None}
    return params, missing + r.missing


# ---------------------------------------------------------------------------
# T5 encoder (HF t5-v1_1 naming; FrozenT5Embedder checkpoints)
# ---------------------------------------------------------------------------

def port_t5_encoder(sd: StateDict, cfg=None, prefix: str = "") -> tuple:
    """Port a HuggingFace T5EncoderModel state dict (the reference's
    FrozenT5Embedder loads google/t5-v1_1-*; ldm/modules/encoders/
    modules.py:58-86) into models/text_encoders.t5_encoder_apply params.

    cfg: models.text_encoders.T5Config (drives the layer walk).
    """
    from ..models.text_encoders import T5Config
    cfg = cfg or T5Config()
    r = _Reader(sd, prefix)
    p = {
        "token_embedding": _f32(r("shared.weight")),
        "rel_bias": _f32(r("encoder.block.0.layer.0.SelfAttention."
                           "relative_attention_bias.weight")),
        "final_norm": _f32(r("encoder.final_layer_norm.weight")),
        "layers": [],
    }
    for i in range(cfg.layers):
        base = f"encoder.block.{i}"
        p["layers"].append({
            "norm1": _f32(r(f"{base}.layer.0.layer_norm.weight")),
            "q": r.linear(f"{base}.layer.0.SelfAttention.q", bias=False),
            "k": r.linear(f"{base}.layer.0.SelfAttention.k", bias=False),
            "v": r.linear(f"{base}.layer.0.SelfAttention.v", bias=False),
            "o": r.linear(f"{base}.layer.0.SelfAttention.o", bias=False),
            "norm2": _f32(r(f"{base}.layer.1.layer_norm.weight")),
            "wi0": r.linear(f"{base}.layer.1.DenseReluDense.wi_0",
                            bias=False),
            "wi1": r.linear(f"{base}.layer.1.DenseReluDense.wi_1",
                            bias=False),
            "wo": r.linear(f"{base}.layer.1.DenseReluDense.wo",
                           bias=False),
        })
    return p, r.missing


# ---------------------------------------------------------------------------
# OpenCLIP-style text tower (HF CLIPTextModel naming)
# ---------------------------------------------------------------------------

def port_openclip_text(sd: StateDict, cfg=None,
                       prefix: str = "text_model.") -> tuple:
    """Port an HF-CLIP-layout text tower into
    models/text_encoders.openclip_text_apply params (the SD-2.x
    FrozenOpenCLIPEmbedder surface; erf-GELU blocks, penultimate mode is
    an apply-time flag)."""
    from ..models.text_encoders import OpenCLIPTextConfig
    cfg = cfg or OpenCLIPTextConfig()
    r = _Reader(sd, prefix)
    p = {
        "token_embedding": _f32(r("embeddings.token_embedding.weight")),
        "position_embedding":
            _f32(r("embeddings.position_embedding.weight")),
        "ln_final": r.norm("final_layer_norm"),
        "layers": [],
    }
    for i in range(cfg.layers):
        base = f"encoder.layers.{i}"
        p["layers"].append({
            "ln1": r.norm(f"{base}.layer_norm1"),
            "q": r.linear(f"{base}.self_attn.q_proj"),
            "k": r.linear(f"{base}.self_attn.k_proj"),
            "v": r.linear(f"{base}.self_attn.v_proj"),
            "attn_out": r.linear(f"{base}.self_attn.out_proj"),
            "ln2": r.norm(f"{base}.layer_norm2"),
            "mlp_in": r.linear(f"{base}.mlp.fc1"),
            "mlp_out": r.linear(f"{base}.mlp.fc2"),
        })
    return p, r.missing


# ---------------------------------------------------------------------------
# make_it_fit: cyclic-tiling shape adaptation of old checkpoints
# ---------------------------------------------------------------------------

def fit_tensor(old: Array, new_shape: tuple) -> Array:
    """Adapt one checkpoint tensor to ``new_shape`` by cyclic tiling of the
    first two axes, with input-axis usage renormalization — the
    ``make_it_fit`` loader semantics (ddpm.py:219-262). Used e.g. to load
    a 4-channel SD UNet input conv into a 9-channel inpainting UNet.

    Rank-1: out[i] = old[i % o0].
    Rank>=2 (trailing axes must match): out[i, j] = old[i%o0, j%o1],
    then each column j is divided by (1 + #{j' < new1 : j' % o1 == j % o1})
    — the reference seeds its usage counter at ones (ddpm.py:245-251),
    so the divisor is occurrence-count + 1; preserved bit-for-bit.
    """
    old = np.asarray(old)
    new_shape = tuple(new_shape)
    if old.shape == new_shape:
        return old
    assert len(old.shape) == len(new_shape), (old.shape, new_shape)
    if len(new_shape) > 2:
        assert new_shape[2:] == old.shape[2:], (old.shape, new_shape)
    if len(new_shape) == 1:
        return old[np.arange(new_shape[0]) % old.shape[0]]
    rows = np.arange(new_shape[0]) % old.shape[0]
    cols = np.arange(new_shape[1]) % old.shape[1]
    new = old[rows][:, cols]
    n_used_old = np.ones(old.shape[1], old.dtype)
    np.add.at(n_used_old, cols, 1)
    n_used = n_used_old[cols].reshape((1, -1) + (1,) * (len(new_shape) - 2))
    return new / n_used


def fit_state_dict(sd: StateDict, target_shapes: Dict[str, tuple],
                   verbose: bool = False) -> StateDict:
    """Apply ``fit_tensor`` to every checkpoint entry whose target shape
    differs (the make_it_fit pass over named parameters, ddpm.py:219-262).
    Entries absent from ``target_shapes`` pass through unchanged."""
    out = {}
    for k, v in sd.items():
        tgt = target_shapes.get(k)
        if tgt is not None and tuple(np.asarray(v).shape) != tuple(tgt):
            if verbose:
                print(f"fit_state_dict: {k} {np.asarray(v).shape} -> {tgt}")
            out[k] = fit_tensor(v, tgt)
        else:
            out[k] = v
    return out
