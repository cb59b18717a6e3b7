"""Alternative conditioning text encoders: OpenCLIP and T5.

Capabilities-parity with the reference's unused-but-present encoder
variants (reference: ldm/modules/encoders/modules.py:58-86
FrozenT5Embedder, :134-190 FrozenOpenCLIPEmbedder, :192-213
FrozenCLIPT5Encoder). The SD-1.5 configs only use FrozenCLIPEmbedder
(models/clip.py); these exist so SD-2.x-style configs (OpenCLIP
penultimate layer) and T5-conditioned configs are loadable.

TPU-first functional style: ``*_init(rng, cfg) -> params`` pytrees and
pure ``*_apply``; fp32 softmax statistics; all shapes static.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (gelu, layer_norm, linear, linear_init, norm_init,
                     normal_init_array)


# ---------------------------------------------------------------------------
# OpenCLIP text tower (FrozenOpenCLIPEmbedder, modules.py:134-190)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class OpenCLIPTextConfig:
    """Defaults are the ViT-H/14 text tower the reference loads
    (modules.py:141: arch='ViT-H-14', layer='penultimate')."""
    vocab_size: int = 49408
    max_position: int = 77
    width: int = 1024
    layers: int = 24
    heads: int = 16
    penultimate: bool = True    # layer='penultimate' (modules.py:148-153)


def openclip_text_init(rng, cfg: OpenCLIPTextConfig = OpenCLIPTextConfig()):
    rngs = iter(jax.random.split(rng, 8 * cfg.layers + 8))
    p = {
        "token_embedding": normal_init_array(
            next(rngs), (cfg.vocab_size, cfg.width), 0.02),
        "position_embedding": normal_init_array(
            next(rngs), (cfg.max_position, cfg.width), 0.01),
        "ln_final": norm_init(cfg.width),
        "layers": [],
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "ln1": norm_init(cfg.width),
            "q": linear_init(next(rngs), cfg.width, cfg.width),
            "k": linear_init(next(rngs), cfg.width, cfg.width),
            "v": linear_init(next(rngs), cfg.width, cfg.width),
            "attn_out": linear_init(next(rngs), cfg.width, cfg.width),
            "ln2": norm_init(cfg.width),
            "mlp_in": linear_init(next(rngs), cfg.width, cfg.width * 4),
            "mlp_out": linear_init(next(rngs), cfg.width * 4, cfg.width),
        })
    return p


def _causal_self_attn(lp, x, heads):
    b, n, c = x.shape
    d = c // heads
    q = linear(lp["q"], x).reshape(b, n, heads, d)
    k = linear(lp["k"], x).reshape(b, n, heads, d)
    v = linear(lp["v"], x).reshape(b, n, heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(d)))
    mask = jnp.triu(jnp.full((n, n), -1e9, jnp.float32), k=1)
    w = jax.nn.softmax(scores + mask, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, c)
    return linear(lp["attn_out"], out)


def openclip_text_apply(params, cfg: OpenCLIPTextConfig, token_ids,
                        *, dtype=jnp.float32):
    """token_ids [B, 77] -> hidden states [B, 77, width].

    OpenCLIP blocks use plain (erf) GELU, unlike OpenAI CLIP's
    quick-GELU. ``penultimate`` stops one block early — the reference's
    ``layer_idx=1`` / truncated-forward trick (modules.py:170-190).
    """
    x = params["token_embedding"][token_ids].astype(dtype)
    x = x + params["position_embedding"][None, : x.shape[1]].astype(dtype)
    n_run = cfg.layers - (1 if cfg.penultimate else 0)
    for lp in params["layers"][:n_run]:
        x = x + _causal_self_attn(lp, layer_norm(lp["ln1"], x), cfg.heads)
        x = x + linear(lp["mlp_out"],
                       gelu(linear(lp["mlp_in"], layer_norm(lp["ln2"], x))))
    return layer_norm(params["ln_final"], x)


# ---------------------------------------------------------------------------
# T5 encoder (FrozenT5Embedder, modules.py:58-86)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class T5Config:
    """Defaults are google/t5-v1_1-large, the reference's checkpoint
    (modules.py:60): gated-GELU FF, no biases, RMSNorm, relative
    position bias shared from block 0."""
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    heads: int = 16
    layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6


def _rms_norm(scale, x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


def t5_relative_buckets(n: int, num_buckets: int, max_distance: int):
    """Bidirectional T5 relative-position bucketing, precomputed on host
    (static sequence lengths under jit)."""
    pos = np.arange(n)
    rel = pos[None, :] - pos[:, None]                 # key - query
    nb = num_buckets // 2
    out = np.where(rel > 0, nb, 0)
    arel = np.abs(rel)
    max_exact = nb // 2
    is_small = arel < max_exact
    log_big = max_exact + (
        np.log(np.maximum(arel, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    log_big = np.minimum(log_big, nb - 1)
    out = out + np.where(is_small, arel, log_big)
    return jnp.asarray(out, jnp.int32)                # [n, n]


def t5_encoder_init(rng, cfg: T5Config = T5Config()):
    rngs = iter(jax.random.split(rng, 8 * cfg.layers + 8))
    inner = cfg.heads * cfg.d_kv
    p = {
        "token_embedding": normal_init_array(
            next(rngs), (cfg.vocab_size, cfg.d_model)),
        "rel_bias": normal_init_array(
            next(rngs), (cfg.rel_buckets, cfg.heads), 0.02),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "layers": [],
    }
    nb = lambda i, o: linear_init(next(rngs), i, o, bias=False)
    for _ in range(cfg.layers):
        p["layers"].append({
            "norm1": jnp.ones((cfg.d_model,), jnp.float32),
            "q": nb(cfg.d_model, inner),
            "k": nb(cfg.d_model, inner),
            "v": nb(cfg.d_model, inner),
            "o": nb(inner, cfg.d_model),
            "norm2": jnp.ones((cfg.d_model,), jnp.float32),
            "wi0": nb(cfg.d_model, cfg.d_ff),   # gate (gelu)
            "wi1": nb(cfg.d_model, cfg.d_ff),   # linear
            "wo": nb(cfg.d_ff, cfg.d_model),
        })
    return p


def t5_encoder_apply(params, cfg: T5Config, token_ids, mask=None,
                     *, dtype=jnp.float32):
    """token_ids [B, N] (+ optional [B, N] 1/0 mask) -> [B, N, d_model].

    T5 quirks preserved: queries are NOT scaled by 1/sqrt(d) (folded
    into the checkpoint weights), bias-free linears, pre-RMSNorm.
    """
    b, n = token_ids.shape
    x = params["token_embedding"][token_ids].astype(dtype)
    buckets = t5_relative_buckets(n, cfg.rel_buckets, cfg.rel_max_distance)
    pos_bias = params["rel_bias"][buckets]            # [n, n, H]
    pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # [1, H, n, n]
    if mask is not None:
        pos_bias = pos_bias + jnp.where(
            mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

    for lp in params["layers"]:
        h = _rms_norm(lp["norm1"], x, cfg.eps)
        q = linear(lp["q"], h).reshape(b, n, cfg.heads, cfg.d_kv)
        k = linear(lp["k"], h).reshape(b, n, cfg.heads, cfg.d_kv)
        v = linear(lp["v"], h).reshape(b, n, cfg.heads, cfg.d_kv)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(scores + pos_bias, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, -1)
        x = x + linear(lp["o"], attn)
        h = _rms_norm(lp["norm2"], x, cfg.eps)
        # T5 v1.1 gated-gelu uses the tanh approximation ('gelu_new')
        gate = jax.nn.gelu(linear(lp["wi0"], h), approximate=True)
        x = x + linear(lp["wo"], gate * linear(lp["wi1"], h))
    return _rms_norm(params["final_norm"], x, cfg.eps)


# ---------------------------------------------------------------------------
# CLIP+T5 combo (FrozenCLIPT5Encoder, modules.py:192-213)
# ---------------------------------------------------------------------------

def clip_t5_encode(clip_fn, t5_fn):
    """The reference returns ``[clip_z, t5_z]`` as a list of contexts
    (modules.py:209-213); callers decide how to consume them."""
    def encode(*args, **kwargs):
        return [clip_fn(*args, **kwargs), t5_fn(*args, **kwargs)]
    return encode
