"""CLIP ViT-L/14 text encoder + chunked long-prompt encoding.

Rebuilds the conditioning stage of the reference
(reference: ldm/modules/encoders/modules.py:88-131) including the
runtime-patched 3x77-token chunked forward that makes booru-tag prompts
longer than 77 CLIP tokens work (reference: hack.py:32-70): the prompt is
split into three 75-token chunks, each wrapped BOS/EOS and padded to 77,
encoded as a batch of 3, and re-concatenated to a [B, 231, 768] context.

The transformer is the standard CLIP text tower: 12 layers, width 768,
12 heads, causal mask, quick-GELU. ``clip_skip`` mirrors hack.py:43-47
(skip>1 -> take hidden state -skip and apply the final layer norm).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .layers import (layer_norm, linear, linear_init, norm_init,
                     normal_init_array)

BOS_TOKEN = 49406
EOS_TOKEN = 49407
PAD_TOKEN = 49407   # CLIP's pad == eos for the SD-1.5 tokenizer
CHUNK_LEN = 77
NUM_CHUNKS = 3
CONTEXT_LEN = NUM_CHUNKS * CHUNK_LEN   # 231


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_position: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_text_init(rng, cfg: CLIPTextConfig = CLIPTextConfig()):
    rngs = iter(jax.random.split(rng, 8 * cfg.layers + 8))
    p = {
        "token_embedding": normal_init_array(
            next(rngs), (cfg.vocab_size, cfg.width), 0.02),
        "position_embedding": normal_init_array(
            next(rngs), (cfg.max_position, cfg.width), 0.01),
        "final_ln": norm_init(cfg.width),
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


def _causal_attn(lp, x, heads):
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


def clip_text_apply(params, cfg: CLIPTextConfig, token_ids,
                    *, clip_skip: int = 0, dtype=jnp.float32):
    """token_ids [B, 77] int32 -> hidden states [B, 77, width]."""
    x = params["token_embedding"][token_ids].astype(dtype)
    x = x + params["position_embedding"][None, : x.shape[1]].astype(dtype)
    hiddens = [x]
    for lp in params["layers"]:
        x = x + _causal_attn(lp, layer_norm(lp["ln1"], x), cfg.heads)
        x = x + linear(lp["mlp_out"],
                       _quick_gelu(linear(lp["mlp_in"],
                                          layer_norm(lp["ln2"], x))))
        hiddens.append(x)
    if clip_skip > 1:
        x = hiddens[-clip_skip]
    return layer_norm(params["final_ln"], x)


# ---------------------------------------------------------------------------
# chunked long-prompt encoding (the hack.py contract)
# ---------------------------------------------------------------------------

def chunk_token_ids(raw_ids):
    """raw_ids: list[int] without special tokens -> [3, 77] int array.

    Matches hack.py:49-62: 3 chunks of up to 75 tokens, each wrapped
    [BOS] + chunk + [EOS], padded with PAD to 77 (overflow truncated).
    """
    chunks = []
    for i in range(NUM_CHUNKS):
        part = list(raw_ids[75 * i: 75 * (i + 1)])
        part = [BOS_TOKEN] + part + [EOS_TOKEN]
        part = part[:CHUNK_LEN] + [PAD_TOKEN] * (CHUNK_LEN - len(part))
        chunks.append(part)
    import numpy as np
    return np.asarray(chunks, dtype=np.int32)


def encode_chunked(params, cfg: CLIPTextConfig, chunked_ids,
                   *, clip_skip: int = 0, dtype=jnp.float32):
    """chunked_ids [B, 3, 77] -> context [B, 231, width] (hack.py:64-70)."""
    b = chunked_ids.shape[0]
    flat = chunked_ids.reshape(b * NUM_CHUNKS, CHUNK_LEN)
    y = clip_text_apply(params, cfg, flat, clip_skip=clip_skip, dtype=dtype)
    return y.reshape(b, NUM_CHUNKS * CHUNK_LEN, -1)
