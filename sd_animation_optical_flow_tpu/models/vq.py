"""VQ first stage (VQModel / VQModelInterface parity) — functional JAX.

Capabilities-parity with the reference's legacy VQ first stage
(reference: ldm/models/autoencoder.py:12-278): Encoder -> quant_conv ->
vector-quantize against an ``n_embed x embed_dim`` codebook (beta=0.25
commitment) -> post_quant_conv -> Decoder.  ``VQModelInterface`` behavior
(encode returns pre-quant ``h``; decode optionally quantizes first,
autoencoder.py:252-278) is the ``quantize=`` flag on :func:`vq_decode`.

TPU-first: the nearest-codebook search is one big [B*H*W, embed_dim] x
[embed_dim, n_embed] matmul (MXU) instead of a broadcast-subtract
distance tensor; straight-through estimator keeps it trainable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .vae import VAEConfig, decoder_apply, decoder_init, encoder_apply, \
    encoder_init
from .layers import conv2d, conv2d_init


@dataclass(frozen=True)
class VQConfig:
    """Backbone is the same ddconfig as the KL VAE but single-z."""
    backbone: VAEConfig = VAEConfig(double_z=False, scale_factor=1.0)
    n_embed: int = 16384
    embed_dim: int = 4
    beta: float = 0.25


# ---------------------------------------------------------------------------
# vector quantizer
# ---------------------------------------------------------------------------

def quantizer_init(rng, cfg: VQConfig):
    # reference codebook init: U(-1/n, 1/n) (taming VectorQuantizer2)
    bound = 1.0 / cfg.n_embed
    emb = jax.random.uniform(rng, (cfg.n_embed, cfg.embed_dim),
                             jnp.float32, -bound, bound)
    return {"embedding": emb}


def quantize(qp, cfg: VQConfig, z):
    """z [B,H,W,embed_dim] -> (z_q, loss, indices [B,H,W]).

    Nearest-codebook assignment via the expanded squared distance
    ||z||^2 - 2 z.e + ||e||^2; the cross term is a single MXU matmul.
    Straight-through gradient: z_q = z + sg(z_q - z).
    """
    emb = qp["embedding"].astype(jnp.float32)
    zf = z.astype(jnp.float32)
    flat = zf.reshape(-1, zf.shape[-1])                     # [N, D]
    cross = flat @ emb.T                                    # [N, n_embed]
    d = (jnp.sum(flat * flat, axis=-1, keepdims=True)
         - 2.0 * cross + jnp.sum(emb * emb, axis=-1)[None, :])
    idx = jnp.argmin(d, axis=-1)                            # [N]
    z_q = emb[idx].reshape(zf.shape)
    # commitment + codebook loss (beta weights the encoder side)
    loss = (cfg.beta * jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2)
            + jnp.mean((z_q - jax.lax.stop_gradient(zf)) ** 2))
    z_q = zf + jax.lax.stop_gradient(z_q - zf)              # straight-through
    return (z_q.astype(z.dtype), loss,
            idx.reshape(z.shape[:-1]))


def embed_code(qp, code, dtype=jnp.float32):
    """codes [B,H,W] -> codebook vectors [B,H,W,embed_dim]
    (reference decode_code path, autoencoder.py:120-123)."""
    return qp["embedding"][code].astype(dtype)


# ---------------------------------------------------------------------------
# VQModel facade
# ---------------------------------------------------------------------------

def vq_init(rng, cfg: VQConfig = VQConfig()):
    k = jax.random.split(rng, 5)
    bb = cfg.backbone
    return {
        "encoder": encoder_init(k[0], bb),
        "decoder": decoder_init(k[1], bb),
        "quant_conv": conv2d_init(k[2], bb.z_channels, cfg.embed_dim, 1),
        "post_quant_conv": conv2d_init(k[3], cfg.embed_dim, bb.z_channels, 1),
        "quantize": quantizer_init(k[4], cfg),
    }


def vq_encode_prequant(params, cfg: VQConfig, x):
    """Image -> pre-quantization continuous latent ``h`` — the
    VQModelInterface.encode contract (autoencoder.py:256-259)."""
    h = encoder_apply(params["encoder"], cfg.backbone, x)
    return conv2d(params["quant_conv"], h)


def vq_encode(params, cfg: VQConfig, x):
    """Image -> (quantized latent, emb loss, indices) (VQModel.encode)."""
    h = vq_encode_prequant(params, cfg, x)
    return quantize(params["quantize"], cfg, h)


def vq_decode(params, cfg: VQConfig, h, *, quantize_first: bool = True):
    """Latent -> image.  ``quantize_first=False`` reproduces
    VQModelInterface.decode(force_not_quantize=True)
    (autoencoder.py:261-270)."""
    if quantize_first:
        h, _, _ = quantize(params["quantize"], cfg, h)
    z = conv2d(params["post_quant_conv"], h)
    return decoder_apply(params["decoder"], cfg.backbone, z)


def vq_decode_code(params, cfg: VQConfig, code, dtype=jnp.float32):
    """Index map [B,H,W] -> image (VQModel.decode_code)."""
    quant = embed_code(params["quantize"], code, dtype)
    return vq_decode(params, cfg, quant, quantize_first=False)
