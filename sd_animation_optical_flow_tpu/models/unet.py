"""SD-1.5 UNet — functional JAX/NHWC rebuild with explicit K/V data flow.

Capability parity with the reference's modified UNet
(reference: ldm/modules/diffusionmodules/openaimodel.py:445-793,
ldm/modules/attention.py:326-537): 320 base channels, mult (1,2,4,4),
2 res blocks/level, spatial transformers at downsample factors 1/2/4,
8 heads, context dim 768, and the cross-frame self-attention K/V
capture + injection the reference threads through every transformer.

TPU-first redesign decisions:
  * K/V flow is functional: ``unet_apply`` returns a tuple of 16 per-layer
    (k, v) pairs and accepts ``ref_kv`` (same static structure, token axis
    possibly multiplied by #references) instead of the reference's
    destructive ``pop(0)`` list mutation (openaimodel.py:85-86) and
    per-call CPU offload (attention.py:353). Everything stays HBM-resident
    and jit/scan-compatible.
  * ControlNet residuals arrive as an explicit 13-tuple (12 encoder +
    1 middle, reference: controlnet.py:50-56).
  * NHWC activations; attention in fp32 softmax (attention.py:176-181).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from .layers import (conv2d, conv2d_init, group_norm, layer_norm, linear,
                     linear_init, norm_init, swish,
                     timestep_embedding, upsample2x_conv,
                     normal_init_array)

# SD-1.5 has 16 spatial transformers: 6 encoder, 1 middle, 9 decoder.
NUM_KV_LAYERS = 16


@dataclass(frozen=True)
class StripConfig:
    """Multi-frame-rendering strip self-attention (the reference's
    forward_mfr band bias, ldm/modules/attention.py:220-324): the latent
    is a width-concatenated strip of ``n_tiles`` frames, and every
    self-attention layer applies an additive Gaussian band attraction
    between spatially-corresponding pixels of different tiles.

    mode 'target': tile 0 (the denoised target) is attracted to the
      reference tiles — the reference's 2x-strip semantics.
    mode 'mutual': all distinct tile pairs attract (seed strips where
      every tile is denoised jointly)."""
    n_tiles: int
    mode: str = "target"


@dataclass(frozen=True)
class SeqParallelConfig:
    """Sequence-parallel self-attention over a device mesh (SURVEY §2.7
    sequence-parallel row; BASELINE config 5). The latent's H (row) axis
    is sharded over ``mesh[axis]``: row-major token flattening keeps the
    token axis contiguously sharded, convs spatially partition via GSPMD
    halo exchange, and every self-attention runs Ulysses-style (one
    all-to-all to a head sharding, full-sequence attention on owned
    heads, all-to-all back — composes with the MFR strip band bias since
    each chip sees the whole sequence). Requires num_heads % mesh[axis]
    == 0."""
    mesh: Any            # jax.sharding.Mesh (hashable)
    axis: str = "sp"


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4           # 9 for the inpainting UNet
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    # class/adm conditioning (openaimodel.py UNetModel num_classes):
    # an int-label embedding added to the time embedding. Used by the
    # upscaling diffusion's noise-level conditioning (ddpm.py:1445-1457).
    num_classes: Optional[int] = None

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4


# ---------------------------------------------------------------------------
# sub-block init
# ---------------------------------------------------------------------------

def _resblock_init(rng, in_ch, out_ch, emb_dim):
    k = jax.random.split(rng, 4)
    p = {
        "in_norm": norm_init(in_ch),
        "in_conv": conv2d_init(k[0], in_ch, out_ch, 3),
        "emb_lin": linear_init(k[1], emb_dim, out_ch),
        "out_norm": norm_init(out_ch),
        "out_conv": conv2d_init(k[2], out_ch, out_ch, 3, zero=True),
    }
    if in_ch != out_ch:
        p["skip"] = conv2d_init(k[3], in_ch, out_ch, 1)
    return p


def _resblock(p, x, emb):
    h = swish(group_norm(p["in_norm"], x))
    h = conv2d(p["in_conv"], h)
    h = h + linear(p["emb_lin"], swish(emb))[:, None, None, :]
    h = swish(group_norm(p["out_norm"], h))
    h = conv2d(p["out_conv"], h)
    if "skip" in p:
        x = conv2d(p["skip"], x)
    return x + h


def _attn_proj_init(rng, dim, context_dim, inner):
    k = jax.random.split(rng, 4)
    return {
        "to_q": linear_init(k[0], dim, inner, bias=False),
        "to_k": linear_init(k[1], context_dim, inner, bias=False),
        "to_v": linear_init(k[2], context_dim, inner, bias=False),
        "to_out": linear_init(k[3], inner, dim),
    }


def _transformer_block_init(rng, dim, n_heads, context_dim):
    k = jax.random.split(rng, 5)
    return {
        "norm1": norm_init(dim),
        "attn1": _attn_proj_init(k[0], dim, dim, dim),
        "norm2": norm_init(dim),
        "attn2": _attn_proj_init(k[1], dim, context_dim, dim),
        "norm3": norm_init(dim),
        "ff_proj": linear_init(k[2], dim, dim * 8),   # GEGLU
        "ff_out": linear_init(k[3], dim * 4, dim),
    }


def _spatial_transformer_init(rng, ch, n_heads, context_dim, depth):
    k = jax.random.split(rng, depth + 3)
    return {
        "norm": norm_init(ch),
        "proj_in": conv2d_init(k[0], ch, ch, 1),
        "blocks": [_transformer_block_init(k[1 + i], ch, n_heads, context_dim)
                   for i in range(depth)],
        "proj_out": conv2d_init(k[depth + 1], ch, ch, 1, zero=True),
    }


# ---------------------------------------------------------------------------
# attention forward with K/V capture / injection
# ---------------------------------------------------------------------------

def _heads(x, n_heads):
    b, n, c = x.shape
    return x.reshape(b, n, n_heads, c // n_heads)


def _merge_heads(x):
    b, n, h, d = x.shape
    return x.reshape(b, n, h * d)


def _fused_ln_route(x) -> bool:
    """Gate for the LN-prologue projection kernels (mirrors _ff_tail's
    conditions): TPU, bf16, small-enough feature dim, enough rows to
    fill the row grid."""
    n_rows = x.shape[0] * x.shape[1] if x.ndim == 3 else x.shape[0]
    return (jax.default_backend() == "tpu" and x.shape[-1] <= 640
            and n_rows >= 4096 and x.dtype == jnp.bfloat16
            and os.environ.get("SDAOF_FUSED_LNPROJ", "1") != "0")


def _self_attention(p, x, n_heads, ref_kv, bias=None, strip=None, hw=None,
                    sp=None, pre_ln=None):
    """Self-attention; returns (out, (k, v)) with k/v of shape [B, N, C]
    (pre-head-split, post-projection) for cross-frame reuse.

    ``pre_ln`` carries the block's norm1 params; on the fused TPU route
    the LayerNorm rides inside the QKV projection kernel (the LN
    reduction is a producer XLA won't fuse into a dot, so standalone it
    costs an HBM round-trip of x per block).

    Injection semantics follow attention.py:358-369: if the reference K/V
    batch matches, it replaces self K/V wholesale; if the current batch is
    2x (CFG uncond|cond stacked), only the cond half attends to the
    reference frames, the uncond half keeps its own K/V.
    """
    # one fused [C, 3C] matmul instead of three [C, C]: wider output
    # tiles keep the MXU busy (measured 2.3x at 6144x320 on v5e); the
    # weight concat is a cheap on-chip copy per step
    if pre_ln is not None and not _fused_ln_route(x):
        x = layer_norm(pre_ln, x)
        pre_ln = None
    wqkv = jnp.concatenate([p["to_q"]["w"], p["to_k"]["w"],
                            p["to_v"]["w"]], axis=1).astype(x.dtype)
    if pre_ln is not None:
        from ..ops.ffn import linear_ln_fused
        qkv = linear_ln_fused(x, wqkv, pre_ln["scale"], pre_ln["bias"],
                              block_m=1024 if x.shape[-1] <= 320 else 512)
    else:
        qkv = x @ wqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    captured = (k, v)

    if sp is not None:
        # Ulysses sequence parallelism: tokens arrive sharded over
        # sp.axis (H-row sharding of the NHWC latent = contiguous token
        # blocks); the strip MFR bias rides inside since each chip sees
        # the full sequence for its heads.
        assert ref_kv is None and bias is None, \
            "sequence-parallel attention does not compose with ref_kv/bias"
        from ..parallel.ring_attention import ulysses_attention
        attn_fn = None
        if strip is not None and strip.n_tiles > 1:
            from ..ops.attention import strip_attention

            def attn_fn(qh, kh, vh):
                return strip_attention(qh, kh, vh, h=hw[0], w_strip=hw[1],
                                       n_tiles=strip.n_tiles,
                                       mode=strip.mode)
        out = ulysses_attention(_heads(q, n_heads), _heads(k, n_heads),
                                _heads(v, n_heads), sp.mesh,
                                seq_axis=sp.axis, attn_fn=attn_fn)
        return linear(p["to_out"], _merge_heads(out)), captured

    if strip is not None and strip.n_tiles > 1:
        # MFR strip band bias (analytic kernel on TPU); exclusive with
        # K/V injection and materialized biases by mode design
        assert ref_kv is None and bias is None, \
            "strip MFR attention does not compose with ref_kv/bias"
        from ..ops.attention import strip_attention
        out = strip_attention(_heads(q, n_heads), _heads(k, n_heads),
                              _heads(v, n_heads), h=hw[0], w_strip=hw[1],
                              n_tiles=strip.n_tiles, mode=strip.mode)
        return linear(p["to_out"], _merge_heads(out)), captured

    if ref_kv is not None:
        rk, rv = ref_kv
        rk = rk.astype(k.dtype)
        rv = rv.astype(v.dtype)
        if rk.shape[0] == x.shape[0]:
            k, v = rk, rv
        else:
            # CFG batch (uncond half keeps own K/V). Pad own K/V along the
            # token axis so both halves have static equal shapes; the
            # duplicated keys in the uncond half are masked out via bias.
            # rk batch 1 broadcasts one reference set over the whole CFG
            # batch; rk batch b//2 carries PER-FRAME reference sets
            # (batched level back-fill: each frame injects its own
            # references' K/V).
            b = x.shape[0]
            nref = rk.shape[1]
            reps = -(-nref // k.shape[1])
            own_k = jnp.tile(k[: b // 2], (1, reps, 1))[:, :nref]
            own_v = jnp.tile(v[: b // 2], (1, reps, 1))[:, :nref]
            rk_b = rk if rk.shape[0] == b // 2 else jnp.tile(rk, (b // 2, 1, 1))
            rv_b = rv if rv.shape[0] == b // 2 else jnp.tile(rv, (b // 2, 1, 1))
            k = jnp.concatenate([own_k, rk_b], axis=0)
            v = jnp.concatenate([own_v, rv_b], axis=0)
            n_own = captured[0].shape[1]
            if bias is None:
                # analytic in-kernel mask keeps the long injected
                # sequence on the flash path (ops/attention.py)
                from ..ops.attention import attention_injected
                out = attention_injected(
                    _heads(q, n_heads), _heads(k, n_heads),
                    _heads(v, n_heads), n_own=n_own, n_uncond=b // 2)
                return linear(p["to_out"], _merge_heads(out)), captured
            key_idx = jnp.arange(nref)
            uncond_mask = jnp.where(key_idx < n_own, 0.0, -1e9)  # [nref]
            half_bias = jnp.concatenate(
                [jnp.tile(uncond_mask[None], (b // 2, 1)),
                 jnp.zeros((b - b // 2, nref))], axis=0)
            extra = half_bias[:, None, None, :]
            bias = extra if bias is None else bias + extra

    out = attention(_heads(q, n_heads), _heads(k, n_heads),
                    _heads(v, n_heads), bias=bias)
    return linear(p["to_out"], _merge_heads(out)), captured


def _cross_attention(p, x, context, n_heads, pre_ln=None):
    if pre_ln is not None and not _fused_ln_route(x):
        x = layer_norm(pre_ln, x)
        pre_ln = None
    if pre_ln is not None:
        # LN2 feeds only the Q projection (K/V come from the context)
        from ..ops.ffn import linear_ln_fused
        q = linear_ln_fused(x, p["to_q"]["w"].astype(x.dtype),
                            pre_ln["scale"], pre_ln["bias"],
                            block_m=1024 if x.shape[-1] <= 320 else 512)
    else:
        q = linear(p["to_q"], x)
    # fused [Dctx, 2C] K/V projection (same MXU-width rationale as the
    # self-attention QKV fusion above)
    wkv = jnp.concatenate([p["to_k"]["w"], p["to_v"]["w"]],
                          axis=1).astype(x.dtype)
    k, v = jnp.split(context.astype(x.dtype) @ wkv, 2, axis=-1)
    out = attention(_heads(q, n_heads), _heads(k, n_heads), _heads(v, n_heads))
    return linear(p["to_out"], _merge_heads(out))


def _ff_tail(p, x):
    """The transformer-block tail ``x + FF(LN3(x))``.

    On the fused TPU route the LayerNorm and the residual add ride
    inside the GEGLU kernel (one HBM pass over x instead of four);
    elsewhere it is the plain composition."""
    din = x.shape[-1]
    n_rows = x.shape[0] * x.shape[1] if x.ndim == 3 else x.shape[0]
    if (jax.default_backend() == "tpu" and din <= 640 and n_rows >= 4096
            and x.dtype == jnp.bfloat16
            and os.environ.get("SDAOF_FUSED_FF", "1") != "0"):
        from ..ops.ffn import geglu_ff_fused
        return geglu_ff_fused(x, p["ff_proj"]["w"], p["ff_proj"]["b"],
                              p["ff_out"]["w"], p["ff_out"]["b"],
                              p["norm3"]["scale"], p["norm3"]["bias"],
                              residual=True,
                              block_m=1024 if din <= 320 else 512,
                              block_ff=4 * din)
    return x + _geglu_ff(p, layer_norm(p["norm3"], x))


def _geglu_ff(p, x):
    din = x.shape[-1]
    n_rows = x.shape[0] * x.shape[1] if x.ndim == 3 else x.shape[0]
    if (jax.default_backend() == "tpu" and din <= 640 and n_rows >= 4096
            and x.dtype == jnp.bfloat16
            and os.environ.get("SDAOF_FUSED_FF", "1") != "0"):
        # fused Pallas FF: both matmuls tile-resident, no [*, 8d]/[*, 4d]
        # HBM round-trips (measured v5e CFG-16: 3.11 -> 2.22 ms at
        # 6144x320, 2.09 -> 1.52 ms at 1536x640). din<=640 keeps the
        # weights within VMEM; small-row shapes are grid-overhead-bound
        # and stay on XLA.
        from ..ops.ffn import geglu_ff_fused
        # tuned on v5e CFG-16: L0 (din 320) bm=1024 3.11->2.22 ms, L1
        # (din 640) bm=512 with the full ff dim per chunk 2.09->1.52 ms;
        # bm=2048 exceeds the 16MB scoped-vmem budget
        return geglu_ff_fused(x, p["ff_proj"]["w"], p["ff_proj"]["b"],
                              p["ff_out"]["w"], p["ff_out"]["b"],
                              block_m=1024 if din <= 320 else 512,
                              block_ff=4 * din)
    h = linear(p["ff_proj"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    return linear(p["ff_out"], h)


def _spatial_transformer(p, x, context, n_heads, ref_kv, attn_bias=None,
                         strip=None, sp=None, cfg_pair=None):
    """Returns (out, kv_list) — one (k, v) per depth block.

    ``cfg_pair=(ctx_u, ctx_c)``: CFG stem dedup — ``x`` arrives at HALF
    the CFG batch (the [uncond|cond] halves are bit-identical until the
    first cross-attention: same latent, same timestep), the self-attention
    runs once on the half batch, and the batch doubles exactly at the
    cross-attention where the two contexts first diverge. Returns a
    full-batch output."""
    b, h, w, c = x.shape
    res = x
    x = group_norm(p["norm"], x, eps=1e-6)
    x = conv2d(p["proj_in"], x)
    x = x.reshape(b, h * w, c)
    kvs = []
    expand = cfg_pair is not None
    for blk in p["blocks"]:
        a1, kv = _self_attention(blk["attn1"], x,
                                 n_heads, ref_kv, bias=attn_bias,
                                 strip=strip, hw=(h, w), sp=sp,
                                 pre_ln=blk["norm1"])
        x = x + a1
        kvs.append(kv)
        if expand:
            x = jnp.concatenate([x, x], axis=0)
            context = jnp.concatenate(
                [cfg_pair[0], cfg_pair[1]], axis=0).astype(x.dtype)
            res = jnp.concatenate([res, res], axis=0)
            b = x.shape[0]
            expand = False
        x = x + _cross_attention(blk["attn2"], x, context, n_heads,
                                 pre_ln=blk["norm2"])
        x = _ff_tail(blk, x)
    x = x.reshape(b, h, w, c)
    x = conv2d(p["proj_out"], x)
    return x + res, kvs


# ---------------------------------------------------------------------------
# UNet init
# ---------------------------------------------------------------------------

def unet_init(rng, cfg: UNetConfig = UNetConfig()):
    rngs = iter(jax.random.split(rng, 256))
    mc = cfg.model_channels
    ted = cfg.time_embed_dim
    p: dict = {
        "time_embed": [linear_init(next(rngs), mc, ted),
                       linear_init(next(rngs), ted, ted)],
    }
    if cfg.num_classes is not None:
        # torch nn.Embedding default N(0,1) (openaimodel UNetModel)
        p["label_emb"] = normal_init_array(next(rngs), (cfg.num_classes, ted))

    input_blocks: list = [{"conv": conv2d_init(next(rngs), cfg.in_channels, mc, 3)}]
    ch = mc
    input_chans = [mc]
    ds = 1
    for lvl, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _resblock_init(next(rngs), ch, mult * mc, ted)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk["transformer"] = _spatial_transformer_init(
                    next(rngs), ch, cfg.num_heads, cfg.context_dim,
                    cfg.transformer_depth)
            input_blocks.append(blk)
            input_chans.append(ch)
        if lvl != len(cfg.channel_mult) - 1:
            input_blocks.append({"down": conv2d_init(next(rngs), ch, ch, 3)})
            input_chans.append(ch)
            ds *= 2
    p["input_blocks"] = input_blocks

    p["middle"] = {
        "res1": _resblock_init(next(rngs), ch, ch, ted),
        "transformer": _spatial_transformer_init(
            next(rngs), ch, cfg.num_heads, cfg.context_dim,
            cfg.transformer_depth),
        "res2": _resblock_init(next(rngs), ch, ch, ted),
    }

    output_blocks = []
    for lvl, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            skip_ch = input_chans.pop()
            blk = {"res": _resblock_init(next(rngs), ch + skip_ch,
                                         mult * mc, ted)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk["transformer"] = _spatial_transformer_init(
                    next(rngs), ch, cfg.num_heads, cfg.context_dim,
                    cfg.transformer_depth)
            if lvl != 0 and i == cfg.num_res_blocks:
                blk["up"] = conv2d_init(next(rngs), ch, ch, 3)
                ds //= 2
            output_blocks.append(blk)
    p["output_blocks"] = output_blocks

    p["out"] = {"norm": norm_init(ch),
                "conv": conv2d_init(next(rngs), ch, cfg.out_channels, 3,
                                    zero=True)}
    return p


# ---------------------------------------------------------------------------
# UNet apply
# ---------------------------------------------------------------------------

def unet_apply(params, cfg: UNetConfig, x, timesteps, context,
               ref_kv: Optional[Tuple] = None,
               control: Optional[Tuple] = None,
               attn_biases: Optional[dict] = None,
               y: Optional[jnp.ndarray] = None,
               strip: Optional[StripConfig] = None,
               sp: Optional[SeqParallelConfig] = None,
               context_pair: Optional[Tuple] = None):
    """Forward pass.

    Args:
      x: [B, H, W, in_channels] latents (H, W at latent resolution).
      timesteps: [B] diffusion timesteps.
      context: [B, L, context_dim] text conditioning.
      ref_kv: None, or a 16-tuple (call order) of None/(k, v) pairs with
        k, v of [Br, Nr, C] for cross-frame self-attention injection.
      control: None, or a 13-tuple of ControlNet residuals in NHWC —
        entries 0..11 for the encoder skips, 12 for the middle block.
      attn_biases: optional {layer_idx: bias} additive attention biases
        (multi-frame banded strips).
      y: [B] int class labels (adm conditioning, e.g. the upscaler's
        noise level); required iff cfg.num_classes is set.
      strip: optional StripConfig — x is a width-concatenated
        multi-frame strip and every self-attention applies the MFR band
        bias (reference forward_mfr, attention.py:220-324).
      sp: optional SeqParallelConfig — shard the latent's row axis over
        a mesh; self-attention runs Ulysses sequence-parallel.
      context_pair: optional (ctx_u, ctx_c) — CFG stem dedup. ``x`` and
        ``timesteps`` arrive at HALF the CFG batch; the [uncond|cond]
        halves of classifier-free guidance are bit-identical until the
        first cross-attention (same latent + timestep under batch
        doubling, guided_ldm.py:41-63), so the stem — input conv, first
        resblock, first (and largest) self-attention — runs once, and
        the batch doubles at the first cross-attention. Output batch is
        2B ([uncond|cond]); ``context`` is ignored. Exclusive with
        ref_kv / attn_biases / strip / sp / y (their halves differ).
        ControlNet residuals stay full-batch: they are consumed from
        the middle block on, after the (guaranteed) expansion at the
        middle transformer.

    Returns:
      (out [B, H, W, out_channels], kv_hist 16-tuple of (k, v)).
      Under ``context_pair`` the layer-0 kv entries carry the half
      batch (the halves are identical there by construction).
    """
    dedup = context_pair is not None
    if dedup:
        # strip IS allowed: the MFR band bias is a positional attention
        # bias, identical across the CFG halves, so the stem stays
        # bit-identical under batch doubling (config-5 shapes put the
        # largest L0 self-attention in the stem — halving it there is
        # the biggest single win at 12288-token strips)
        assert ref_kv is None and attn_biases is None \
            and sp is None and y is None, \
            "context_pair (CFG stem dedup) requires plain conditioning"
    nh = cfg.num_heads
    t_emb = timestep_embedding(timesteps, cfg.model_channels, dtype=x.dtype)
    emb = linear(params["time_embed"][1],
                 swish(linear(params["time_embed"][0], t_emb)))
    if cfg.num_classes is not None:
        assert y is not None, "class-conditional UNet needs y labels"
        emb = emb + params["label_emb"][y].astype(emb.dtype)

    state = {"half": dedup, "emb": emb,
             "ctx": None if dedup else context}

    def tfm(p, h, layer_idx):
        if state["half"]:
            h, kvs = _spatial_transformer(p, h, None, nh, None, None,
                                          strip=strip,
                                          cfg_pair=context_pair)
            state["half"] = False
            state["emb"] = jnp.concatenate([state["emb"], state["emb"]], 0)
            state["ctx"] = jnp.concatenate(
                [context_pair[0], context_pair[1]], axis=0).astype(h.dtype)
            return h, kvs
        rkv = ref_kv[layer_idx] if ref_kv is not None else None
        bias = attn_biases.get(layer_idx) if attn_biases else None
        h, kvs = _spatial_transformer(p, h, state["ctx"], nh, rkv, bias,
                                      strip=strip, sp=sp)
        return h, kvs

    kv_hist: list = []
    layer = 0
    hs = []
    h = x
    if sp is not None:
        # H-row sharding: convs spatially partition (GSPMD halo
        # exchange); row-major token flattening keeps attention's token
        # axis contiguously sharded
        from jax.sharding import NamedSharding, PartitionSpec as _P
        h = jax.lax.with_sharding_constraint(
            h, NamedSharding(sp.mesh, _P(None, sp.axis, None, None)))
    for blk in params["input_blocks"]:
        if "conv" in blk:
            h = conv2d(blk["conv"], h)
        elif "down" in blk:
            h = conv2d(blk["down"], h, stride=2, padding=1)
        else:
            h = _resblock(blk["res"], h, state["emb"])
            if "transformer" in blk:
                was_half = state["half"]
                h, kvs = tfm(blk["transformer"], h, layer)
                kv_hist.extend(kvs)
                layer += 1
                if was_half and not state["half"]:
                    # skips recorded before the expansion double here
                    hs = [jnp.concatenate([s, s], axis=0) for s in hs]
        hs.append(h)

    h = _resblock(params["middle"]["res1"], h, state["emb"])
    was_half = state["half"]
    h, kvs = tfm(params["middle"]["transformer"], h, layer)
    kv_hist.extend(kvs)
    layer += 1
    if was_half and not state["half"]:
        hs = [jnp.concatenate([s, s], axis=0) for s in hs]
    h = _resblock(params["middle"]["res2"], h, state["emb"])
    emb = state["emb"]

    if control is not None:
        h = h + control[-1].astype(h.dtype)   # middle residual is last

    for i, blk in enumerate(params["output_blocks"]):
        skip = hs.pop()
        if control is not None:
            # encoder residuals consumed last-to-first (controlnet.py:50-56)
            skip = skip + control[len(control) - 2 - i].astype(h.dtype)
        h = jnp.concatenate([h, skip], axis=-1)
        h = _resblock(blk["res"], h, emb)
        if "transformer" in blk:
            h, kvs = tfm(blk["transformer"], h, layer)
            kv_hist.extend(kvs)
            layer += 1
        if "up" in blk:
            h = upsample2x_conv(blk["up"], h)

    h = swish(group_norm(params["out"]["norm"], h))
    out = conv2d(params["out"]["conv"], h)
    return out, tuple(kv_hist)


def unet_apply_deepcache(params, cfg: UNetConfig, x, timesteps, context,
                         *, deep_cache=None, want_deep_cache: bool = False,
                         cache_blocks: Optional[int] = None):
    """DeepCache-style partial forward (training-free step acceleration).

    The deep segment of the UNet (levels >= 1 + middle) changes slowly
    across adjacent denoise steps; ``want_deep_cache=True`` runs the full
    net and ALSO returns the feature entering the shallowest decoder
    stage; ``deep_cache=<that feature>`` skips the deep segment entirely,
    computing only the shallow encoder blocks (for their skips) and the
    shallow decoder blocks. ``cache_blocks`` = number of leading input
    blocks treated as shallow (default num_res_blocks+1, i.e. the whole
    level-0 stage). No ref_kv/ControlNet/adm support on this path — it
    serves the plain img2img turbo mode.

    Returns (out, deep_feat) — deep_feat is the cached-or-captured deep
    feature (pass-through when ``deep_cache`` given).
    """
    assert len(cfg.channel_mult) >= 2, "deepcache needs >=2 UNet levels"
    cb = cache_blocks or (cfg.num_res_blocks + 1)
    nh = cfg.num_heads
    t_emb = timestep_embedding(timesteps, cfg.model_channels, dtype=x.dtype)
    emb = linear(params["time_embed"][1],
                 swish(linear(params["time_embed"][0], t_emb)))

    def run_block(blk, h, layer):
        if "conv" in blk:
            return conv2d(blk["conv"], h), layer
        if "down" in blk:
            return conv2d(blk["down"], h, stride=2, padding=1), layer
        h = _resblock(blk["res"], h, emb)
        if "transformer" in blk:
            h, _ = _spatial_transformer(blk["transformer"], h, context,
                                        nh, None)
            layer += 1
        return h, layer

    layer = 0
    hs = []
    h = x
    for blk in params["input_blocks"][:cb]:
        h, layer = run_block(blk, h, layer)
        hs.append(h)

    out_blocks = params["output_blocks"]
    # the tail consumes exactly the shallow skips hs[0..cb-1]; SD-1.5
    # with cb=3: tail = the 3 level-0 decoder blocks
    tail = out_blocks[-cb:]

    if deep_cache is None:
        # full pass through the deep segment, capturing its output
        for blk in params["input_blocks"][cb:]:
            h, layer = run_block(blk, h, layer)
            hs.append(h)
        h = _resblock(params["middle"]["res1"], h, emb)
        h, _ = _spatial_transformer(params["middle"]["transformer"], h,
                                    context, nh, None)
        h = _resblock(params["middle"]["res2"], h, emb)
        for blk in out_blocks[:len(out_blocks) - cb]:
            skip = hs.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resblock(blk["res"], h, emb)
            if "transformer" in blk:
                h, _ = _spatial_transformer(blk["transformer"], h,
                                            context, nh, None)
            if "up" in blk:
                h = upsample2x_conv(blk["up"], h)
        deep_feat = h
    else:
        deep_feat = deep_cache
        h = deep_cache.astype(x.dtype)

    for blk in tail:
        skip = hs.pop()
        h = jnp.concatenate([h, skip], axis=-1)
        h = _resblock(blk["res"], h, emb)
        if "transformer" in blk:
            h, _ = _spatial_transformer(blk["transformer"], h, context,
                                        nh, None)
        if "up" in blk:
            h = upsample2x_conv(blk["up"], h)

    h = swish(group_norm(params["out"]["norm"], h))
    out = conv2d(params["out"]["conv"], h)
    return out, deep_feat


def deepcache_feat_shape(cfg: UNetConfig, batch: int, h: int, w: int,
                         cache_blocks: Optional[int] = None):
    """Shape of the cached deep feature for :func:`unet_apply_deepcache`
    at latent resolution (h, w): the upsampled level-1 decoder output."""
    ch = cfg.model_channels * cfg.channel_mult[1]
    return (batch, h, w, ch)
