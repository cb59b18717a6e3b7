"""RAFT optical flow — functional JAX/NHWC rebuild, scan-based iterations.

Capability parity with the vendored RAFT (reference: RAFT/core/raft.py,
extractor.py, update.py, corr.py): instance-norm feature encoder and
batch-norm context encoder (stride 8), 4-level all-pairs correlation
pyramid with (2r+1)^2 windowed lookup, SepConvGRU iterative updates, and
convex 8x flow upsampling via a softmaxed 9-way mask.

TPU-first: the update iterations run as one `lax.scan` over shared
weights (the reference Python-loops 20 torch iterations,
raft.py:122-139); the correlation volume is a single MXU matmul.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.correlation import (CorrPyramid, alt_correlation_xla,
                               all_pairs_correlation, build_pyramid,
                               fmap_pyramid, lookup_pyramid)
from .layers import conv2d, conv2d_init, instance_norm


@dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 20
    fnet_dim: int = 256
    alternate_corr: bool = False   # on-the-fly windowed corr (alt path)
    small: bool = False            # SmallEncoder/SmallUpdateBlock variant
    # storage dtype of the all-pairs correlation pyramid. bf16 halves
    # the flow program's HBM (~0.8GB/pair at 512x768) so flow batch 8
    # fits next to the resident SD models — f32 corr OOMs at batch 8
    # (measured, DECISIONS.md round 3) — and is the default everywhere
    # (CLI and KeyframeInpaintConfig.flow_batch=8 assume it; pinned by
    # tests/test_cli_scaleout.py defaults test). The matmul and the
    # bilinear stencil still run in f32; set "float32" for the exact
    # reference corr numerics at flow_batch <= 4.
    corr_dtype: str = "bfloat16"

    @staticmethod
    def small_config(**kw) -> "RAFTConfig":
        """raft-small (raft.py args.small): hdim 96, cdim 64, 3 corr
        levels radius 3, bottleneck encoders, bilinear 8x upsampling."""
        base = dict(hidden_dim=96, context_dim=64, corr_levels=3,
                    corr_radius=3, fnet_dim=128, small=True)
        base.update(kw)
        return RAFTConfig(**base)

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def _bn_init(ch):
    # inference-mode batch norm: running stats ported from the checkpoint
    return {"scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32),
            "mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32)}


def _apply_norm(p, x, kind):
    if kind == "instance":
        # torch InstanceNorm2d(affine=False)
        return instance_norm(None, x)
    if kind == "batch":
        inv = jax.lax.rsqrt(p["var"] + 1e-5)
        return ((x - p["mean"]) * inv * p["scale"] + p["bias"]).astype(x.dtype)
    if kind == "none":
        return x
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# encoders (BasicEncoder, extractor.py:118-192)
# ---------------------------------------------------------------------------

def _res_unit_init(rng, in_ch, out_ch, norm, stride):
    k = jax.random.split(rng, 3)
    p = {"conv1": conv2d_init(k[0], in_ch, out_ch, 3),
         "conv2": conv2d_init(k[1], out_ch, out_ch, 3)}
    if norm == "batch":
        p["norm1"] = _bn_init(out_ch)
        p["norm2"] = _bn_init(out_ch)
    if stride != 1:
        p["down"] = conv2d_init(k[2], in_ch, out_ch, 1)
        if norm == "batch":
            p["norm3"] = _bn_init(out_ch)
    return p


def _res_unit(p, x, norm, stride):
    # explicit symmetric padding: XLA 'SAME' pads (0, 1) under stride 2
    # while torch Conv2d(3, padding=1) pads (1, 1) — the asymmetry
    # shifts the strided feature grid by one input pixel vs the
    # reference (caught by tests/test_port_weights.py raft golden
    # parity; reference: extractor.py ResidualBlock)
    y = jax.nn.relu(_apply_norm(p.get("norm1"),
                                conv2d(p["conv1"], x, stride=stride,
                                       padding=1), norm))
    y = jax.nn.relu(_apply_norm(p.get("norm2"), conv2d(p["conv2"], y), norm))
    if "down" in p:
        # 1x1 kernel: torch pads 0; SAME under stride 2 happens to
        # match, but keep it explicit
        x = _apply_norm(p.get("norm3"), conv2d(p["down"], x, stride=stride,
                                               padding=0), norm)
    return jax.nn.relu(x + y)


def encoder_init(rng, out_dim: int, norm: str):
    rngs = iter(jax.random.split(rng, 16))
    p = {"conv1": conv2d_init(next(rngs), 3, 64, 7)}
    if norm == "batch":
        p["norm1"] = _bn_init(64)
    layers = []
    in_ch = 64
    for dim, stride in ((64, 1), (96, 2), (128, 2)):
        layers.append([_res_unit_init(next(rngs), in_ch, dim, norm, stride),
                       _res_unit_init(next(rngs), dim, dim, norm, 1)])
        in_ch = dim
    p["layers"] = layers
    p["conv2"] = conv2d_init(next(rngs), 128, out_dim, 1)
    return p


def encoder_apply(p, x, norm: str):
    h = conv2d(p["conv1"], x, stride=2, padding=3)
    h = jax.nn.relu(_apply_norm(p.get("norm1"), h, norm))
    for (u1, u2), stride in zip(p["layers"], (1, 2, 2)):
        h = _res_unit(u1, h, norm, stride)
        h = _res_unit(u2, h, norm, 1)
    return conv2d(p["conv2"], h)


# --- small variant (SmallEncoder / bottleneck units, extractor.py:195-267)

def _bottleneck_init(rng, in_ch, out_ch, stride):
    k = jax.random.split(rng, 4)
    quarter = out_ch // 4
    p = {"conv1": conv2d_init(k[0], in_ch, quarter, 1),
         "conv2": conv2d_init(k[1], quarter, quarter, 3),
         "conv3": conv2d_init(k[2], quarter, out_ch, 1)}
    if stride != 1:
        p["down"] = conv2d_init(k[3], in_ch, out_ch, 1)
    return p


def _bottleneck(p, x, stride, norm="instance"):
    def n(v):
        return instance_norm(None, v) if norm == "instance" else v
    y = jax.nn.relu(n(conv2d(p["conv1"], x)))
    # explicit symmetric padding under stride (see _res_unit note)
    y = jax.nn.relu(n(conv2d(p["conv2"], y, stride=stride, padding=1)))
    y = jax.nn.relu(n(conv2d(p["conv3"], y)))
    if "down" in p:
        x = conv2d(p["down"], x, stride=stride, padding=0)
    return jax.nn.relu(x + y)


def small_encoder_init(rng, out_dim: int):
    rngs = iter(jax.random.split(rng, 16))
    p = {"conv1": conv2d_init(next(rngs), 3, 32, 7)}
    layers = []
    in_ch = 32
    for dim, stride in ((32, 1), (64, 2), (96, 2)):
        layers.append([_bottleneck_init(next(rngs), in_ch, dim, stride),
                       _bottleneck_init(next(rngs), dim, dim, 1)])
        in_ch = dim
    p["layers"] = layers
    p["conv2"] = conv2d_init(next(rngs), 96, out_dim, 1)
    return p


def small_encoder_apply(p, x, norm: str = "instance"):
    h = conv2d(p["conv1"], x, stride=2, padding=3)
    if norm == "instance":
        h = instance_norm(None, h)
    h = jax.nn.relu(h)
    for (u1, u2), stride in zip(p["layers"], (1, 2, 2)):
        h = _bottleneck(u1, h, stride, norm)
        h = _bottleneck(u2, h, 1, norm)
    return conv2d(p["conv2"], h)


# ---------------------------------------------------------------------------
# update block (update.py:79-139)
# ---------------------------------------------------------------------------

def motion_encoder_init(rng, corr_planes):
    k = jax.random.split(rng, 5)
    return {"convc1": conv2d_init(k[0], corr_planes, 256, 1),
            "convc2": conv2d_init(k[1], 256, 192, 3),
            "convf1": conv2d_init(k[2], 2, 128, 7),
            "convf2": conv2d_init(k[3], 128, 64, 3),
            "conv": conv2d_init(k[4], 192 + 64, 128 - 2, 3)}


def motion_encoder(p, flow, corr):
    cor = jax.nn.relu(conv2d(p["convc1"], corr))
    cor = jax.nn.relu(conv2d(p["convc2"], cor))
    flo = jax.nn.relu(conv2d(p["convf1"], flow, padding=3))
    flo = jax.nn.relu(conv2d(p["convf2"], flo))
    out = jax.nn.relu(conv2d(p["conv"], jnp.concatenate([cor, flo], -1)))
    return jnp.concatenate([out, flow], -1)


def sep_conv_gru_init(rng, hidden, inp):
    k = jax.random.split(rng, 6)
    hi = hidden + inp
    return {name: conv2d_init(k[i], hi, hidden, ks)
            for i, (name, ks) in enumerate(
                [("convz1", (1, 5)), ("convr1", (1, 5)), ("convq1", (1, 5)),
                 ("convz2", (5, 1)), ("convr2", (5, 1)), ("convq2", (5, 1))])}


def sep_conv_gru(p, h, x):
    for suffix in ("1", "2"):           # horizontal pass, then vertical
        hx = jnp.concatenate([h, x], -1)
        z = jax.nn.sigmoid(conv2d(p["convz" + suffix], hx))
        r = jax.nn.sigmoid(conv2d(p["convr" + suffix], hx))
        q = jnp.tanh(conv2d(p["convq" + suffix],
                            jnp.concatenate([r * h, x], -1)))
        h = (1 - z) * h + z * q
    return h


def update_block_init(rng, cfg: RAFTConfig):
    k = jax.random.split(rng, 6)
    return {
        "encoder": motion_encoder_init(k[0], cfg.corr_planes),
        "gru": sep_conv_gru_init(k[1], cfg.hidden_dim,
                                 128 + cfg.context_dim),
        "flow_head": {"conv1": conv2d_init(k[2], cfg.hidden_dim, 256, 3),
                      "conv2": conv2d_init(k[3], 256, 2, 3)},
        "mask": {"conv1": conv2d_init(k[4], 128, 256, 3),
                 "conv2": conv2d_init(k[5], 256, 64 * 9, 1)},
    }


def update_block(p, net, inp, corr, flow):
    motion = motion_encoder(p["encoder"], flow, corr)
    net = sep_conv_gru(p["gru"], net, jnp.concatenate([inp, motion], -1))
    delta = conv2d(p["flow_head"]["conv2"],
                   jax.nn.relu(conv2d(p["flow_head"]["conv1"], net)))
    mask = 0.25 * conv2d(p["mask"]["conv2"],
                         jax.nn.relu(conv2d(p["mask"]["conv1"], net)))
    return net, mask, delta


# --- small variant (SmallMotionEncoder/ConvGRU/SmallUpdateBlock,
#     update.py:16-31, 62-77, 99-111)

def small_update_block_init(rng, cfg: RAFTConfig):
    k = jax.random.split(rng, 8)
    return {
        "encoder": {"convc1": conv2d_init(k[0], cfg.corr_planes, 96, 1),
                    "convf1": conv2d_init(k[1], 2, 64, 7),
                    "convf2": conv2d_init(k[2], 64, 32, 3),
                    "conv": conv2d_init(k[3], 96 + 32, 80, 3)},
        "gru": {"convz": conv2d_init(k[4], cfg.hidden_dim + 82
                                     + cfg.context_dim, cfg.hidden_dim, 3),
                "convr": conv2d_init(k[5], cfg.hidden_dim + 82
                                     + cfg.context_dim, cfg.hidden_dim, 3),
                "convq": conv2d_init(k[6], cfg.hidden_dim + 82
                                     + cfg.context_dim, cfg.hidden_dim, 3)},
        "flow_head": {"conv1": conv2d_init(k[7], cfg.hidden_dim, 128, 3),
                      "conv2": conv2d_init(jax.random.fold_in(rng, 9),
                                           128, 2, 3)},
    }


def small_update_block(p, net, inp, corr, flow):
    cor = jax.nn.relu(conv2d(p["encoder"]["convc1"], corr))
    flo = jax.nn.relu(conv2d(p["encoder"]["convf1"], flow, padding=3))
    flo = jax.nn.relu(conv2d(p["encoder"]["convf2"], flo))
    out = jax.nn.relu(conv2d(p["encoder"]["conv"],
                             jnp.concatenate([cor, flo], -1)))
    motion = jnp.concatenate([out, flow], -1)          # 82 channels
    x = jnp.concatenate([inp, motion], -1)
    hx = jnp.concatenate([net, x], -1)
    z = jax.nn.sigmoid(conv2d(p["gru"]["convz"], hx))
    r = jax.nn.sigmoid(conv2d(p["gru"]["convr"], hx))
    q = jnp.tanh(conv2d(p["gru"]["convq"],
                        jnp.concatenate([r * net, x], -1)))
    net = (1 - z) * net + z * q
    delta = conv2d(p["flow_head"]["conv2"],
                   jax.nn.relu(conv2d(p["flow_head"]["conv1"], net)))
    return net, None, delta


# ---------------------------------------------------------------------------
# convex upsampling (raft.py:72-83)
# ---------------------------------------------------------------------------

def upsample_flow_convex(flow, mask):
    """flow [N,H,W,2] (1/8 res), mask [N,H,W,576] -> [N,8H,8W,2]."""
    n, h, w, _ = flow.shape
    # 3x3 neighborhood of 8*flow, zero padded, row-major (dy, dx)
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nbrs = jnp.stack([fp[:, dy:dy + h, dx:dx + w, :]
                      for dy in range(3) for dx in range(3)], axis=3)
    # mask channels viewed as (9, 8, 8) (raft.py:75)
    m = mask.reshape(n, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    up = jnp.einsum("nhwkij,nhwkc->nhwijc", m, nbrs,
                    preferred_element_type=jnp.float32).astype(flow.dtype)
    up = up.transpose(0, 1, 3, 2, 4, 5)            # [N,H,8,W,8,2]
    return up.reshape(n, 8 * h, 8 * w, 2)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def raft_init(rng, cfg: RAFTConfig = RAFTConfig()):
    k = jax.random.split(rng, 3)
    if cfg.small:
        return {
            "fnet": small_encoder_init(k[0], cfg.fnet_dim),
            "cnet": small_encoder_init(k[1], cfg.hidden_dim
                                       + cfg.context_dim),
            "update": small_update_block_init(k[2], cfg),
        }
    return {
        "fnet": encoder_init(k[0], cfg.fnet_dim, "instance"),
        "cnet": encoder_init(k[1], cfg.hidden_dim + cfg.context_dim, "batch"),
        "update": update_block_init(k[2], cfg),
    }


def upflow8(flow):
    """Bilinear 8x flow upsampling (utils.py:80-82), used when no convex
    mask is available (small variant)."""
    n, h, w, _ = flow.shape
    return 8.0 * jax.image.resize(flow, (n, 8 * h, 8 * w, 2), "bilinear")


def coords_grid(n, h, w):
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    g = jnp.stack([gx, gy], axis=-1)               # (x, y) order
    return jnp.broadcast_to(g[None], (n, h, w, 2))


def raft_apply(params, cfg: RAFTConfig, image1, image2, *,
               iters: int | None = None, flow_init=None,
               all_iters: bool = False, with_features: bool = False):
    """image1/image2 [N, H, W, 3] RGB in [0, 255] (H, W multiples of 8).

    Returns (flow_low [N,H/8,W/8,2], flow_up [N,H,W,2]) — the reference's
    test_mode contract (raft.py:141-142). With ``all_iters`` both returns
    carry a leading iterations axis (the training-mode flow_predictions
    list, raft.py:122-139), for the sequence loss. With ``with_features``
    a third return carries the final GRU hidden state [N,H/8,W/8,hidden]
    — the matching-state input of the learned uncertainty head
    (models/flowconf.py; PDCNet+'s trained uncertainty decoder analog,
    reference pdcnet_of.py:66-75).
    """
    iters = iters or cfg.iters
    img1 = 2.0 * (image1 / 255.0) - 1.0
    img2 = 2.0 * (image2 / 255.0) - 1.0

    # shared-batch encoder trick (extractor.py:171-174)
    if cfg.small:
        fmaps = small_encoder_apply(params["fnet"],
                                    jnp.concatenate([img1, img2], 0))
    else:
        fmaps = encoder_apply(params["fnet"],
                              jnp.concatenate([img1, img2], 0), "instance")
    fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
    fmap1 = fmap1.astype(jnp.float32)
    fmap2 = fmap2.astype(jnp.float32)

    if cfg.alternate_corr:
        f2_pyr = fmap_pyramid(fmap2, cfg.corr_levels)
        corr_fn = lambda coords: alt_correlation_xla(
            fmap1, f2_pyr, coords, cfg.corr_radius)
    else:
        corr = all_pairs_correlation(fmap1, fmap2)
        pyramid = build_pyramid(corr.astype(jnp.dtype(cfg.corr_dtype)),
                                cfg.corr_levels)
        corr_fn = lambda coords: lookup_pyramid(pyramid, coords,
                                                cfg.corr_radius)

    if cfg.small:
        cnet = small_encoder_apply(params["cnet"], img1, norm="none")
    else:
        cnet = encoder_apply(params["cnet"], img1, "batch")
    net, inp = jnp.split(cnet, [cfg.hidden_dim], axis=-1)
    net = jnp.tanh(net)
    inp = jax.nn.relu(inp)

    n, h8, w8 = fmap1.shape[0], fmap1.shape[1], fmap1.shape[2]
    coords0 = coords_grid(n, h8, w8)
    coords1 = coords0 if flow_init is None else coords0 + flow_init

    upd = small_update_block if cfg.small else update_block

    def step(carry, _):
        net, coords1 = carry
        coords1 = jax.lax.stop_gradient(coords1)
        corr = corr_fn(coords1)
        flow = coords1 - coords0
        net2, up_mask, delta = upd(params["update"], net, inp, corr, flow)
        new_coords = coords1 + delta
        out_mask = up_mask if up_mask is not None \
            else jnp.zeros((), img1.dtype)
        return (net2, new_coords), (new_coords - coords0, out_mask)

    (net, coords1), (flows_low, up_masks) = jax.lax.scan(
        step, (net, coords1), None, length=iters)
    flow_low = coords1 - coords0
    if all_iters:
        # per-iteration upsampled predictions for the sequence loss
        # (RAFT training contract: flow_predictions list, raft.py:122-139)
        if cfg.small:
            flows_up = jax.vmap(upflow8)(flows_low)
        else:
            flows_up = jax.vmap(upsample_flow_convex)(flows_low, up_masks)
        return (flows_low, flows_up, net) if with_features \
            else (flows_low, flows_up)
    if cfg.small:
        flow_up = upflow8(flow_low)
    else:
        flow_up = upsample_flow_convex(flow_low, up_masks[-1])
    return (flow_low, flow_up, net) if with_features \
        else (flow_low, flow_up)


def pad_to_multiple(img, multiple: int = 8):
    """Replicate-pad H and W up to a multiple (InputPadder, utils.py:7-24
    'sintel' mode pads symmetrically; here: bottom/right, simpler crop).
    Returns (padded, (orig_h, orig_w))."""
    h, w = img.shape[-3], img.shape[-2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    cfg = [(0, 0)] * img.ndim
    cfg[-3] = (0, ph)
    cfg[-2] = (0, pw)
    return jnp.pad(img, cfg, mode="edge"), (h, w)


def forward_interpolate(flow):
    """Warm-start flow re-gridding (utils.py:26-54): scatter each pixel's
    flow to its forward-advected position and re-grid by nearest-neighbor
    interpolation over the scattered points. Host-side (numpy/scipy) —
    it runs once per frame pair between scans, exactly like the
    reference's scipy griddata call.

    flow [H, W, 2] -> [H, W, 2] float32.
    """
    import numpy as np
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    gy, gx = np.mgrid[0:h, 0:w]
    dx, dy = flow[..., 0], flow[..., 1]
    x1 = (gx + dx).ravel()
    y1 = (gy + dy).ravel()
    keep = (x1 > 0) & (x1 < w) & (y1 > 0) & (y1 < h)
    fx = dx.ravel()[keep]
    fy = dy.ravel()[keep]
    x1, y1 = x1[keep], y1[keep]
    if x1.size == 0:
        return np.zeros_like(flow)
    from scipy import interpolate as _interp
    pts = np.stack([x1, y1], axis=-1)
    fx_g = _interp.griddata(pts, fx, (gx, gy), method="nearest")
    fy_g = _interp.griddata(pts, fy, (gx, gy), method="nearest")
    return np.stack([fx_g, fy_g], axis=-1).astype(np.float32)
