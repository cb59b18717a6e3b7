"""Functional torch RAFT forward, driven entirely by a state dict in
the reference's naming scheme (reference: RAFT/core/raft.py:86-142,
extractor.py, update.py, corr.py).

Golden-parity fixture: tests synthesize a reference-named state dict,
run THIS forward under torch semantics (grid_sample align_corners,
eval-mode instance/batch norm, avg_pool2d floor division) and compare
against `port_raft` + `raft_apply`. Written functionally on purpose —
no nn.Module tree — so it exercises exactly what a real
raft-things.pth exercises: the names, layouts, and math, nothing else.
"""

import torch
import torch.nn.functional as F


def _conv(sd, name, x, *, stride=1, padding=None):
    w = sd[name + ".weight"]
    if padding is None:
        padding = (w.shape[2] // 2, w.shape[3] // 2)
    return F.conv2d(x, w, sd.get(name + ".bias"), stride=stride,
                    padding=padding)


def _norm(sd, name, x, kind):
    if kind == "instance":     # nn.InstanceNorm2d default: no affine,
        return F.instance_norm(x)      # no running stats (eval == train)
    return F.batch_norm(x, sd[name + ".running_mean"],
                        sd[name + ".running_var"], sd[name + ".weight"],
                        sd[name + ".bias"], training=False)


def _res_unit(sd, base, x, kind, stride):
    y = F.relu(_norm(sd, base + ".norm1",
                     _conv(sd, base + ".conv1", x, stride=stride), kind))
    y = F.relu(_norm(sd, base + ".norm2",
                     _conv(sd, base + ".conv2", y), kind))
    if stride != 1:
        x = _conv(sd, base + ".downsample.0", x, stride=stride, padding=0)
        x = _norm(sd, base + ".downsample.1", x, kind)
    return F.relu(x + y)


def _encoder(sd, base, x, kind):
    x = F.relu(_norm(sd, base + ".norm1",
                     _conv(sd, base + ".conv1", x, stride=2), kind))
    for li, stride in ((1, 1), (2, 2), (3, 2)):
        x = _res_unit(sd, f"{base}.layer{li}.0", x, kind, stride)
        x = _res_unit(sd, f"{base}.layer{li}.1", x, kind, 1)
    return _conv(sd, base + ".conv2", x, padding=0)


def _coords_grid(b, h, w):
    ys, xs = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    return torch.stack([xs, ys]).unsqueeze(0).repeat(b, 1, 1, 1)


def _bilinear_sampler(img, coords):
    h, w = img.shape[-2:]
    gx = 2 * coords[..., 0] / (w - 1) - 1
    gy = 2 * coords[..., 1] / (h - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


def _corr_pyramid(fmap1, fmap2, num_levels):
    b, d, h, w = fmap1.shape
    corr = torch.matmul(fmap1.view(b, d, h * w).transpose(1, 2),
                        fmap2.view(b, d, h * w))
    corr = corr.view(b * h * w, 1, h, w) / torch.sqrt(
        torch.tensor(float(d)))
    pyramid = [corr]
    for _ in range(num_levels - 1):
        pyramid.append(F.avg_pool2d(pyramid[-1], 2, stride=2))
    return pyramid


def _corr_lookup(pyramid, coords, radius):
    b, _, h, w = coords.shape[0], 2, coords.shape[2], coords.shape[3]
    coords = coords.permute(0, 2, 3, 1)
    out = []
    for i, corr in enumerate(pyramid):
        d = torch.arange(-radius, radius + 1, dtype=torch.float32)
        dy, dx = torch.meshgrid(d, d, indexing="ij")
        delta = torch.stack([dx, dy], dim=-1)          # [2r+1, 2r+1, 2]
        centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
        sampled = _bilinear_sampler(corr, centroid + delta)
        out.append(sampled.view(b, h, w, -1))
    return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


def _motion_encoder(sd, flow, corr):
    p = "update_block.encoder."
    c = F.relu(_conv(sd, p + "convc1", corr, padding=0))
    c = F.relu(_conv(sd, p + "convc2", c))
    f = F.relu(_conv(sd, p + "convf1", flow))
    f = F.relu(_conv(sd, p + "convf2", f))
    out = F.relu(_conv(sd, p + "conv", torch.cat([c, f], dim=1)))
    return torch.cat([out, flow], dim=1)


def _sep_gru(sd, h, x):
    p = "update_block.gru."
    for sfx in ("1", "2"):       # (1,5) horizontal then (5,1) vertical
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(_conv(sd, p + "convz" + sfx, hx))
        r = torch.sigmoid(_conv(sd, p + "convr" + sfx, hx))
        q = torch.tanh(_conv(sd, p + "convq" + sfx,
                             torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
    return h


def _upsample_flow(flow, mask):
    b, _, h, w = flow.shape
    mask = mask.view(b, 1, 9, 8, 8, h, w).softmax(dim=2)
    up = F.unfold(8 * flow, (3, 3), padding=1).view(b, 2, 9, 1, 1, h, w)
    up = torch.sum(mask * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    return up.reshape(b, 2, 8 * h, 8 * w)


@torch.no_grad()
def raft_forward(sd, image1, image2, iters=12, corr_levels=4,
                 corr_radius=4):
    """image1/image2 [N, 3, H, W] RGB in [0, 255] (H, W multiples of
    8). Returns (flow_low, flow_up) — the reference's test_mode
    contract (RAFT/core/raft.py:141-142)."""
    image1 = 2 * (image1 / 255.0) - 1.0
    image2 = 2 * (image2 / 255.0) - 1.0

    fmap1 = _encoder(sd, "fnet", image1, "instance")
    fmap2 = _encoder(sd, "fnet", image2, "instance")
    pyramid = _corr_pyramid(fmap1, fmap2, corr_levels)

    cnet = _encoder(sd, "cnet", image1, "batch")
    net, inp = torch.split(cnet, [128, 128], dim=1)
    net = torch.tanh(net)
    inp = F.relu(inp)

    b, _, h8, w8 = fmap1.shape
    coords0 = _coords_grid(b, h8, w8)
    coords1 = coords0.clone()

    for _ in range(iters):
        corr = _corr_lookup(pyramid, coords1, corr_radius)
        flow = coords1 - coords0
        motion = _motion_encoder(sd, flow, corr)
        net = _sep_gru(sd, net, torch.cat([inp, motion], dim=1))
        dflow = _conv(sd, "update_block.flow_head.conv2",
                      F.relu(_conv(sd, "update_block.flow_head.conv1",
                                   net)))
        coords1 = coords1 + dflow

    mask = 0.25 * _conv(sd, "update_block.mask.2",
                        F.relu(_conv(sd, "update_block.mask.0", net)),
                        padding=0)
    flow_low = coords1 - coords0
    flow_up = _upsample_flow(flow_low, mask)
    return flow_low, flow_up
