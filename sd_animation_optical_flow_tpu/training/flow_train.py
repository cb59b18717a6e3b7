"""Optical-flow training: RAFT sequence loss + jitted train step.

The reference vendors RAFT's datasets/augmentors but not its trainer;
this completes the training path the data layer (training/flow_data.py)
feeds. Loss follows the RAFT recipe: exponentially-weighted L1 over the
per-iteration predictions (gamma^(N-i-1)), invalid/extreme-flow pixels
masked out, plus end-point-error metrics.

TPU shape notes: one jitted step per static (batch, crop) shape — the
batch iterator's fixed crop sizes keep it compiled once; batch shards
over a 'dp' mesh axis with XLA inserting the gradient psums.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import raft as RF


def sequence_loss(flow_preds, flow_gt, valid, *, gamma: float = 0.8,
                  max_flow: float = 400.0):
    """flow_preds [I, N, H, W, 2] (per-iteration upsampled predictions),
    flow_gt [N, H, W, 2], valid [N, H, W] in {0, 1}.

    Returns (loss, metrics dict with epe / 1px / 3px / 5px rates).
    """
    n_iters = flow_preds.shape[0]
    mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1))
    mask = (valid >= 0.5) & (mag < max_flow)            # [N, H, W]
    denom = jnp.maximum(jnp.sum(mask), 1.0)

    weights = gamma ** jnp.arange(n_iters - 1, -1, -1, dtype=jnp.float32)
    l1 = jnp.sum(jnp.abs(flow_preds - flow_gt[None]), axis=-1)  # [I,N,H,W]
    per_iter = jnp.sum(l1 * mask[None], axis=(1, 2, 3)) / denom
    loss = jnp.sum(weights * per_iter)

    epe_map = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    epe = jnp.sum(epe_map * mask) / denom
    metrics = {
        "epe": epe,
        "1px": jnp.sum((epe_map < 1.0) * mask) / denom,
        "3px": jnp.sum((epe_map < 3.0) * mask) / denom,
        "5px": jnp.sum((epe_map < 5.0) * mask) / denom,
    }
    return loss, metrics


class FlowTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_flow_optimizer(lr: float = 4e-4, weight_decay: float = 1e-4,
                        clip: float = 1.0):
    """RAFT's AdamW + gradient clipping recipe."""
    return optax.chain(optax.clip_by_global_norm(clip),
                       optax.adamw(lr, weight_decay=weight_decay))


def init_flow_train_state(params, tx) -> FlowTrainState:
    return FlowTrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "iters", "gamma"))
def flow_train_step(state: FlowTrainState, cfg: RF.RAFTConfig, tx,
                    image1, image2, flow_gt, valid, *,
                    iters: int = 12, gamma: float = 0.8):
    """One optimization step. images [N,H,W,3] RGB 0..255 float32."""

    def loss_fn(params):
        _, flows_up = RF.raft_apply(params, cfg, image1, image2,
                                    iters=iters, all_iters=True)
        return sequence_loss(flows_up, flow_gt, valid, gamma=gamma)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = FlowTrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
    return new_state, loss, metrics


# ---------------------------------------------------------------------------
# learned uncertainty decoder training (reference: pdcnet_of.py:66-75 —
# PDCNet+'s confidence comes from a TRAINED head; this trains ours)
# ---------------------------------------------------------------------------

def uncertainty_nll_loss(log_b_low, flow_up, flow_gt, valid):
    """Laplace negative log-likelihood of the FLOW ERROR under the
    head's predicted per-pixel scale.

    log_b_low [N,H/8,W/8] (head output), flow_up/flow_gt [N,H,W,2],
    valid [N,H,W]. The scale upsamples bilinearly to full res exactly
    like inference (models/flowconf.py:learned_confidence), so training
    and serving see the same parameterization. Returns (nll, metrics)
    where metrics include the error/scale correlation — the statistic
    the calibration study tracks.
    """
    n, h, w = flow_up.shape[0], flow_up.shape[1], flow_up.shape[2]
    log_b = jax.image.resize(log_b_low, (n, h, w), method="bilinear")
    b = jnp.exp(log_b)
    e_abs = jnp.sum(jnp.abs(flow_up - flow_gt), axis=-1)    # |ex|+|ey|
    mask = valid >= 0.5
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    nll_map = e_abs / b + 2.0 * log_b + 2.0 * jnp.log(2.0)
    nll = jnp.sum(nll_map * mask) / denom

    # calibration diagnostic: Pearson correlation between predicted
    # scale and realized absolute error over valid pixels
    def masked_corr(a, c):
        ma = jnp.sum(a * mask) / denom
        mc = jnp.sum(c * mask) / denom
        va = jnp.sum((a - ma) ** 2 * mask) / denom
        vc = jnp.sum((c - mc) ** 2 * mask) / denom
        cov = jnp.sum((a - ma) * (c - mc) * mask) / denom
        return cov / jnp.sqrt(va * vc + 1e-12)

    metrics = {"nll": nll, "err_scale_corr": masked_corr(b, e_abs),
               "mean_b": jnp.sum(b * mask) / denom}
    return nll, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "tx", "iters",
                                             "bce_weight", "radius"))
def uncertainty_train_step(state: FlowTrainState, raft_params,
                           cfg: RF.RAFTConfig, tx,
                           image1, image2, flow_gt, valid, *,
                           iters: int = 12, disoccluded=None,
                           bce_weight: float = 0.0,
                           radius: float = 1.0 / 3.0):
    """One head-only optimization step: RAFT runs frozen (its features
    and predictions are stop-gradiented) and only the uncertainty-head
    params in ``state`` update — the PDCNet+ recipe of training the
    uncertainty decoder on a frozen matching network.

    ``disoccluded`` + ``bce_weight`` add a class-balanced BCE on the
    SERVED confidence mapping (learned_confidence's (1-exp(-R/b))^2)
    against the ground-truth disocclusion mask: the NLL calibrates b to
    |flow error| everywhere, while the BCE sharpens exactly the
    decision the pipelines threshold (conf < thres drives the inpaint
    mask, ofgen_pixel_inpaint.py:262). The NLL stays the primary loss."""
    from ..models import flowconf as FC

    flow_low, flow_up, net = RF.raft_apply(
        raft_params, cfg, image1, image2, iters=iters, with_features=True)
    flow_low = jax.lax.stop_gradient(flow_low)
    flow_up = jax.lax.stop_gradient(flow_up)
    net = jax.lax.stop_gradient(net)

    def loss_fn(head_params):
        log_b = FC.uncertainty_head_apply(head_params, net, flow_low)
        nll, metrics = uncertainty_nll_loss(log_b, flow_up, flow_gt,
                                            valid)
        if disoccluded is None or bce_weight <= 0.0:
            return nll, metrics
        conf = FC.learned_confidence(log_b, flow_up.shape[1:3], radius)
        conf = jnp.clip(conf, 1e-6, 1.0 - 1e-6)
        dis = disoccluded >= 0.5
        n_pos = jnp.maximum(jnp.sum(dis), 1.0)
        n_neg = jnp.maximum(jnp.sum(~dis), 1.0)
        # balanced per-class means: disoccluded pixels are a few percent
        # of the frame and would otherwise vanish from the gradient
        bce = 0.5 * (jnp.sum(-jnp.log1p(-conf) * dis) / n_pos
                     + jnp.sum(-jnp.log(conf) * (~dis)) / n_neg)
        metrics = {**metrics, "bce": bce}
        return nll + bce_weight * bce, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return FlowTrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), loss, metrics
