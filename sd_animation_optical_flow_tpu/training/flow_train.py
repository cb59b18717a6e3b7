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
