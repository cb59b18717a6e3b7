"""Sharded diffusion fine-tuning step (dp x tp over a Mesh).

The reference's trainer is PyTorch-Lightning single-GPU (ddpm.py); the
TPU-native equivalent is one jitted step: batch sharded over 'dp',
UNet transformer weights sharded over 'tp' (parallel/sharding.py), XLA
inserting the gradient psums and TP collectives over ICI. No NCCL, no
process groups — the mesh is the only distribution configuration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.schedule import DiffusionSchedule
from ..models import unet as U
from ..parallel.sharding import unet_param_sharding
from .losses import p_losses


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-5, weight_decay: float = 1e-2):
    return optax.adamw(lr, weight_decay=weight_decay)


def init_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(unet_cfg: U.UNetConfig, sched: DiffusionSchedule, tx,
                    *, parameterization: str = "eps"):
    """Build the jitted (state, batch, rng) -> (state, loss) step."""

    def step_fn(state: TrainState, x0, context, rng, c_concat=None,
                y=None):
        loss, grads = jax.value_and_grad(p_losses)(
            state.params, unet_cfg, sched, x0, context, rng,
            parameterization=parameterization, c_concat=c_concat, y=y)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step_fn, donate_argnums=(0,))


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place params (and matching optimizer moments) on the mesh with the
    UNet tp/dp layout."""
    p_shard = unet_param_sharding(state.params, mesh)
    params = jax.device_put(state.params, p_shard)
    param_treedef = jax.tree_util.tree_structure(state.params)
    rep = NamedSharding(mesh, P())

    def place_opt(subtree):
        # optax moments (mu, nu) mirror the param tree exactly — shard
        # them identically; anything else (counts, empty states) replicates
        if jax.tree_util.tree_structure(subtree) == param_treedef:
            return jax.device_put(subtree, p_shard)
        return jax.tree.map(lambda x: jax.device_put(x, rep), subtree)

    opt_state = jax.tree.map(place_opt, state.opt_state,
                             is_leaf=lambda t: jax.tree_util.tree_structure(
                                 t) == param_treedef)
    step = jax.device_put(state.step, rep)
    return TrainState(params, opt_state, step)
