"""Terminal-step vs per-step K/V capture ablation (VERDICT r1 item 9).

The reference captures self-attention K/V on EVERY attention call during
the denoise loop (reference: ldm/modules/attention.py:353) and the
orchestrator pickles whatever the last call produced — i.e. the K/V of
the final executed step. This repo captures once, from the finished
latent at the terminal timestep t=1 (pipelines/facades.py capture_kv),
which is cheaper (no per-step capture traffic) and scan-friendly.

This test quantifies the difference on a tiny model: it denoises a
reference frame while capturing K/V at every step, then denoises a
target frame three ways — injecting the terminal-step K/V, injecting
step-matched per-step K/V, and with no injection. The claim pinned here:
the capture-point choice (terminal vs per-step) moves the output LESS
than injection itself does, i.e. terminal capture preserves the
mechanism's effect. It also pins the K/V drift statistic (cosine
similarity between terminal and per-step K/V) that justifies the design.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.diffusion.schedule import (
    make_ddim_params, make_linear_schedule)
from sd_animation_optical_flow_tpu.diffusion.ddim import stochastic_encode
from sd_animation_optical_flow_tpu.models import unet as U

T_ENC = 4
DDIM_STEPS = 8
CFG = 3.0


def _perturb_zeros(params, rng, scale=0.05):
    """Zero-init convs (resblock out_conv, transformer proj_out, final
    conv) make a random UNet's output exactly 0 and hide attention-path
    changes; give every all-zero leaf small random values."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for leaf, key in zip(leaves, keys):
        if isinstance(leaf, jnp.ndarray) and leaf.size and \
                not bool(jnp.any(leaf != 0)):
            leaf = jax.random.normal(key, leaf.shape, leaf.dtype) * scale
        out.append(leaf)
    return jax.tree.unflatten(treedef, out)


@pytest.fixture(scope="module")
def setup():
    ucfg = U.UNetConfig(in_channels=4, model_channels=16,
                        channel_mult=(1, 2), attention_resolutions=(1,),
                        num_heads=2, context_dim=32)
    rng = jax.random.PRNGKey(42)
    k_init, k_pert, k_ctx, k_lat = jax.random.split(rng, 4)
    params = _perturb_zeros(U.unet_init(k_init, ucfg), k_pert)
    ctx_c = jax.random.normal(k_ctx, (1, 7, 32))
    ctx_u = jnp.zeros((1, 7, 32))
    lat_ref = jax.random.normal(k_lat, (1, 16, 16, 4)) * 0.5
    lat_tgt = jnp.roll(lat_ref, 5, axis=2) + 0.1
    sched = make_linear_schedule()
    ddim = make_ddim_params(sched, DDIM_STEPS)
    return params, ucfg, ctx_c, ctx_u, lat_ref, lat_tgt, sched, ddim


def _denoise(params, ucfg, ddim, x0, ctx_c, ctx_u, rng, *,
             ref_kv_per_step=None, ref_kv_static=None, capture=False):
    """Manual t_enc-step deterministic DDIM decode (eps param, eta 0 —
    the guided_ldm.py:133-158 loop) with optional per-step K/V capture
    or injection. Returns (x_final, captured list per step)."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x = stochastic_encode(ddim, x0, T_ENC, noise)
    captured = []
    ctx2 = jnp.concatenate([ctx_u, ctx_c], axis=0)
    for i in range(T_ENC - 1, -1, -1):
        ts = jnp.full((1,), int(ddim.timesteps[i]), jnp.int32)
        if capture:
            _, kv = U.unet_apply(params, ucfg, x, ts, ctx_c)
            captured.append(kv)
        rkv = None
        if ref_kv_per_step is not None:
            rkv = ref_kv_per_step[T_ENC - 1 - i]
        elif ref_kv_static is not None:
            rkv = ref_kv_static
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([ts, ts], axis=0)
        out, _ = U.unet_apply(params, ucfg, x2, t2, ctx2, ref_kv=rkv)
        e_u, e_c = jnp.split(out, 2, axis=0)
        e_t = e_u + CFG * (e_c - e_u)
        a_t = ddim.alphas[i]
        a_prev = ddim.alphas_prev[i]
        pred_x0 = (x - ddim.sqrt_one_minus_alphas[i] * e_t) / jnp.sqrt(a_t)
        x = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * e_t
    return x, captured


def test_terminal_vs_per_step_kv_capture(setup):
    params, ucfg, ctx_c, ctx_u, lat_ref, lat_tgt, sched, ddim = setup
    key = jax.random.PRNGKey(0)

    # reference-frame denoise, capturing K/V at every step
    ref_final, per_step_kv = _denoise(params, ucfg, ddim, lat_ref,
                                      ctx_c, ctx_u, key, capture=True)
    assert len(per_step_kv) == T_ENC

    # terminal capture: K/V of the FINISHED latent at t=1 (the facade's
    # capture_kv semantics)
    ts1 = jnp.full((1,), 1, jnp.int32)
    _, terminal_kv = U.unet_apply(params, ucfg, ref_final, ts1, ctx_c)

    key_t = jax.random.PRNGKey(1)
    out_none, _ = _denoise(params, ucfg, ddim, lat_tgt, ctx_c, ctx_u, key_t)
    out_term, _ = _denoise(params, ucfg, ddim, lat_tgt, ctx_c, ctx_u, key_t,
                           ref_kv_static=terminal_kv)
    out_step, _ = _denoise(params, ucfg, ddim, lat_tgt, ctx_c, ctx_u, key_t,
                           ref_kv_per_step=per_step_kv)

    d_inj = float(jnp.abs(out_term - out_none).mean())
    d_var = float(jnp.abs(out_term - out_step).mean())
    # injection must do something, and the capture-point choice must move
    # the output less than the mechanism itself
    assert d_inj > 1e-5, d_inj
    assert d_var < d_inj, (d_var, d_inj)

    # pin the K/V drift statistic: terminal K/V stays directionally
    # aligned with every step's K/V (cosine similarity per layer)
    def cos(a, b):
        a = a.ravel()
        b = b.ravel()
        return float(a @ b / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-8))

    sims = []
    for step_kv in per_step_kv:
        for (tk, tv), (sk, sv) in zip(terminal_kv, step_kv):
            sims.append(cos(tk, sk))
            sims.append(cos(tv, sv))
    sims = np.asarray(sims)
    assert sims.mean() > 0.5, sims.mean()
    assert sims.min() > 0.0, sims.min()
    print(f"kv-ablation: d_inj={d_inj:.5f} d_var={d_var:.5f} "
          f"cos mean={sims.mean():.3f} min={sims.min():.3f}")
