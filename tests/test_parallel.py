"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sd_animation_optical_flow_tpu.diffusion.schedule import \
    make_linear_schedule
from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.ops.attention import xla_attention
from sd_animation_optical_flow_tpu.parallel import mesh as M
from sd_animation_optical_flow_tpu.parallel.ring_attention import \
    ring_attention
from sd_animation_optical_flow_tpu.parallel.sharding import (
    shard_params, unet_param_specs)
from sd_animation_optical_flow_tpu.training import train_step as TS


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_mesh_construction():
    m = M.make_mesh()
    assert m.shape == {"dp": 8, "tp": 1}
    m2 = M.make_mesh(dp=4, tp=2)
    assert m2.shape == {"dp": 4, "tp": 2}


def test_unet_param_specs_rules(rng):
    cfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                       attention_resolutions=(1,), num_heads=2,
                       context_dim=32)
    params = U.unet_init(rng, cfg)
    specs = unet_param_specs(params)
    blk = None
    for b in params["input_blocks"]:
        if "transformer" in b:
            blk = b
            sblk = specs["input_blocks"][params["input_blocks"].index(b)]
            break
    tb = sblk["transformer"]["blocks"][0]
    assert tb["attn1"]["to_q"]["w"] == P(None, "tp")
    assert tb["attn1"]["to_out"]["w"] == P("tp", None)
    assert tb["ff_proj"]["w"] == P(None, "tp")
    assert tb["ff_out"]["w"] == P("tp", None)
    # convs replicated
    assert specs["input_blocks"][0]["conv"]["w"] == P()


def test_sharded_unet_forward_matches_single(rng):
    cfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                       attention_resolutions=(1,), num_heads=2,
                       context_dim=32)
    params = U.unet_init(rng, cfg)
    x = jax.random.normal(rng, (8, 8, 8, 4))
    t = jnp.arange(8)
    ctx = jax.random.normal(rng, (8, 7, 32))
    ref, _ = jax.jit(lambda p, x, t, c: U.unet_apply(p, cfg, x, t, c))(
        params, x, t, ctx)

    m = M.make_mesh(dp=4, tp=2)
    p_sh, _ = shard_params(params, m)
    xs = jax.device_put(x, M.batch_sharding(m))
    ts = jax.device_put(t, NamedSharding(m, P("dp")))
    cs = jax.device_put(ctx, NamedSharding(m, P("dp", None, None)))
    out, _ = jax.jit(lambda p, x, t, c: U.unet_apply(p, cfg, x, t, c))(
        p_sh, xs, ts, cs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)


def test_ring_attention_matches_dense(rng):
    m = M.make_mesh()  # 8-way over 'dp'
    b, n, h, d = 2, 64, 4, 16
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (b, n, h, d))
    k = jax.random.normal(k2, (b, n, h, d))
    v = jax.random.normal(k3, (b, n, h, d))
    ref = xla_attention(q, k, v)
    out = ring_attention(q, k, v, m, seq_axis="dp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_sharded_train_step_runs_and_reduces_loss(rng):
    cfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                       attention_resolutions=(1,), num_heads=2,
                       context_dim=32)
    params = U.unet_init(rng, cfg)
    sched = make_linear_schedule(100)
    tx = TS.make_optimizer(lr=1e-3)
    state = TS.init_train_state(params, tx)

    m = M.make_mesh(dp=4, tp=2)
    state = TS.shard_train_state(state, m)
    step = TS.make_train_step(cfg, sched, tx)

    x0 = jax.device_put(jax.random.normal(rng, (8, 8, 8, 4)),
                        M.batch_sharding(m))
    ctx = jax.device_put(jax.random.normal(rng, (8, 7, 32)),
                         NamedSharding(m, P("dp", None, None)))
    losses = []
    fixed = jax.random.fold_in(rng, 123)   # fixed noise/t -> deterministic
    for _ in range(3):                     # objective that must decrease
        state, loss = step(state, x0, ctx, fixed)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3
    # same data + model each step: loss must go down while memorizing
    assert losses[-1] < losses[0]


def test_ulysses_attention_matches_dense(rng):
    """Ulysses all-to-all sequence parallelism computes the same
    attention as the dense single-device reference."""
    import numpy as np
    from sd_animation_optical_flow_tpu.parallel.mesh import make_mesh
    from sd_animation_optical_flow_tpu.parallel.ring_attention import (
        ulysses_attention)
    from sd_animation_optical_flow_tpu.ops.attention import xla_attention

    mesh = make_mesh(dp=8, tp=1)
    b, n, h, d = 2, 64, 8, 16
    q = jax.random.normal(rng, (b, n, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, n, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, n, h, d))
    got = ulysses_attention(q, k, v, mesh, seq_axis="dp")
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
