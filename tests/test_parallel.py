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


@pytest.fixture(autouse=True)
def _fresh_xla_state():
    """Drop compiled-executable/tracing caches before every test in
    this module: late in a full-suite run, ~200 tests of accumulated
    XLA state reproducibly segfault XLA:CPU (jax 0.9.0
    backend_compile_and_load) while compiling this module's
    8-virtual-device programs — each passes in isolation. Costs ~1 min
    of recompiles across the module."""
    jax.clear_caches()
    yield


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


def test_ulysses_attn_fn_mfr_matches_dense(rng):
    """Ulysses with the MFR strip attention as the inner attn_fn equals
    the dense materialized-bias reference — the sequence-parallel form
    of forward_mfr strip denoising."""
    from sd_animation_optical_flow_tpu.ops import attention as A
    from sd_animation_optical_flow_tpu.parallel.ring_attention import (
        ulysses_attention)

    mesh = M.make_mesh(dp=8, tp=1)
    h, w_tile, n_tiles, heads, d = 8, 4, 2, 8, 16
    N = h * n_tiles * w_tile
    q = jax.random.normal(rng, (2, N, heads, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, N, heads, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, N, heads, d))

    def attn_fn(qh, kh, vh):
        return A.strip_attention(qh, kh, vh, h=h, w_strip=n_tiles * w_tile,
                                 n_tiles=n_tiles, mode="target")

    got = ulysses_attention(q, k, v, mesh, seq_axis="dp", attn_fn=attn_fn)
    bias = A.mfr_strip_bias(h, w_tile, n_tiles)[None, None]
    want = A.xla_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _sp_bundle(rng):
    """Tiny bundle with 8 heads (divisible by the 8-way sp mesh)."""
    from sd_animation_optical_flow_tpu.models import clip as CL
    from sd_animation_optical_flow_tpu.models import vae as V
    from sd_animation_optical_flow_tpu.pipelines import facades as F
    from sd_animation_optical_flow_tpu.pipelines.tokenizer import \
        PromptTokenizer
    kv, ku, kc = jax.random.split(rng, 3)
    vcfg = V.VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)
    ucfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                        attention_resolutions=(1,), num_heads=8,
                        context_dim=32)
    ccfg = CL.CLIPTextConfig(vocab_size=49408, width=32, layers=1, heads=2)
    return F.StableDiffusionBundle(
        unet_params=U.unet_init(ku, ucfg), unet_cfg=ucfg,
        vae_params=V.vae_init(kv, vcfg), vae_cfg=vcfg,
        clip_params=CL.clip_text_init(kc, ccfg), clip_cfg=ccfg,
        tokenizer=PromptTokenizer(hf_name_or_path=None))


def test_strip_sp_denoise_matches_single(rng):
    """A strip-mode img2img denoise sharded over the 8-device mesh
    (H-row sharding + Ulysses attention + in-loop MFR bias) must match
    the single-device run — BASELINE config 5 end-to-end."""
    from sd_animation_optical_flow_tpu.pipelines import facades as F

    sd = _sp_bundle(rng)
    # 2-tile strip, 32x32 tiles -> latent 16x32, h=16 rows over 8 devices
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 64, 3)) * 2 - 1
    strip = U.StripConfig(n_tiles=2, mode="target")
    ref, _ = F.img2img(sd, img, "a", "b", 0.4, ddim_steps=4, seed=3,
                       strip=strip)
    mesh = M.make_mesh(dp=8, tp=1)
    sp = U.SeqParallelConfig(mesh=mesh, axis="dp")
    got, _ = F.img2img(sd, img, "a", "b", 0.4, ddim_steps=4, seed=3,
                       strip=strip, sp=sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_dp_inpaint_batch_sharded_matches_single(rng):
    """8-frame img2img_inpaint_batch sharded 8-ways over dp equals the
    single-device batch (same program, same tiled noise)."""
    from sd_animation_optical_flow_tpu.pipelines import facades as F
    from tests.test_pipeline import _tiny_bundle

    sd = _tiny_bundle(jax.random.PRNGKey(7), in_channels=9)
    b = 8
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (b, 32, 32, 3)) * 2 - 1
    refs = jax.random.uniform(jax.random.PRNGKey(1), (b, 32, 32, 3)) * 2 - 1
    masks = np.zeros((b, 32, 32), np.float32)
    masks[:, 8:24, 8:24] = 1.0
    texts = ["p"] * b
    ref = F.img2img_inpaint_batch(sd, imgs, texts, "n", masks, refs,
                                  denoising_strength=0.3, ddim_steps=4,
                                  mask_blur=0, seed=11)
    mesh = M.make_mesh(dp=8, tp=1)
    got = F.img2img_inpaint_batch(sd, imgs, texts, "n", masks, refs,
                                  denoising_strength=0.3, ddim_steps=4,
                                  mask_blur=0, seed=11, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
