"""Headline benchmark: stabilized 512x768 frames/sec/chip, 20-step img2img.

Measures the per-frame stabilized-generation cost of the pipeline's hot
path — VAE encode + 20 scanned DDIM steps with CFG (2x UNet evals/step)
+ VAE decode at 512x768 — on the available accelerator, bf16 params.
This is the workload the reference runs per frame
(guided_ldm_inpainting.py:241-250: 50-step schedule, t_enc=20, CFG 7).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}
vs_baseline is against the BASELINE.json north-star target of
4 frames/s/chip (the reference publishes no numbers of its own).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: through the axon tunnel a cold compile of
# the scanned denoise program takes minutes; the on-disk cache makes every
# later process (including the driver's bench run) hit it warm. Scoped to
# TPU executables only — foreign-host CPU AOT entries can SIGILL (see
# utils/compile_cache.py).
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
from sd_animation_optical_flow_tpu.utils.compile_cache import \
    enable_tpu_compile_cache  # noqa: E402

enable_tpu_compile_cache(_CACHE)

NORTH_STAR_FPS = 4.0
H, W = 512, 768
DDIM_STEPS = 50
T_ENC = 20  # 0.4 * 50

# Wall-clock budget: the driver runs this under a hard timeout, and a
# single cold remote compile can eat 20 minutes (round 3: batch-1 compile
# 1209.6s -> rc 124, the whole round's number forfeited). Every milestone
# below prints the best-so-far JSON line IMMEDIATELY (the driver takes the
# last parseable line), and remaining work is skipped once the budget is
# spent so the process exits cleanly with whatever it banked.
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
_T_START = time.perf_counter()


def _budget_left():
    return BENCH_BUDGET_S - (time.perf_counter() - _T_START)


_STATE = {"best_fps": 0.0, "best_batch": 0, "extra": {}, "derived": False}


def emit(backend):
    """Print the best-so-far headline JSON line (cumulative; called after
    EVERY successful measurement so a later timeout cannot un-bank it)."""
    s = _STATE
    if s["derived"]:
        metric = ("stabilized 512x768 frames/s/chip (derived from measured "
                  f"CFG UNet step x{T_ENC} + 5% VAE, bf16, "
                  f"batch={s['best_batch']}, {backend})")
    else:
        metric = ("stabilized 512x768 frames/s/chip (20-step img2img, "
                  f"CFG 7, bf16, batch={s['best_batch']}, {backend})")
    extra = dict(s["extra"])
    if "dpmpp10_fps" in extra:
        # the round-4-blessed north-star operating point (BASELINE.md):
        # >=4 f/s/chip demonstrated at DPM++(2M) 10-step; the DDIM-20
        # pinned metric above stays reported against its ~2.3-2.4
        # single-chip floor
        extra["dpmpp10_vs_north_star"] = round(
            extra["dpmpp10_fps"] / NORTH_STAR_FPS, 4)
    print(json.dumps({
        "metric": metric,
        "value": round(s["best_fps"], 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(s["best_fps"] / NORTH_STAR_FPS, 4),
        **extra,
    }), flush=True)


def build_params(dtype=jnp.bfloat16):
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.models import vae as V

    ucfg = U.UNetConfig()
    vcfg = V.VAEConfig()
    from sd_animation_optical_flow_tpu.models.layers import cast_tree
    cast = lambda t: cast_tree(t, dtype)
    # init fully on host CPU (every op through the TPU tunnel is slow —
    # even PRNG key splits stay on the CPU backend)
    from sd_animation_optical_flow_tpu.models.layers import numpy_init
    # init straight in the target dtype: a separate f32 stage pushes
    # the host past its fast-memory window (utils/hostmem.py)
    with jax.default_device(jax.local_devices(backend="cpu")[0]), \
            numpy_init(dtype):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        unet_p = cast(U.unet_init(k1, ucfg))
        vae_p = cast(V.vae_init(k2, vcfg))
    dev = jax.devices()[0]
    from sd_animation_optical_flow_tpu.utils.staging import \
        device_put_tree_packed
    return (device_put_tree_packed(unet_p, dev), ucfg,
            device_put_tree_packed(vae_p, dev), vcfg)


def make_unified_frame_step(unet_p, ucfg, vae_p, vcfg):
    """One frame step parameterized by SAMPLER COEFFICIENT DATA
    (diffusion/multistep.py): VAE encode -> stochastic_encode at T_ENC
    -> unified multistep scan (CFG 7, stem dedup) -> VAE decode.

    DDIM-20 and DPM++(2M)-10 (padded to 20 slots) are the SAME compiled
    program fed different coefficient arrays — one ~140MB executable
    load through the device link banks BOTH headline metrics (round 4:
    the second sampler's separate executable never fit the budget)."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion import multistep as M
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params_traced, make_linear_schedule)
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.models import vae as V

    sched = make_linear_schedule()

    def frame_step(unet_p, vae_p, img, ctx_c, ctx_u, rng, coeffs):
        lat = V.encode(vae_p, vcfg, img, rng=rng, sample=True)
        ddim = make_ddim_params_traced(sched, DDIM_STEPS)
        noise = jax.random.normal(rng, lat.shape, lat.dtype)
        x1 = D.stochastic_encode(ddim, lat, T_ENC, noise)

        def model_fn(x, t, c, control=None):
            pair = c if isinstance(c, tuple) else None
            return U.unet_apply(unet_p, ucfg, x, t,
                                None if pair is not None else c,
                                context_pair=pair)[0]

        out = M.multistep_decode(model_fn, coeffs, x1,
                                 D.CondBundle(crossattn=ctx_c),
                                 D.CondBundle(crossattn=ctx_u),
                                 cfg_scale=7.0, cfg_dedup=True)
        return jnp.clip(V.decode(vae_p, vcfg, out), -1, 1)

    return frame_step


def make_sampler_coeffs():
    """(ddim20, dpmpp10-padded-to-20) coefficient sets for the unified
    frame step. Built host-side; runtime data, not trace constants."""
    from sd_animation_optical_flow_tpu.diffusion import multistep as M
    from sd_animation_optical_flow_tpu.diffusion.dpm_solver import \
        uniform_timesteps_desc
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)
    sched = make_linear_schedule()
    ddim = make_ddim_params(sched, DDIM_STEPS)
    co_ddim = M.make_ddim_coeffs(ddim, T_ENC)
    dts = uniform_timesteps_desc(sched, int(ddim.timesteps[T_ENC]), 10)
    co_dpm = M.make_dpmpp_coeffs(sched, dts, pad_to=T_ENC)
    return co_ddim, co_dpm


class UnifiedBench:
    """Chained-frame measurement over ONE jitted program: frame count n
    AND sampler coefficients are runtime data, so n=1, n=3, DDIM and
    DPM++ all share a single executable (one tunnel load total).

    Frames chain output->input inside the program (nothing elided or
    overlapped); rate = batch*(hi-lo)/(t_hi-t_lo) cancels dispatch
    overhead and the scalar readback exactly."""

    def __init__(self, raw_fn, unet_p, vae_p, batch, dtype, ctx_dim=768):
        import functools

        from jax import lax

        @jax.jit
        def chained(up, vp, img, ctx_c, ctx_u, rng, n, coeffs):
            def body(i, im):
                out = raw_fn(up, vp, im, ctx_c, ctx_u,
                             jax.random.fold_in(rng, i), coeffs)
                return out.astype(im.dtype)
            final = lax.fori_loop(0, n, body, img)
            return jnp.sum(final.astype(jnp.float32))

        self._run = functools.partial(
            chained, unet_p, vae_p,
            jnp.zeros((batch, H, W, 3), dtype),
            jnp.zeros((batch, 231, ctx_dim), dtype),
            jnp.zeros((batch, 231, ctx_dim), dtype))
        self.batch = batch
        self.key = jax.random.PRNGKey(1)

    def warmup(self, coeffs):
        """First dispatch: compile (or cache-load) + params upload —
        the dominant tunnel cost. Returns a CONSERVATIVE provisional
        frames/s from one warm n=1 run (includes dispatch overhead, so
        it strictly underestimates; bankable immediately)."""
        t0 = time.perf_counter()
        jax.device_get(self._run(self.key, 1, coeffs))
        print(f"# batch {self.batch}: compile+run "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
              flush=True)
        t0 = time.perf_counter()
        jax.device_get(self._run(self.key, 1, coeffs))
        dt = time.perf_counter() - t0
        return self.batch / dt if dt > 0 else 0.0

    def measure(self, coeffs, *, lo=1, hi=3, trials=3):
        t_lo = t_hi = float("inf")
        for trial in range(trials):
            k = jax.random.fold_in(self.key, trial)
            t0 = time.perf_counter()
            jax.device_get(self._run(k, lo, coeffs))
            t_lo = min(t_lo, time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.device_get(self._run(k, hi, coeffs))
            t_hi = min(t_hi, time.perf_counter() - t0)
        if t_hi <= t_lo:
            return 0.0
        return self.batch * (hi - lo) / (t_hi - t_lo)


def probe_delivered_tfs():
    """Measure the chip's CURRENTLY delivered bf16 matmul rate (the
    tunnel chip is shared and non-stationary — recorded alongside the
    f/s headline so numbers are comparable across rounds). In-program
    fori_loop with a data-dependent carry: per-dispatch tunnel overhead
    is ~165ms and identical repeated dispatches are memoized, so
    neither a host rep loop nor repeated identical calls measure the
    chip. Overhead cancels via (t(hi) - t(lo)) / (hi - lo)."""
    import functools
    n = 8192
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(key, (n, n), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(a, b, iters):
        def body(i, z):
            c = (a + z.astype(a.dtype) * 1e-6) @ b
            return (jnp.max(jnp.abs(c)) * 1e-6).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    lo, hi = 2, 12
    float(run(a, b, lo))
    float(run(a, b, hi))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run(a, b, lo))
        tlo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run(a, b, hi))
        thi = time.perf_counter() - t0
        best = min(best, (thi - tlo) / (hi - lo))
    return 2 * n ** 3 / best / 1e12


def make_frame_step_loop(unet_p, ucfg, vae_p, vcfg):
    """Python-level step loop over a jitted CFG UNet eval + jitted VAE
    programs. Same math as the scanned path, but the biggest compiled
    unit is one UNet step — a fallback for environments where compiling
    the full scan is impractical (BENCH_MODE=loop). Async dispatch
    pipelines the 40 step launches, so throughput is comparable."""
    from sd_animation_optical_flow_tpu.diffusion import ddim as D
    from sd_animation_optical_flow_tpu.diffusion.schedule import (
        make_ddim_params, make_linear_schedule)
    from sd_animation_optical_flow_tpu.models import unet as U
    from sd_animation_optical_flow_tpu.models import vae as V

    import numpy as np

    sched = make_linear_schedule()
    ddim = make_ddim_params(sched, DDIM_STEPS)
    # host-side copies: indexing device arrays per step would sync
    # through the tunnel every iteration
    h_ts = np.asarray(ddim.timesteps)
    h_a = np.asarray(ddim.alphas)
    h_ap = np.asarray(ddim.alphas_prev)
    h_s1m = np.asarray(ddim.sqrt_one_minus_alphas)

    # params as explicit jit args (see make_frame_step note): keeps the
    # remote-compile payload small instead of baking GBs of constants
    @jax.jit
    def encode(vp, img, rng):
        lat = V.encode(vp, vcfg, img, rng=rng, sample=True)
        noise = jax.random.normal(rng, lat.shape, lat.dtype)
        return D.stochastic_encode(ddim, lat, T_ENC, noise)

    @jax.jit
    def cfg_step(up, x, ts, a_t, a_prev, s1m, ctx_u, ctx_c):
        # CFG stem dedup: half-batch stem, double at first cross-attn
        out, _ = U.unet_apply(up, ucfg, x, ts, None,
                              context_pair=(ctx_u, ctx_c))
        e_u, e_c = jnp.split(out, 2, axis=0)
        e_t = e_u + 7.0 * (e_c - e_u)
        pred_x0 = (x - s1m * e_t) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1 - a_prev) * e_t

    @jax.jit
    def decode(vp, lat):
        return jnp.clip(V.decode(vp, vcfg, lat), -1, 1)

    def frame_step(img, ctx_c, ctx_u, rng):
        b = img.shape[0]
        x = encode(vae_p, img, rng)
        for i in range(T_ENC - 1, -1, -1):
            ts = jnp.full((b,), int(h_ts[i]), jnp.int32)
            x = cfg_step(unet_p, x, ts, float(h_a[i]), float(h_ap[i]),
                         float(h_s1m[i]), ctx_u, ctx_c)
        return decode(vae_p, x)

    return frame_step


def bench_step_mode(unet_p, ucfg, dtype, batch):
    """Minimal reliable mode: measure one CFG UNet eval (the 97% cost
    share of a stabilized frame: 40 evals/frame) and derive frames/s.
    Exists because some remote-compile environments make the fused
    programs impractical to compile; the UNet step alone is known-good."""
    from sd_animation_optical_flow_tpu.models import unet as U

    @jax.jit
    def step(up, x, t, ctx):
        return U.unet_apply(up, ucfg, x, t, ctx)[0]

    x = jnp.zeros((2 * batch, H // 8, W // 8, 4), dtype)
    t = jnp.full((2 * batch,), 500, jnp.int32)
    ctx = jnp.zeros((2 * batch, 231, 768), dtype)
    t0 = time.perf_counter()
    out = step(unet_p, x, t, ctx)
    out.block_until_ready()
    print(f"# step-mode batch {batch}: compile+run "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(unet_p, out * 0.99, t, ctx)
    out.block_until_ready()
    per_step = (time.perf_counter() - t0) / reps
    # a frame = 2*T_ENC CFG-halves = T_ENC step calls at CFG batch;
    # VAE enc+dec adds ~5% on this workload — include a 1.05 factor
    frame_s = per_step * T_ENC * 1.05
    return batch / frame_s


def main():
    backend = jax.default_backend()
    dtype = jnp.bfloat16
    t0 = time.perf_counter()
    unet_p, ucfg, vae_p, vcfg = build_params(dtype)
    print(f"# init {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)
    # default scan: the whole 20-step frame is ONE compiled program.
    # On the axon tunnel a DEPENDENT dispatch costs seconds of RTT, so
    # python-level step loops measure tunnel latency, not the chip
    # (measured: 85ms/step in-program vs 4.4s/step chained).
    mode = os.environ.get("BENCH_MODE", "scan")
    if mode == "step":
        best_fps, best_batch = 0.0, 0
        for batch in (1, 4):
            try:
                fps = bench_step_mode(unet_p, ucfg, dtype, batch)
                print(f"# step-mode batch {batch}: {fps:.3f} fps",
                      file=sys.stderr, flush=True)
                if fps > best_fps:
                    best_fps, best_batch = fps, batch
            except Exception as e:  # noqa: BLE001
                print(f"# step-mode batch {batch} failed: {e}",
                      file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": "stabilized 512x768 frames/s/chip (derived from "
                      f"measured CFG UNet step x{T_ENC} + 5% VAE, bf16, "
                      f"batch={best_batch}, {backend})",
            "value": round(best_fps, 4),
            "unit": "frames/s/chip",
            "vs_baseline": round(best_fps / NORTH_STAR_FPS, 4),
        }))
        return
    if mode == "loop":
        return _main_loop_mode(unet_p, ucfg, vae_p, vcfg, dtype, backend)

    raw = make_unified_frame_step(unet_p, ucfg, vae_p, vcfg)
    co_ddim, co_dpm = make_sampler_coeffs()
    # batch 8 only by default: it is the measured-best operating point
    # across rounds (r4 sweep: 8 -> 2.168, 16 -> 2.055, 1 -> 1.612 f/s;
    # batch-12/24 step probes worse, DECISIONS), and dropping the sweep
    # keeps the whole run incl. dpmpp + TF/s extras ~12 min warm — well
    # inside the driver's wall clock (round-3 lesson: rc 124 forfeited
    # the round). Override with BENCH_BATCHES=8,16,1 for a sweep; best
    # batch still runs FIRST so one measurement banks the headline.
    batches = [int(b) for b in
               os.environ.get("BENCH_BATCHES", "8").split(",")] \
        if backend == "tpu" else [1]
    for i, batch in enumerate(batches):
        if _STATE["best_fps"] > 0.0 and _budget_left() < 120:
            print(f"# budget spent ({BENCH_BUDGET_S:.0f}s): skipping "
                  f"batches {batches[i:]}", file=sys.stderr, flush=True)
            break
        try:
            ub = UnifiedBench(raw, unet_p, vae_p, batch, dtype)
            # provisional line as early as possible: one warm n=1 run is
            # a conservative (dispatch-inclusive) lower bound — bank it
            # before the longer differencing refinement (round 3 lost
            # its number to a timeout before ANY line printed)
            prov = ub.warmup(co_ddim)
            print(f"# batch {batch}: provisional {prov:.3f} fps "
                  "(single warm run, dispatch-inclusive)",
                  file=sys.stderr, flush=True)
            if prov > _STATE["best_fps"]:
                _STATE["best_fps"], _STATE["best_batch"] = prov, batch
                emit(backend)  # bank it NOW
            fps = ub.measure(co_ddim)
            print(f"# batch {batch}: {fps:.3f} fps (chained in-program "
                  "differencing)", file=sys.stderr, flush=True)
            if fps > _STATE["best_fps"]:
                _STATE["best_fps"], _STATE["best_batch"] = fps, batch
            if fps > 0.0:
                emit(backend)  # bank it NOW
            # DPM++(2M) 10-step IMMEDIATELY after the first successful
            # DDIM measurement (round-4 lesson: it sat behind the wrong
            # gate and was skipped). It shares this batch's executable
            # (coefficients are runtime data), so its marginal cost is
            # ~30s of warm runs — no second tunnel load.
            if backend == "tpu" and "dpmpp10_fps" not in _STATE["extra"]:
                if _budget_left() > 60:
                    fps_dpm = ub.measure(co_dpm)
                    print(f"# dpmpp 10-step batch {batch}: "
                          f"{fps_dpm:.3f} fps", file=sys.stderr,
                          flush=True)
                    if fps_dpm > 0.0:
                        _STATE["extra"]["dpmpp10_fps"] = round(fps_dpm, 4)
                        emit(backend)
                else:
                    print("# budget spent: skipping dpmpp",
                          file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 — report what we have
            print(f"# bench batch={batch} failed: {e}", file=sys.stderr)
    if _STATE["best_fps"] > 0.0 and backend == "tpu":
        # the chip's delivered matmul rate, so cross-round f/s numbers
        # on the shared tunnel chip are comparable
        if _budget_left() > 60:
            try:
                _STATE["extra"]["delivered_tfs_bf16"] = round(
                    probe_delivered_tfs(), 1)
                emit(backend)
            except Exception as e:  # noqa: BLE001
                print(f"# tf/s probe failed: {e}", file=sys.stderr)
        else:
            print("# budget spent: skipping tf/s probe", file=sys.stderr,
                  flush=True)
    if _STATE["best_fps"] == 0.0:
        # every fused-program batch failed (flaky remote-compile tunnel):
        # fall back to the known-good step mode so the run still yields a
        # real measurement instead of a zero
        print("# scan mode yielded nothing; falling back to step mode",
              file=sys.stderr, flush=True)
        _STATE["derived"] = True
        for batch in (1, 4):
            try:
                fps = bench_step_mode(unet_p, ucfg, dtype, batch)
                if fps > _STATE["best_fps"]:
                    _STATE["best_fps"], _STATE["best_batch"] = fps, batch
                    emit(backend)
            except Exception as e:  # noqa: BLE001
                print(f"# step-mode batch {batch} failed: {e}",
                      file=sys.stderr, flush=True)
    emit(backend)


def _main_loop_mode(unet_p, ucfg, vae_p, vcfg, dtype, backend):
    """Legacy per-call loop-mode bench (BENCH_MODE=loop): python-level
    step loop, block_until_ready timing. Kept as a fallback for
    environments where the chained fori program cannot compile; its
    timing is dispatch-polluted on the axon tunnel."""
    fn = make_frame_step_loop(unet_p, ucfg, vae_p, vcfg)
    key = jax.random.PRNGKey(1)
    best_fps, best_batch = 0.0, 0
    for batch in ([1, 8] if backend == "tpu" else [1]):
        try:
            img = jnp.zeros((batch, H, W, 3), dtype)
            ctx = jnp.zeros((batch, 231, 768), dtype)
            out = fn(img, ctx, ctx, key)
            out.block_until_ready()
            dt = float("inf")
            for trial in range(3):
                t0 = time.perf_counter()
                out = fn(img, ctx, ctx, jax.random.fold_in(key, trial))
                out.block_until_ready()
                dt = min(dt, time.perf_counter() - t0)
            fps = batch / dt
            if fps > best_fps:
                best_fps, best_batch = fps, batch
        except Exception as e:  # noqa: BLE001
            print(f"# loop batch={batch} failed: {e}", file=sys.stderr)
    print(json.dumps({
        "metric": ("stabilized 512x768 frames/s/chip (20-step img2img, "
                   f"CFG 7, bf16, batch={best_batch}, {backend}, "
                   "loop mode)"),
        "value": round(best_fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(best_fps / NORTH_STAR_FPS, 4),
    }))


if __name__ == "__main__":
    main()
