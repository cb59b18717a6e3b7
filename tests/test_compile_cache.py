"""TPU-scoped persistent compile cache (utils/compile_cache.py).

A cached XLA:CPU executable is AOT-compiled against the build host's
CPU features; loading one written by a different machine can SIGILL
(observed killing a pytest run mid-suite). The guard vetoes every
non-TPU read/write at the compilation-cache chokepoint, so the shared
`.jax_cache` only ever holds chip-targeted (host-agnostic) TPU
executables."""

import os

import jax
import jax.numpy as jnp

from sd_animation_optical_flow_tpu.utils import compile_cache as CC


def test_guard_is_idempotent():
    from jax._src import compilation_cache as _cc
    CC.install_tpu_only_guard()
    first = _cc._get_cache
    CC.install_tpu_only_guard()
    assert _cc._get_cache is first, "double-install must not re-wrap"
    assert getattr(_cc._get_cache, "_tpu_only_guard", False)


def test_cpu_backend_never_writes_cache(tmp_path):
    """With the cache enabled at a fresh dir, compiling + running a
    >1s-compile-eligible program on the CPU backend must leave the dir
    empty — CPU executables are vetoed at the chokepoint."""
    cache_dir = str(tmp_path / "cache")
    os.makedirs(cache_dir)
    CC.enable_tpu_compile_cache(cache_dir)
    try:
        # force cache-eligibility: min compile time 0 would normally
        # persist even trivial programs
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)

        @jax.jit
        def f(x):
            return (x @ x.T).sum()

        x = jnp.ones((64, 64), jnp.float32)
        assert float(f(x)) == 64.0 * 64 * 64
        assert os.listdir(cache_dir) == [], (
            "CPU-backend executable leaked into the TPU-scoped cache")
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_compilation_cache_dir", None)


def test_cpu_backend_never_reads_cache(tmp_path):
    """_get_cache returns None for a CPU backend (read path short-
    circuits before any entry could be deserialized)."""
    from jax._src import compilation_cache as _cc
    CC.install_tpu_only_guard()
    backend = jax.local_devices(backend="cpu")[0].client
    assert _cc._get_cache(backend) is None
