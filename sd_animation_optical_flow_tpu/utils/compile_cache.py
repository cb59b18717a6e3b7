"""TPU-scoped persistent compilation cache.

Through the axon tunnel a cold compile of the scanned denoise program
takes minutes, so bench/profiling/entry processes share an on-disk
executable cache (``.jax_cache``). That cache must hold **TPU
executables only**:

- TPU executables target the chip, not the host — they share safely
  across machines (this container, the driver host).
- XLA:CPU results are AOT-compiled against the *build host's* CPU
  features. Loading an entry written by a different machine makes
  ``cpu_aot_loader`` warn "could lead to execution errors such as
  SIGILL", and we observed exactly that: a cached CPU
  ``_inpaint_fused`` executable segfaulted a pytest run inside
  ``compilation_cache.get_executable_and_time`` (the zstd payload was
  intact — the deserialized code was foreign).

JAX 0.9.0 has no per-backend cache switch (``is_cache_used`` is
per-task), and a process whose default backend is TPU still compiles
host-side programs on the CPU backend into the same cache. So
:func:`enable_tpu_compile_cache` both points JAX at the cache dir and
patches ``jax._src.compilation_cache._get_cache`` — the single
chokepoint used by both the read (``get_executable_and_time``) and
write (``put_executable_and_time``) paths — to return ``None`` for
non-TPU backends: CPU programs recompile locally (cheap) instead of
ever touching the shared cache.
"""

from __future__ import annotations

import jax


def enable_tpu_compile_cache(path: str) -> None:
    """Enable the persistent compilation cache at ``path`` for TPU
    executables only (no-op platform-wise for CPU-only processes: the
    dir is configured but every lookup/insert is vetoed)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # the XLA-internal AOT sub-caches are machine-feature-specific and
    # the tunnel compiles remotely — keep only the executable cache
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    install_tpu_only_guard()


def install_tpu_only_guard() -> None:
    """Patch the compilation-cache chokepoint so only TPU backends read
    or write the persistent cache. Idempotent."""
    from jax._src import compilation_cache as _cc

    if getattr(_cc._get_cache, "_tpu_only_guard", False):
        return
    orig = _cc._get_cache

    def _tpu_only_get_cache(backend):
        if getattr(backend, "platform", None) != "tpu":
            return None
        return orig(backend)

    _tpu_only_get_cache._tpu_only_guard = True
    _cc._get_cache = _tpu_only_get_cache
