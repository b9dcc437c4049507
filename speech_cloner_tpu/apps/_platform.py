"""Deterministic backend selection + persistent compile cache for CLI apps.

Some runtimes (e.g. the axon PJRT sitecustomize) force-set
``jax_platforms`` in every interpreter, so the standard JAX_PLATFORMS env
var cannot steer a CLI run onto the CPU. ``SCL_PLATFORM=cpu|tpu|...``
outranks that: apps call ``apply_platform_env()`` before first device use.

The same call can enable JAX's persistent compilation cache
(``SCL_COMPILE_CACHE=1`` or a directory): a server restart, a resumed
training run, or a repeated benchmark then reuses compiled executables
instead of paying the remote compile (48-300+ s for big programs on the
axon runtime) again. Opt-in — see apply_compile_cache.
"""

from __future__ import annotations

import os


def apply_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at a stable directory.

    Opt-in (set SCL_COMPILE_CACHE=1 or a directory): small/medium programs
    measurably hit across processes on this runtime, but big train-step
    executables were once measured cache-hostile through the remote tunnel
    (bench.py round-1 note) — validate per deployment before defaulting on.
    """
    cache = os.environ.get("SCL_COMPILE_CACHE")
    if not cache or cache == "0":
        return None
    if cache == "1":
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "speech_cloner_tpu", "xla")
    import jax

    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache everything: on this runtime even mid-size programs pay a remote
    # compile round-trip, so there is no "too small to cache" regime
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache


def apply_platform_env() -> str | None:
    platform = os.environ.get("SCL_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    apply_compile_cache()
    return platform or None
