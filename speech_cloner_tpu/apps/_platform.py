"""Deterministic backend selection for CLI apps.

Some runtimes (e.g. the axon PJRT sitecustomize) force-set
``jax_platforms`` in every interpreter, so the standard JAX_PLATFORMS env
var cannot steer a CLI run onto the CPU. ``SCL_PLATFORM=cpu|tpu|...``
outranks that: apps call ``apply_platform_env()`` before first device use.
"""

from __future__ import annotations

import os


def apply_platform_env() -> str | None:
    platform = os.environ.get("SCL_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return platform or None
