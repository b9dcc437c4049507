"""Test harness config: run JAX on CPU with 8 virtual devices.

Must run before the first `import jax` anywhere in the test session so the
XLA client is created with the forced host platform (SURVEY.md §4: mesh tests
via --xla_force_host_platform_device_count=8).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins tpu
os.environ["SCL_PLATFORM"] = "cpu"   # subprocess stages (train_full) inherit
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-sets jax_platforms="axon,cpu" via
# jax.config.update at interpreter start, which outranks the env var —
# override it back to cpu for the test session.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the test session (repo-local, gitignored):
# the fast gate's cost is dominated by CPU XLA compiles of ~150 distinct
# small programs (measured on this machine: ~24 min cold, 4m52s warm for
# the 161-test fast set) — the same lever the production CLIs use
# (SCL_COMPILE_CACHE). Numerical behavior is unchanged;
# SCL_TEST_COMPILE_CACHE=0 opts out (e.g. to measure cold). Exported as
# env vars (not only jax.config) so subprocess-spawning tests (train_full
# CLI stages, test_multiprocess workers) share the same cache.
if os.environ.get("SCL_TEST_COMPILE_CACHE", "1") != "0":
    _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".xla_cache")
    os.makedirs(_cache_dir, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
