"""Multi-host bootstrap + per-host data sharding.

The reference is strictly single-process (SURVEY.md §2.3). Here:
- `initialize()` wraps jax.distributed.initialize for multi-host TPU slices
  (no-op when single-process or already initialized),
- `host_shard()` splits a sample index set across hosts so each process's
  input pipeline feeds only its addressable shard of a data-parallel batch
  (SURVEY.md §2.3 DP row: per-host loading sharded by jax.process_index()).

Gradient/state collectives need no code here: pjit + the mesh handles them
(XLA inserts all-reduces over ICI/DCN).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns True if
    a multi-process runtime is active afterwards.

    Must run before anything touches the XLA backend — including
    jax.process_count()/jax.devices() — so the already-initialized check uses
    jax.distributed.is_initialized(), not a device query."""
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if coordinator_address is None:
        return False  # single-process run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_count() > 1


def host_shard(samples: np.ndarray) -> np.ndarray:
    """Deterministic per-host strided split of a sample index set."""
    return np.asarray(samples)[jax.process_index()::jax.process_count()]


def per_host_batch(global_batch_size: int) -> int:
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    return global_batch_size // n
