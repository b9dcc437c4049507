"""Device mesh construction (reference has none — strictly single-device,
SURVEY.md §2.3; this is the framework's scale-out foundation).

Axes:
  data  — batch (DP): gradients all-reduce over ICI,
  model — tensor parallel (TP): decoder conv-bank/projection channels,
  seq   — sequence parallel (SP) for long-form inference (parallel/halo.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """2-D ('data', 'model') mesh. Defaults: all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def make_seq_mesh(n_seq: int | None = None, devices=None) -> Mesh:
    """1-D ('seq',) mesh for sequence-parallel long-form inference."""
    if devices is None:
        devices = jax.devices()
    n_seq = n_seq or len(devices)
    return Mesh(np.asarray(devices[:n_seq]), ("seq",))


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
