"""Mesh + sharding + collectives (the framework's distributed layer)."""

from .mesh import batch_sharding, make_mesh, make_seq_mesh, replicated
from .sharding import param_shardings, replicate_tree, shard_params, shard_state, state_shardings

__all__ = [
    "batch_sharding", "make_mesh", "make_seq_mesh", "param_shardings",
    "replicate_tree", "replicated", "shard_params", "shard_state",
    "state_shardings",
]
