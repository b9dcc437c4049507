"""Parameter sharding rules: where tensor parallelism pays on this model.

The conv banks are embarrassingly parallel across their K width-filters
(SURVEY.md §2.3 TP row): the fused bank kernel's output-channel axis shards
cleanly over 'model', the banks' BN is per-channel (stats reduce over
batch/time only), maxpool is elementwise in channels, and the first
projection conv contracts over the sharded channel axis (GSPMD inserts the
all-reduce). Everything else (GRU, highway, prenet, output heads) is small
and replicated — a serial scan gains nothing from TP.

Rules are path-based over the param pytree so they apply to the encoder, to
both decoder steps, and to any CBHG-shaped stack.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path: tuple[str, ...], leaf) -> P:
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    keys = [str(k) for k in keys if k is not None]
    joined = "/".join(keys)
    if "banks" in keys and "kernels" in keys and leaf.ndim == 3:
        return P(None, None, "model")          # bank out-channels
    if "banks" in keys and "bn" in keys and leaf.ndim == 1:
        return P("model")                      # per-channel BN over sharded channels
    if "conv1d_1" in keys and "kernel" in joined and leaf.ndim == 3:
        return P(None, "model", None)          # contraction over bank channels
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params` structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf)), params
    )


def state_shardings(state, mesh: Mesh):
    """Model state (BN stats): banks stats shard with their channels."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh,
            P("model")
            if "banks" in [str(getattr(p, "key", "")) for p in path] and leaf.ndim == 1
            else P(),
        ),
        state,
    )


def replicate_tree(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_params(params, mesh: Mesh):
    return jax.tree.map(jax.device_put, params, param_shardings(params, mesh))


def shard_state(state, mesh: Mesh):
    return jax.tree.map(jax.device_put, state, state_shardings(state, mesh))
