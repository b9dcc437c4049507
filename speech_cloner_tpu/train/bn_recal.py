"""BatchNorm moving-stat recalibration.

The reference pins BN decay at 0.999 (tf.contrib.layers.batch_norm default,
modules.py:77-84), which means the *inference-mode* model lags training by
thousands of steps: until ~5k steps the moving stats are still mostly their
initialization and eval metrics are garbage even when train-mode accuracy is
high. The reference trained 136k steps so it never noticed; short runs do.

Classic fix (used by e.g. SWA and quantization pipelines): after (or during)
training, replace the moving stats with the average of the true batch
statistics over k batches. We get the batch stats by tracing the train-mode
forward with BN momentum forced to 0 — then ``new_state == batch stats``
exactly — and averaging the returned state pytrees.

Usage (build the jitted collector ONCE per app — recompiling it at every
save cadence costs a full remote compile on the axon runtime):

    stat_fn = make_bn_stat_fn(
        lambda params, state, x, y, bn_momentum: model.apply(
            params, state, x, train=True, rng=key,
            bn_momentum=bn_momentum)[1])
    new_state = collect_bn_state(stat_fn, params, state, batches)

The momentum override is an EXPLICIT ``bn_momentum`` keyword threaded
through the model apply chain (nn/modules.bn_apply) — not a module-global
mutation, which would be action-at-a-distance for any concurrent trace.
"""

from __future__ import annotations

import functools

import jax
import numpy as np


def make_bn_stat_fn(train_state_fn):
    """Jit ``train_state_fn(params, model_state, *batch, bn_momentum=...) ->
    model_state`` with bn_momentum pinned to 0.0, so each call returns the
    batch's TRUE statistics. ``train_state_fn`` must accept and forward the
    ``bn_momentum`` keyword into the model's apply (all three model families
    take it). Build once and reuse."""
    return jax.jit(functools.partial(train_state_fn, bn_momentum=0.0))


def collect_bn_state(stat_fn, params, model_state, batches,
                     max_batches: int = 16):
    """Average the model_state produced by ``stat_fn(params, model_state,
    *batch)`` (from make_bn_stat_fn) over up to ``max_batches`` batches."""
    acc = None
    n = 0
    for batch in batches:
        st = jax.tree.map(np.asarray, stat_fn(params, model_state, *batch))
        acc = st if acc is None else jax.tree.map(np.add, acc, st)
        n += 1
        if n >= max_batches:
            break
    if n == 0:
        raise ValueError("no batches supplied for BN recalibration")
    return jax.tree.map(lambda a: a / n, acc)
