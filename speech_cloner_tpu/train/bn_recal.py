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
        lambda params, state, x, y: model.apply(params, state, x, train=True,
                                                rng=key)[1])
    new_state = collect_bn_state(stat_fn, params, state, batches)
"""

from __future__ import annotations

import jax
import numpy as np


def make_bn_stat_fn(train_state_fn):
    """Jit ``train_state_fn(params, model_state, *batch) -> model_state`` with
    BN momentum forced to 0 at trace time, so each call returns the batch's
    TRUE statistics. Build once and reuse — the momentum override is baked
    into the compiled program."""
    from ..nn import modules as M

    def traced(params, model_state, *batch):
        old = M.BN_MOMENTUM
        M.BN_MOMENTUM = 0.0  # visible during tracing only; restored below
        try:
            return train_state_fn(params, model_state, *batch)
        finally:
            M.BN_MOMENTUM = old

    return jax.jit(traced)


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
