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
"""

from __future__ import annotations

import jax
import numpy as np


def collect_bn_state(train_state_fn, batches, max_batches: int = 16):
    """Average the model_state produced by ``train_state_fn(*batch)`` over up
    to ``max_batches`` batches, with BN momentum forced to 0 for the calls.

    ``train_state_fn`` must run the model's train-mode forward and return its
    new model_state pytree (mean/var leaves = this batch's statistics when
    momentum is 0). Do NOT pass a pre-jitted function: the momentum override
    must be visible at trace time.
    """
    from ..nn import modules as M

    old = M.BN_MOMENTUM
    M.BN_MOMENTUM = 0.0
    try:
        fn = jax.jit(train_state_fn)
        acc = None
        n = 0
        for batch in batches:
            st = jax.tree.map(np.asarray, fn(*batch))
            acc = st if acc is None else jax.tree.map(np.add, acc, st)
            n += 1
            if n >= max_batches:
                break
    finally:
        M.BN_MOMENTUM = old
    if n == 0:
        raise ValueError("no batches supplied for BN recalibration")
    return jax.tree.map(lambda a: a / n, acc)
