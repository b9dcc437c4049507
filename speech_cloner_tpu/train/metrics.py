"""Training/eval metrics (reference: encoder.py:134-159, decoder.py:185-199)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_xent(logits, target_probs):
    """Mean softmax cross-entropy with (possibly soft) label distributions
    (tf.nn.softmax_cross_entropy_with_logits_v2, encoder.py:136)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target_probs * log_probs, axis=-1))


def frame_accuracy(logits, target_probs):
    pred = jnp.argmax(logits, axis=-1)
    lbl = jnp.argmax(target_probs, axis=-1)
    return jnp.mean((pred == lbl).astype(jnp.float32))


def probs_mse(logits, target_probs):
    return jnp.mean(jnp.square(jax.nn.softmax(logits, axis=-1) - target_probs))


def confusion_matrix(logits, target_probs, n_classes: int):
    """[n_classes, n_classes] float counts (encoder.py:152-154)."""
    pred = jnp.argmax(logits, axis=-1).reshape(-1)
    lbl = jnp.argmax(target_probs, axis=-1).reshape(-1)
    idx = lbl * n_classes + pred
    flat = jnp.zeros((n_classes * n_classes,), jnp.float32).at[idx].add(1.0)
    return flat.reshape(n_classes, n_classes)


def weighted_mse(pred, target, weight: float):
    return weight * jnp.mean(jnp.square(pred - target))
