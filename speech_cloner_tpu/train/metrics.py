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


def mel_cepstral_distortion(mel_db_true, mel_db_pred, *, n_coeffs: int = 13,
                            db_norm_factor: float = 0.01):
    """Mean mel-cepstral distortion (dB) between two normalized mel_dB maps.

    The standard objective spectral-quality metric for voice conversion
    (Kubichek 1993): MCD = (10/ln10) * sqrt(2 * sum_{k=1..K} (c_k - c'_k)^2)
    averaged over frames, where c are mel-cepstra (orthonormal DCT-II of the
    log-mel spectrum), excluding the energy coefficient c_0.

    Inputs are this pipeline's normalized maps (amplitude_to_db * 0.01 with
    per-utterance min subtraction, audio_lib.py:172,230-235); dividing by
    ``db_norm_factor`` restores true dB, and the min-shift only moves c_0,
    which is excluded. The reference had no objective quality metric beyond
    its weighted MSE losses (decoder.py:185-199); this makes decoder quality
    a number that can regress round over round.

    Scale caveat: the cepstra here are ORTHONORMAL DCT-II coefficients of
    log10-power, while published MCD numbers conventionally use natural-log
    cepstra in the non-orthonormal DCT convention — the two differ by a
    fixed multiplicative factor (sqrt(2/n_mels)-family normalization x
    ln(10)/10 base change absorbed into the prefactor). Values are therefore
    internally consistent and valid for round-over-round comparison, but NOT
    directly comparable to literature MCD tables.

    mel_db_*: [..., T, n_mels] -> scalar mean MCD in dB.
    """
    from ..ops.mel import dct_basis

    n_mels = mel_db_true.shape[-1]
    # full basis, keep coefficients 1..n_coeffs
    D = jnp.asarray(dct_basis(n_coeffs + 1, n_mels))[1:]      # [K, n_mels]
    # /db_norm_factor restores true dB; /10 converts dB to log10(power),
    # the domain the (10/ln10)*sqrt(2*sum) convention is defined over
    a = (mel_db_true / (10.0 * db_norm_factor)) @ D.T         # [..., T, K]
    b = (mel_db_pred / (10.0 * db_norm_factor)) @ D.T
    per_frame = (10.0 / jnp.log(10.0)) * jnp.sqrt(
        2.0 * jnp.sum(jnp.square(a - b), axis=-1))
    return jnp.mean(per_frame)
