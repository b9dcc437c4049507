"""Vocoded data augmentation for the speaker-ID verifier.

The reference trains its verification CNN on clean power_dB windows
(voice_identification.py:169-223) and then — implicitly — evaluates it on
Griffin-Lim-RESYNTHESIZED audio (the conversion pipeline's output,
test.py:160-168). That domain shift is measurable: a clean-trained
classifier moves ALL resynthesized audio toward the same few classes (see
docs/CLONE_DEMO.md's reconstruction control). This module closes the gap at
the source: each training window is (optionally) replaced by the power_dB
of its own on-device Griffin-Lim resynthesis — the exact transform the
inference pipeline applies (ops/griffin_lim.from_power_to_wav followed by
the audio_lib.py:141-157 power re-extraction), so train and test domains
match.

Entirely device-resident and jit-able: the augmentation runs as part of the
train-step dispatch (a vmapped fast-GL pass, ~tens of ms per batch on a
v5e), never touching the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.db import power_to_db
from ..ops.features import FeatureConfig
from ..ops.griffin_lim import from_power_to_wav
from ..ops.preemphasis import preemphasis
from ..ops.stft import stft


def vocoded_power_window(p_dB, cfg: FeatureConfig, *, key,
                         n_iter: int = 25, momentum: float = 0.99,
                         realse: float = 1.2):
    """Normalized power_dB window [T, n_stft] -> power_dB of its GL resynthesis.

    Matches the inference chain: from_power_to_wav (spectral sharpening,
    Griffin-Lim, inverse pre-emphasis, amp norm — audio_lib.py:278-308) then
    the feature front-end's power path (amp norm, pre-emphasis, STFT, |.|^2,
    power_to_db, min-subtract, clip — audio_lib.py:125-157, 230-240). The
    min-subtraction here is per-window rather than per-utterance (the cache
    normalizes whole utterances); augmentation needs domain coverage, not
    bit-exactness. Fast-GL defaults (momentum 0.99 @ 25 iters) match the
    convergence study in docs/DESIGN.md.
    """
    T = p_dB.shape[0]
    wav = from_power_to_wav(
        p_dB, P_dB_norm_factor=cfg.P_dB_norm_factor,
        pre_emphasis=cfg.pre_emphasis, hop_length=cfg.hop_length,
        win_length=cfg.win_length, mean_abs_amp_norm=cfg.mean_abs_amp_norm,
        n_iter=n_iter, n_fft=cfg.n_fft, realse=realse, key=key,
        momentum=momentum)
    y = (cfg.mean_abs_amp_norm / jnp.mean(jnp.abs(wav))) * wav
    y = preemphasis(y, cfg.pre_emphasis, xp=jnp)
    F = jnp.abs(stft(y, n_fft=cfg.n_fft_, hop_length=cfg.hop_length,
                     win_length=cfg.win_length, window=cfg.window,
                     center=True, xp=jnp))
    P_dB = power_to_db(F * F, xp=jnp)
    P_dB = cfg.P_dB_norm_factor * (P_dB - jnp.min(P_dB))
    if cfg.clip_output:
        P_dB = jnp.clip(P_dB, -1.0, 1.0)
    return P_dB[:T].astype(jnp.float32)


def mix_vocoded(p_batch, cfg: FeatureConfig, *, key, frac: float = 0.5,
                n_iter: int = 25, momentum: float = 0.99, realse: float = 1.2):
    """Replace each window of [B, T, n_stft] by its vocoded version with
    probability ``frac`` (per-sample Bernoulli). frac=0 is the identity
    (reference behavior); frac=1 trains fully in the resynthesis domain."""
    if frac <= 0.0:
        return p_batch
    k_gl, k_sel = jax.random.split(jnp.asarray(key))
    keys = jax.random.split(k_gl, p_batch.shape[0])
    voc = jax.vmap(
        lambda p, k: vocoded_power_window(p, cfg, key=k, n_iter=n_iter,
                                          momentum=momentum, realse=realse)
    )(p_batch, keys)
    if frac >= 1.0:
        return voc
    mask = jax.random.bernoulli(k_sel, frac, (p_batch.shape[0],))
    return jnp.where(mask[:, None, None], voc, p_batch)
