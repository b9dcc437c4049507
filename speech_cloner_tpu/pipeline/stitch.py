"""On-device windowing and overlap stitching for long-form inference.

The reference handles long recordings host-side: fixed 400-frame windows,
two half-window-offset prediction passes, stitched by keeping each window's
center half (`conversion2` test.py:87-145, `compound` test.py:46-84). Here
both the windowing and the stitch are static-shape device ops that fuse into
the surrounding jit — no host round-trips between model and vocoder.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_to_multiple(x, n_timesteps: int, xp=jnp):
    """Zero-pad [T, C] on the time axis to a multiple of n_timesteps
    (test.py:92-105)."""
    T = x.shape[0]
    pad = (-T) % n_timesteps
    if pad:
        x = xp.pad(x, ((0, pad), (0, 0)))
    return x


def window_stack(x, n_timesteps: int):
    """[K*n_timesteps, C] -> [K, n_timesteps, C] non-overlapping windows."""
    T, C = x.shape
    return x.reshape(T // n_timesteps, n_timesteps, C)


def shifted_window_stack(x, n_timesteps: int):
    """Second pass offset by n_timesteps//2 (test.py:127): [K*T, C] -> [K-1, T, C]."""
    half = n_timesteps // 2
    K = x.shape[0] // n_timesteps
    return window_stack(x[half : half + (K - 1) * n_timesteps], n_timesteps)


def compound(y0, y1):
    """Stitch two offset prediction passes keeping center halves.

    y0: [K, T, C] aligned windows; y1: [K-1, T, C] windows offset by T/2.
    Output [K*T, C] assembled as: y0[0][:3T/4], then alternating center
    halves y1[i][T/4:3T/4], y0[i+1][T/4:3T/4], ..., closing with
    y0[-1][T/4:] — exactly test.py:46-84.
    """
    K, T, C = y0.shape
    q = T // 4
    parts = [y0[0, : T - q, :]]                  # first window, leading 3/4
    for i in range(K - 1):
        parts.append(y1[i, q : T - q, :])        # offset-pass center
        if i + 1 < K - 1:
            parts.append(y0[i + 1, q : T - q, :])  # aligned-pass center
    parts.append(y0[K - 1, q:, :])               # last window, trailing 3/4
    return jnp.concatenate(parts, axis=0)


def stitch_single(y0):
    """Single-pass fallback when only one window exists (test.py:134-138)."""
    K, T, C = y0.shape
    return y0.reshape(K * T, C)
