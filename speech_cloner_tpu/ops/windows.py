"""Window functions with librosa/scipy-compatible semantics.

The reference calls ``librosa.stft(..., window='hann')`` (audio_lib.py:141-147),
which resolves to ``scipy.signal.get_window('hann', win_length, fftbins=True)``
— the *periodic* Hann window — then zero-pads it centered up to ``n_fft``.
We reproduce both behaviours here for any array module (numpy or jax.numpy).
"""

from __future__ import annotations

import numpy as np


def hann_periodic(win_length: int, xp=np):
    """Periodic Hann window: 0.5 - 0.5*cos(2*pi*n/N), n = 0..N-1.

    Equals scipy.signal.get_window('hann', win_length, fftbins=True).
    """
    n = xp.arange(win_length)
    return 0.5 - 0.5 * xp.cos(2.0 * np.pi * n / win_length)


def hamming_periodic(win_length: int, xp=np):
    """Periodic Hamming window (the reference's audio_lib.py:312 smoke block
    passes window='hamm'; librosa forwards it to scipy get_window)."""
    n = xp.arange(win_length)
    return 0.54 - 0.46 * xp.cos(2.0 * np.pi * n / win_length)


_WINDOW_FNS = {
    "hann": hann_periodic,
    "hamm": hamming_periodic,
    "hamming": hamming_periodic,
}


def get_window(name: str, win_length: int, xp=np):
    try:
        fn = _WINDOW_FNS[name]
    except KeyError:
        raise ValueError(f"unsupported window {name!r}; supported: {sorted(_WINDOW_FNS)}")
    return fn(win_length, xp=xp)


def pad_center(window, size: int, xp=np):
    """Zero-pad a window symmetrically to ``size`` (librosa util.pad_center)."""
    n = window.shape[0]
    if n > size:
        raise ValueError(f"window length {n} > target size {size}")
    lpad = (size - n) // 2
    return xp.pad(window, (lpad, size - n - lpad))
