"""STFT / ISTFT with librosa-compatible semantics, shaped for the TPU.

Reference behaviour being reproduced (librosa calls in audio_lib.py:141-147,
:260, :267): center=True reflect padding of n_fft//2, periodic window
zero-padded to n_fft, rfft per frame; istft with squared-window overlap-add
normalization and n_fft//2 trim.

TPU-first design choices:
- time-major [T, F] layout (librosa is [F, T]; the reference transposes
  immediately at audio_lib.py:206-211 anyway),
- framing via the "chunk stack" trick when hop | n_fft (the production config
  has n_fft=400, hop=80 -> 5 chunks): pure reshape/concat, no gather,
- overlap-add as a sum of k shifted slices instead of scatter-add, so XLA
  fuses it into a handful of vector adds,
- everything static-shaped and jit-friendly; batched variants via vmap.

All functions take ``xp`` (numpy or jax.numpy) so the same code serves as the
host-side golden reference and the device kernel.
"""

from __future__ import annotations

import numpy as np

from .windows import get_window, pad_center


def _frame(y, n_fft: int, hop: int, xp):
    """Frame a 1-D padded signal into [T, n_fft] windows at stride ``hop``.

    T = 1 + (len(y) - n_fft) // hop  (librosa util.frame semantics).
    """
    n = y.shape[0]
    n_frames = 1 + (n - n_fft) // hop
    if n_fft % hop == 0:
        # Stack-of-chunks path: frames[t] = concat(chunks[t : t+k]) where
        # chunks are consecutive hop-length pieces. No gather on device.
        k = n_fft // hop
        n_chunks = n // hop
        chunks = y[: n_chunks * hop].reshape(n_chunks, hop)
        # need chunks[t + j] for t in [0, n_frames), j in [0, k)
        parts = [chunks[j : j + n_frames] for j in range(k)]
        return xp.concatenate(parts, axis=1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[idx]


def stft(
    y,
    n_fft: int = 400,
    hop_length: int = 80,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    xp=None,
):
    """Complex STFT of a 1-D signal -> [T, 1 + n_fft//2] (time-major).

    Matches librosa.stft (audio_lib.py:141-147) up to the [F,T] transpose.
    """
    if xp is None:
        import jax.numpy as jnp

        xp = jnp
    if win_length is None:
        win_length = n_fft
    win = pad_center(get_window(window, win_length, xp=xp), n_fft, xp=xp).astype(y.dtype)
    if center:
        y = xp.pad(y, n_fft // 2, mode="reflect")
    frames = _frame(y, n_fft, hop_length, xp) * win[None, :]
    return xp.fft.rfft(frames, n=n_fft, axis=1)


def _overlap_add(frames, hop: int, xp):
    """Overlap-add [T, n_fft] frames at stride ``hop`` -> [(T-1)*hop + n_fft].

    Fast path (hop | n_fft): view frames as [T, k, hop] and accumulate the k
    diagonals with shifted slices — k static slices + adds, no scatter.
    """
    n_frames, n_fft = frames.shape
    out_len = (n_frames - 1) * hop + n_fft
    if n_fft % hop == 0:
        k = n_fft // hop
        f = frames.reshape(n_frames, k, hop)
        # zero-pad the frame axis so every diagonal slice has equal length
        f = xp.pad(f, ((k - 1, k - 1), (0, 0), (0, 0)))
        n_out_chunks = n_frames + k - 1
        acc = f[k - 1 : k - 1 + n_out_chunks, 0, :]
        for j in range(1, k):
            acc = acc + f[k - 1 - j : k - 1 - j + n_out_chunks, j, :]
        return acc.reshape(n_out_chunks * hop)
    out = xp.zeros(out_len, dtype=frames.dtype)
    if xp is np:
        for t in range(n_frames):
            out[t * hop : t * hop + n_fft] += frames[t]
        return out
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return out.at[idx.reshape(-1)].add(frames.reshape(-1))


def window_sumsquare(
    window: str, n_frames: int, hop_length: int, win_length: int, n_fft: int, xp=np
):
    """Sum of squared windows across frames (librosa filters.window_sumsquare)."""
    win = pad_center(get_window(window, win_length, xp=xp), n_fft, xp=xp)
    sq = (win * win)[None, :]
    tiled = xp.broadcast_to(sq, (n_frames, n_fft))
    return _overlap_add(tiled, hop_length, xp)


def istft(
    S,
    hop_length: int = 80,
    win_length: int | None = None,
    n_fft: int | None = None,
    window: str = "hann",
    center: bool = True,
    length: int | None = None,
    xp=None,
):
    """Inverse STFT of a time-major complex [T, 1 + n_fft//2] spectrogram.

    librosa.istft semantics (audio_lib.py:260): windowed irfft per frame,
    overlap-add, divide by the squared-window envelope where it is
    non-negligible, trim n_fft//2 from both ends when center=True.
    """
    if xp is None:
        import jax.numpy as jnp

        xp = jnp
    if n_fft is None:
        n_fft = 2 * (S.shape[1] - 1)
    if win_length is None:
        win_length = n_fft
    win = pad_center(get_window(window, win_length, xp=xp), n_fft, xp=xp)
    n_frames = S.shape[0]
    frames = xp.fft.irfft(S, n=n_fft, axis=1) * win[None, :]
    y = _overlap_add(frames, hop_length, xp)
    wss = window_sumsquare(window, n_frames, hop_length, win_length, n_fft, xp=xp)
    tiny = np.finfo(np.float32).tiny
    y = xp.where(wss > tiny, y / xp.where(wss > tiny, wss, 1.0), y)
    if center:
        y = y[n_fft // 2 : y.shape[0] - n_fft // 2]
    if length is not None:
        y = y[:length]
    return y
