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


_dft_mats_cache: dict = {}


def _dft_mats(n_fft: int):
    """Real rfft/irfft as four [F, N] / [N, F] matmul bases (f64-built,
    f32-stored). The matmul form exists because the production n_fft (400)
    keeps the bases tiny (201x400 f32 = 321 KB HLO constants), the DFT
    matmul runs on the MXU, and — decisive on the axon runtime — a program
    with no FFT custom call skips the erratic per-process first-execution
    finalize stall the FFT path pays (docs/ROUND5.md; 55.9-946 s observed).
    """
    got = _dft_mats_cache.get(n_fft)
    if got is None:
        k = np.arange(n_fft // 2 + 1, dtype=np.float64)[:, None]
        n = np.arange(n_fft, dtype=np.float64)[None, :]
        ang = 2.0 * np.pi * k * n / n_fft
        fwd_re = np.cos(ang).astype(np.float32)           # X_k = sum x_n e^{-i 2pi kn/N}
        fwd_im = (-np.sin(ang)).astype(np.float32)
        c = np.full(n_fft // 2 + 1, 2.0)                  # hermitian fold-back weights
        c[0] = 1.0
        if n_fft % 2 == 0:
            c[-1] = 1.0
        inv_re = ((c[:, None] * np.cos(ang)) / n_fft).astype(np.float32)
        inv_im = ((-(c[:, None] * np.sin(ang))) / n_fft).astype(np.float32)
        got = _dft_mats_cache[n_fft] = (fwd_re, fwd_im, inv_re, inv_im)
    return got


def _mm(a, b, xp):
    """f32-accurate matmul: HIGHEST precision on device (the MXU's default
    bf16 passes would erode the DFT below the 1e-5 the golden tests pin)."""
    if xp is np:
        return a @ b
    return xp.matmul(a, b, precision="highest")


def _rfft(frames, n_fft: int, xp, dft: str = "fft"):
    if dft == "fft":
        return xp.fft.rfft(frames, n=n_fft, axis=1)
    fwd_re, fwd_im, _, _ = _dft_mats(n_fft)
    re = _mm(frames, xp.asarray(fwd_re.T), xp)
    im = _mm(frames, xp.asarray(fwd_im.T), xp)
    return re + 1j * im


def _irfft(S, n_fft: int, xp, dft: str = "fft"):
    if dft == "fft":
        return xp.fft.irfft(S, n=n_fft, axis=1)
    _, _, inv_re, inv_im = _dft_mats(n_fft)
    return (_mm(xp.real(S).astype(xp.float32), xp.asarray(inv_re), xp)
            + _mm(xp.imag(S).astype(xp.float32), xp.asarray(inv_im), xp))


def stft(
    y,
    n_fft: int = 400,
    hop_length: int = 80,
    win_length: int | None = None,
    window: str = "hann",
    center: bool = True,
    xp=None,
    dft: str = "fft",
):
    """Complex STFT of a 1-D signal -> [T, 1 + n_fft//2] (time-major).

    Matches librosa.stft (audio_lib.py:141-147) up to the [F,T] transpose.
    ``dft="matmul"`` computes the transform as two MXU matmuls against
    precomputed cos/sin bases instead of the FFT custom call (see
    `_dft_mats`); numerically equivalent to ~1e-5.
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
    return _rfft(frames, n_fft, xp, dft)


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
    dft: str = "fft",
):
    """Inverse STFT of a time-major complex [T, 1 + n_fft//2] spectrogram.

    librosa.istft semantics (audio_lib.py:260): windowed irfft per frame,
    overlap-add, divide by the squared-window envelope where it is
    non-negligible, trim n_fft//2 from both ends when center=True.
    ``dft="matmul"``: MXU matmul DFT instead of the FFT custom call.
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
    frames = _irfft(S, n_fft, xp, dft) * win[None, :]
    y = _overlap_add(frames, hop_length, xp)
    wss = window_sumsquare(window, n_frames, hop_length, win_length, n_fft, xp=xp)
    tiny = np.finfo(np.float32).tiny
    y = xp.where(wss > tiny, y / xp.where(wss > tiny, wss, 1.0), y)
    if center:
        y = y[n_fft // 2 : y.shape[0] - n_fft // 2]
    if length is not None:
        y = y[:length]
    return y
