"""Independent cross-validation of the STFT/ISTFT against torch.

librosa is unavailable here, so torch.stft/istft (same center/reflect/hann
conventions) serves as a second, independently-implemented reference for the
transform core — beyond the scipy-primitive and invariant checks in
test_dsp.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from speech_cloner_tpu import ops

RNG = np.random.default_rng(0)


def _sig(n=8000):
    t = np.arange(n) / 16000
    y = np.sin(2 * np.pi * 313 * t) + 0.3 * np.sin(2 * np.pi * 1777 * t)
    return (y + 0.05 * RNG.standard_normal(n)).astype(np.float32)


def test_stft_matches_torch():
    y = _sig()
    mine = ops.stft(y, n_fft=400, hop_length=80, win_length=400, xp=np)  # [T, F]
    ref = torch.stft(torch.from_numpy(y), n_fft=400, hop_length=80,
                     win_length=400, window=torch.hann_window(400, periodic=True),
                     center=True, pad_mode="reflect", return_complex=True,
                     normalized=False).numpy().T                         # [T, F]
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine.real, ref.real, atol=2e-3)
    np.testing.assert_allclose(mine.imag, ref.imag, atol=2e-3)


def test_istft_matches_torch():
    y = _sig()
    S = ops.stft(y, n_fft=400, hop_length=80, win_length=400, xp=np)
    mine = ops.istft(S, hop_length=80, win_length=400, xp=np)
    ref = torch.istft(torch.from_numpy(np.ascontiguousarray(S.T)),
                      n_fft=400, hop_length=80, win_length=400,
                      window=torch.hann_window(400, periodic=True),
                      center=True).numpy()
    n = min(len(mine), len(ref))
    np.testing.assert_allclose(mine[:n], ref[:n], atol=2e-3)


def test_stft_nfft512_matches_torch():
    y = _sig(4096)
    mine = ops.stft(y, n_fft=512, hop_length=128, win_length=400, xp=np)
    ref = torch.stft(torch.from_numpy(y), n_fft=512, hop_length=128,
                     win_length=400, window=torch.hann_window(400, periodic=True),
                     center=True, pad_mode="reflect", return_complex=True).numpy().T
    np.testing.assert_allclose(np.abs(mine), np.abs(ref), atol=2e-3)
