"""Golden-sample checks against the reference's shipped demo audio
(slt_test_chptr16, produced by test.py:416-502): real-speech feature
extraction + Griffin-Lim resynthesis quality on actual data, not synthetics."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from speech_cloner_tpu import ops
from speech_cloner_tpu.data.audio_io import can_decode_mp3
from speech_cloner_tpu.ops.features import FeatureConfig

TRUE_MP3 = "/root/reference/slt_test_chptr16/16 The Magic Art of the Great Humbug_true.mp3"

needs_sample = pytest.mark.skipif(
    not (os.path.exists(TRUE_MP3) and can_decode_mp3()),
    reason="reference demo mp3 or mp3 decoder (libmpg123/ffmpeg) unavailable")


@pytest.fixture(scope="module")
def demo_wav():
    from speech_cloner_tpu.data.audio_io import load_audio

    y = load_audio(TRUE_MP3, 16000)
    return y[: 4 * 16000]  # 4 seconds is plenty for the checks


@needs_sample
def test_features_on_real_speech(demo_wav):
    cfg = FeatureConfig(calc_mfcc_derivate=True)
    mfcc, mel_dB, power_dB = ops.mfcc_input(demo_wav, cfg, xp=np)
    T = demo_wav.shape[0] // 80 + 1
    assert mfcc.shape == (T, 80)
    # real speech fills a good part of the normalized dB range
    assert mel_dB.max() > 0.5 and mel_dB.min() == 0.0
    assert np.isfinite(mfcc).all()
    # device path matches host path on real data
    mfcc_d, mel_d, pow_d = ops.mfcc_input(jnp.asarray(demo_wav), cfg, xp=jnp)
    np.testing.assert_allclose(np.asarray(mel_d), mel_dB, atol=5e-3)
    np.testing.assert_allclose(np.asarray(mfcc_d), mfcc, atol=5e-3)


@needs_sample
def test_griffin_lim_resynthesis_on_real_speech(demo_wav):
    """GL resynthesis from the power_dB map must reproduce the target
    magnitude spectrogram on real speech (the reference's y_wav_true path,
    test.py:148-158)."""
    from speech_cloner_tpu.ops.preemphasis import preemphasis

    cfg = FeatureConfig()
    _, _, power_dB = ops.mfcc_input(demo_wav, cfg, xp=np)
    wav_rec = np.asarray(ops.from_power_to_wav(
        jnp.asarray(power_dB), hop_length=80, win_length=400,
        mean_abs_amp_norm=0.045, n_iter=30, realse=1.0))
    assert np.isfinite(wav_rec).all()
    # spectral match: |STFT| of resynthesis vs the dB-denormalized target.
    # The target spectrogram was computed on the amp-normalized,
    # PRE-EMPHASIZED waveform (audio_lib.py:126-141) while from_power_to_wav
    # ends with INVERSE pre-emphasis (:301-302), so the re-extraction must
    # apply the same front-end transforms or the comparison is spectrally
    # tilted (measured: corr 0.73 unmatched vs 0.985 matched @ 30 iters).
    target_amp = np.sqrt(ops.db_to_power(power_dB / 0.01 - 80.0))
    y = wav_rec * (cfg.mean_abs_amp_norm / np.mean(np.abs(wav_rec)))
    y = preemphasis(y, cfg.pre_emphasis, xp=np)
    rec_amp = np.abs(ops.stft(y, n_fft=400, hop_length=80, xp=np))
    n = min(len(target_amp), len(rec_amp))
    a, b = target_amp[:n].ravel(), rec_amp[:n].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr
