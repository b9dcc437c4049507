"""Feature front-end: waveform -> (MFCC, mel_dB, power_dB), plus phone targets.

Faithful re-derivation of the reference's `calc_MFCC_input`
(audio_lib.py:89-244) and `calc_PHN_target` (audio_lib.py:51-85), keeping
every pinned constant: mean-abs amplitude norm 0.003, pre-emphasis 0.97,
center/reflect STFT, mel norm=1 slaney, first-MFCC zeroing, the 0.01 scale
factors, the central-difference delta-MFCC stencil, min-subtraction of the dB
maps, and the final clip to [-1, 1].

The same function runs as host numpy (cache building / golden tests) and as
jit-compiled jnp on TPU (`xp=jnp`), where the mel projection and DCT are MXU
matmuls and everything else fuses into them.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .db import amplitude_to_db, power_to_db
from .mel import dct_basis, mel_filterbank
from .preemphasis import preemphasis
from .stft import stft


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Front-end hyperparameters (reference hp/ds_enc_cfg_d.json)."""

    sample_rate: int = 16000
    pre_emphasis: float = 0.97
    hop_length: int = 80          # 5 ms @ 16 kHz
    win_length: int = 400         # 25 ms @ 16 kHz
    n_fft: int | None = None      # None -> win_length (reference audio_lib.py:135)
    n_mels: int = 80
    n_mfcc: int = 40
    window: str = "hann"
    mfcc_normaleze_first_mfcc: bool = True
    mfcc_norm_factor: float = 0.01
    calc_mfcc_derivate: bool = False
    M_dB_norm_factor: float = 0.01
    P_dB_norm_factor: float = 0.01
    mean_abs_amp_norm: float = 0.003
    clip_output: bool = True

    @property
    def n_fft_(self) -> int:
        return self.n_fft if self.n_fft is not None else self.win_length

    @property
    def n_stft(self) -> int:
        return self.n_fft_ // 2 + 1

    @property
    def input_dim(self) -> int:
        return (2 if self.calc_mfcc_derivate else 1) * self.n_mfcc


def feature_matrices(cfg: FeatureConfig) -> tuple[np.ndarray, np.ndarray]:
    """(mel_weights [n_mels, n_stft], dct [n_mfcc, n_mels]) as float32 hosts consts."""
    mel_w = mel_filterbank(cfg.sample_rate, cfg.n_fft_, cfg.n_mels, fmin=0.0, fmax=None,
                           htk=False, norm=1).astype(np.float32)
    dct = dct_basis(cfg.n_mfcc, cfg.n_mels).astype(np.float32)
    return mel_w, dct


def mfcc_input(y, cfg: FeatureConfig, xp=None, mel_w=None, dct=None):
    """wave [L] -> (MFCC [T, n_mfcc(*2)], mel_dB [T, n_mels], power_dB [T, n_stft]).

    Step-for-step mirror of audio_lib.py:89-244 in time-major layout.
    """
    if xp is None:
        import jax.numpy as jnp

        xp = jnp
    if mel_w is None or dct is None:
        mel_w_np, dct_np = feature_matrices(cfg)
        mel_w = xp.asarray(mel_w_np) if mel_w is None else mel_w
        dct = xp.asarray(dct_np) if dct is None else dct

    y = xp.asarray(y, dtype=xp.float32)

    # amplitude normalization to mean |y| = mean_abs_amp_norm (audio_lib.py:125-126)
    if cfg.mean_abs_amp_norm != 1.0:
        y = (cfg.mean_abs_amp_norm / xp.mean(xp.abs(y))) * y

    # pre-emphasis (audio_lib.py:129-133)
    y = preemphasis(y, cfg.pre_emphasis, xp=xp)

    # STFT magnitude -> power (audio_lib.py:141-155), time-major [T, n_stft]
    F = xp.abs(
        stft(y, n_fft=cfg.n_fft_, hop_length=cfg.hop_length, win_length=cfg.win_length,
             window=cfg.window, center=True, xp=xp)
    )
    P = F * F

    P_dB = power_to_db(P, xp=xp)                       # audio_lib.py:157

    M_spec = P @ mel_w.T                               # audio_lib.py:169 (M @ P).T
    M_dB = amplitude_to_db(M_spec, xp=xp)              # audio_lib.py:172

    MFCC = M_dB @ dct.T                                # audio_lib.py:179

    # first-MFCC normalization: remove the initial DC cepstral offset
    # (audio_lib.py:220-221)
    if cfg.mfcc_normaleze_first_mfcc:
        first = MFCC[0, 0]
        if xp is np:
            MFCC = MFCC.copy()
            MFCC[:, 0] -= first
        else:
            MFCC = MFCC.at[:, 0].add(-first)

    if cfg.mfcc_norm_factor != 1.0:                    # audio_lib.py:223-224
        MFCC = cfg.mfcc_norm_factor * MFCC

    if cfg.calc_mfcc_derivate:                         # audio_lib.py:226-228
        zeros = xp.zeros((1, MFCC.shape[1]), dtype=xp.float32)
        d = 2.0 * xp.concatenate([zeros, MFCC[2:] - MFCC[:-2], zeros], axis=0)
        MFCC = xp.concatenate([MFCC, d], axis=1)

    if cfg.P_dB_norm_factor != 1.0:                    # audio_lib.py:230-231
        P_dB = cfg.P_dB_norm_factor * (P_dB - xp.min(P_dB))
    if cfg.M_dB_norm_factor != 1.0:                    # audio_lib.py:234-235
        M_dB = cfg.M_dB_norm_factor * (M_dB - xp.min(M_dB))

    if cfg.clip_output:                                # audio_lib.py:237-240
        MFCC = xp.clip(MFCC, -1.0, 1.0)
        P_dB = xp.clip(P_dB, -1.0, 1.0)
        M_dB = xp.clip(M_dB, -1.0, 1.0)

    return (
        MFCC.astype(xp.float32),
        M_dB.astype(xp.float32),
        P_dB.astype(xp.float32),
    )


def phn_frame_targets(n_wav_samples: int, phn_v, phn_to_idx, hop_length: int = 80,
                      win_length: int = 400) -> np.ndarray:
    """Align phone segments to the STFT frame grid -> int32 [T] class indices.

    Majority-overlap vote between the current and next phone per window,
    accounting for the center=True shift of n_fft//2 (audio_lib.py:51-85).
    ``phn_v`` is a sequence of (start_sample, end_sample, phone_str).
    """
    n_frames = n_wav_samples // hop_length + 1
    half = win_length // 2

    out = np.empty(n_frames, dtype=np.int32)
    i_phn = 0
    for i_s in range(n_frames):
        w_s = i_s * hop_length - half
        w_e = i_s * hop_length + win_length - half

        while phn_v[i_phn][1] <= w_s and i_phn + 1 < len(phn_v):
            i_phn += 1

        ov_a = min(phn_v[i_phn][1], w_e) - max(phn_v[i_phn][0], w_s)
        if i_phn + 1 < len(phn_v):
            ov_b = min(phn_v[i_phn + 1][1], w_e) - max(phn_v[i_phn + 1][0], w_s)
            pick = i_phn if ov_a >= ov_b else i_phn + 1
        else:
            pick = i_phn
        out[i_s] = phn_to_idx[phn_v[pick][2]]
    return out


def one_hot(idx: np.ndarray, n_classes: int) -> np.ndarray:
    oh = np.zeros((idx.shape[0], n_classes), dtype=np.float32)
    oh[np.arange(idx.shape[0]), idx] = 1.0
    return oh
