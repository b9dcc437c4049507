"""Device DSP ops (reference: audio_lib.py, rebuilt TPU-first)."""

from .db import amplitude_to_db, db_to_amplitude, db_to_power, power_to_db
from .features import FeatureConfig, feature_matrices, mfcc_input, one_hot, phn_frame_targets
from .griffin_lim import (from_power_to_wav, from_power_to_wav_dyn,
                         griffin_lim, griffin_lim_dyn)
from .mel import dct_basis, mel_filterbank
from .preemphasis import inv_preemphasis, inv_preemphasis_np, preemphasis
from .stft import istft, stft, window_sumsquare
from .windows import get_window, hann_periodic, pad_center

__all__ = [
    "FeatureConfig", "amplitude_to_db", "db_to_amplitude", "db_to_power",
    "dct_basis", "feature_matrices", "from_power_to_wav",
    "from_power_to_wav_dyn", "get_window",
    "griffin_lim", "griffin_lim_dyn", "hann_periodic", "inv_preemphasis", "inv_preemphasis_np",
    "istft", "mel_filterbank", "mfcc_input", "one_hot", "pad_center",
    "phn_frame_targets", "power_to_db", "preemphasis", "stft",
    "window_sumsquare",
]
