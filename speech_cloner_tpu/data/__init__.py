"""Dataset runtime (reference: sound_ds.py + *_reader.py)."""

from .arctic import ARCTIC, PHONEMES_43
from .audio_io import load_audio, write_riff_wav
from .dataset import SoundDataset, feature_cache_key
from .prefetch import device_prefetch
from .target_spk import TargetSpeaker
from .timit import PHONEMES_39, PHONEMES_61, TIMIT, conv_matrix_61_to_39

__all__ = [
    "ARCTIC", "PHONEMES_39", "PHONEMES_43", "PHONEMES_61", "SoundDataset",
    "TIMIT", "TargetSpeaker", "conv_matrix_61_to_39", "device_prefetch",
    "feature_cache_key", "load_audio", "write_riff_wav",
]
