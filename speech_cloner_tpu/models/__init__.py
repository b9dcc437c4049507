"""Model families (reference: encoder.py, decoder.py, voice_identification.py)."""

from . import decoder, encoder, speaker_id
from .decoder import DecoderConfig, DecoderStepConfig
from .encoder import EncoderConfig
from .speaker_id import SpeakerIdConfig

__all__ = [
    "DecoderConfig", "DecoderStepConfig", "EncoderConfig", "SpeakerIdConfig",
    "decoder", "encoder", "speaker_id",
]
