"""Training: jitted steps, optimizer/schedule, metrics."""

from .metrics import confusion_matrix, frame_accuracy, probs_mse, softmax_xent, weighted_mse
from .optimizer import OptimizerConfig, apply_updates, make_train_state, next_epoch
from .steps import (
    DecoderLossConfig,
    decoder_eval_step,
    decoder_train_step,
    encoder_eval_step,
    encoder_train_step,
    f_mel_schedule,
    speaker_eval_step,
    speaker_train_step,
)

__all__ = [
    "DecoderLossConfig", "OptimizerConfig", "apply_updates", "confusion_matrix",
    "decoder_eval_step", "decoder_train_step", "encoder_eval_step",
    "encoder_train_step", "f_mel_schedule", "frame_accuracy",
    "make_train_state", "next_epoch", "probs_mse", "softmax_xent",
    "speaker_eval_step", "speaker_train_step", "weighted_mse",
]
