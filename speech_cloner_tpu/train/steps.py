"""Jitted train/eval steps for encoder, decoder, and speaker-id models.

Mirrors the reference train loops' math (encoder.py:256-270 / :300-356,
decoder.py:327-345 / :379-444, voice_identification.py:202-223) as pure
step functions over TrainState pytrees. Loop orchestration (epochs, saving,
validation cadence) lives in train/loop.py; these functions are what gets
jit/pjit-compiled.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models import decoder as dec_m
from ..models import encoder as enc_m
from ..models import speaker_id as spk_m
from .metrics import frame_accuracy, probs_mse, softmax_xent, weighted_mse
from .optimizer import OptimizerConfig, apply_updates


def _cast_floats(tree, dtype):
    """Cast every floating leaf to ``dtype`` (None = identity).

    Mixed-precision training the TPU way: master params/opt-state stay f32
    in the TrainState; the cast happens INSIDE the differentiated function,
    so the forward/backward matmuls run in bf16 on the MXU while autodiff's
    cast-transpose delivers f32 gradients to Adam. BN moments/moving stats
    stay f32 (nn/modules.bn_apply), losses/softmax are computed in f32.
    """
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree)


# ---------------------------------------------------------------- encoder ---

def encoder_train_step(ts, mfcc, phn, *, cfg: enc_m.EncoderConfig,
                       opt_cfg: OptimizerConfig, opt, compute_dtype=None):
    """One step: xent loss on [B,T,61] soft targets + Adam + BN update.

    ``compute_dtype=jnp.bfloat16`` runs the model forward/backward in bf16
    (f32 master weights, f32 loss/BN stats — see _cast_floats).
    Returns (new_ts, metrics dict).
    """
    rng, step_rng = jax.random.split(ts["rng"])

    def loss_fn(params):
        logits, new_state = enc_m.apply(
            _cast_floats(params, compute_dtype), ts["model_state"],
            _cast_floats(mfcc, compute_dtype), cfg=cfg, train=True, rng=step_rng)
        logits = logits.astype(jnp.float32)
        loss = softmax_xent(logits, phn)
        return loss, (new_state, logits)

    (loss, (new_state, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts["params"])
    new_ts, lr = apply_updates({**ts, "rng": rng}, grads, new_state, opt_cfg, opt)
    metrics = {
        "loss": loss,
        "acc": frame_accuracy(logits, phn),
        "mse": probs_mse(logits, phn),
        "lr": lr,
    }
    return new_ts, metrics


def encoder_eval_step(params, model_state, mfcc, phn, *, cfg: enc_m.EncoderConfig):
    logits, _ = enc_m.apply(params, model_state, mfcc, cfg=cfg, train=False)
    return {
        "loss": softmax_xent(logits, phn),
        "acc": frame_accuracy(logits, phn),
        "mse": probs_mse(logits, phn),
    }


# ---------------------------------------------------------------- decoder ---

@dataclasses.dataclass(frozen=True)
class DecoderLossConfig:
    mel_loss_weight: float = 400.0
    stft_loss_weight: float = 400.0
    loss_type: str = "sum"  # 'sum' | 'log' (decoder.py:191-198)


def f_mel_schedule(epoch, target_mel_step2_val: float):
    """f = min(1, 1.02*tanh(epoch / val)) (decoder.py:258-260)."""
    return jnp.minimum(1.0, 1.02 * jnp.tanh(epoch.astype(jnp.float32) / target_mel_step2_val))


def decoder_train_step(ts, mfcc, target_mel, target_stft, *,
                       enc_params, enc_state, enc_cfg: enc_m.EncoderConfig,
                       cfg: dec_m.DecoderConfig, loss_cfg: DecoderLossConfig,
                       opt_cfg: OptimizerConfig, opt, compute_dtype=None):
    """One decoder step with the frozen encoder producing PPG inputs.

    The reference freezes the encoder by removing its vars from the trainable
    collection and running it with is_training=False (decoder.py:49-51,
    encoder.py:58-60); here the encoder runs in eval mode under
    stop_gradient and only decoder params are differentiated.
    """
    rng, step_rng = jax.random.split(ts["rng"])

    # frozen encoder can run in the compute dtype too (its posteriors are
    # re-normalized in f32 by enc_m.posteriors' softmax)
    enc_logits, _ = enc_m.apply(_cast_floats(enc_params, compute_dtype), enc_state,
                                _cast_floats(mfcc, compute_dtype),
                                cfg=enc_cfg, train=False)
    ppg = jax.lax.stop_gradient(enc_m.posteriors(enc_logits.astype(jnp.float32)))

    f_mel = f_mel_schedule(ts["epoch"], cfg.target_mel_step2_val)
    # keep the scheduled-mix scalar in the compute dtype so it doesn't
    # silently promote step2's input back to f32
    f_in = _cast_floats(f_mel, compute_dtype)

    def loss_fn(params):
        y_mel, y_stft, new_state = dec_m.apply(
            _cast_floats(params, compute_dtype), ts["model_state"],
            _cast_floats(ppg, compute_dtype), cfg=cfg, train=True, rng=step_rng,
            target_mel=_cast_floats(target_mel, compute_dtype), f_mel_pred=f_in)
        y_mel = y_mel.astype(jnp.float32)
        y_stft = y_stft.astype(jnp.float32)
        mel_loss = weighted_mse(y_mel, target_mel, loss_cfg.mel_loss_weight)
        stft_loss = weighted_mse(y_stft, target_stft, loss_cfg.stft_loss_weight)
        if loss_cfg.loss_type == "log":
            loss = jnp.log(mel_loss) + jnp.log(stft_loss)
        else:
            loss = mel_loss + stft_loss
        return loss, (new_state, mel_loss, stft_loss)

    (loss, (new_state, mel_loss, stft_loss)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(ts["params"])
    new_ts, lr = apply_updates({**ts, "rng": rng}, grads, new_state, opt_cfg, opt)
    metrics = {"loss": loss, "mel_loss": mel_loss, "stft_loss": stft_loss,
               "lr": lr, "f_mel_pred": f_mel}
    return new_ts, metrics


def decoder_eval_step(params, model_state, mfcc, target_mel, target_stft, *,
                      enc_params, enc_state, enc_cfg, cfg, loss_cfg: DecoderLossConfig):
    enc_logits, _ = enc_m.apply(enc_params, enc_state, mfcc, cfg=enc_cfg, train=False)
    ppg = enc_m.posteriors(enc_logits)
    y_mel, y_stft, _ = dec_m.apply(params, model_state, ppg, cfg=cfg, train=False)
    mel_loss = weighted_mse(y_mel, target_mel, loss_cfg.mel_loss_weight)
    stft_loss = weighted_mse(y_stft, target_stft, loss_cfg.stft_loss_weight)
    if loss_cfg.loss_type == "log":
        loss = jnp.log(mel_loss) + jnp.log(stft_loss)
    else:
        loss = mel_loss + stft_loss
    return {"loss": loss, "mel_loss": mel_loss, "stft_loss": stft_loss}


# ------------------------------------------------------------- speaker-id ---

def speaker_train_step(ts, power_dB, class_oh, *, cfg: spk_m.SpeakerIdConfig,
                       opt_cfg: OptimizerConfig, opt, compute_dtype=None):
    """One verifier CNN step (voice_identification.py:202-223 analog).

    ``compute_dtype=jnp.bfloat16`` runs the conv/dense forward/backward in
    bf16 with f32 master weights and f32 loss/BN stats, like the encoder and
    decoder steps (_cast_floats)."""
    rng, _ = jax.random.split(ts["rng"])

    def loss_fn(params):
        logits, new_state = spk_m.apply(
            _cast_floats(params, compute_dtype), ts["model_state"],
            _cast_floats(power_dB, compute_dtype), cfg=cfg, train=True)
        logits = logits.astype(jnp.float32)
        loss = softmax_xent(logits, class_oh)
        return loss, (new_state, logits)

    (loss, (new_state, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts["params"])
    new_ts, lr = apply_updates({**ts, "rng": rng}, grads, new_state, opt_cfg, opt)
    acc = jnp.mean((jnp.argmax(logits, -1) == jnp.argmax(class_oh, -1)).astype(jnp.float32))
    return new_ts, {"loss": loss, "acc": acc, "lr": lr}


def speaker_eval_step(params, model_state, power_dB, class_oh, *, cfg: spk_m.SpeakerIdConfig):
    logits, _ = spk_m.apply(params, model_state, power_dB, cfg=cfg, train=False)
    acc = jnp.mean((jnp.argmax(logits, -1) == jnp.argmax(class_oh, -1)).astype(jnp.float32))
    return {"loss": softmax_xent(logits, class_oh), "acc": acc}
