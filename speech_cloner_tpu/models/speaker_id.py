"""Speaker-identification CNN (the conversion sanity-checker).

Rebuild of voice_identification.py:9-37 (Keras Sequential):
  reshape [B,400,201,1] -> Conv2D(32,5,valid,relu) -> MaxPool(2)
  -> Conv2D(64,3,valid,relu) -> MaxPool(2) -> Flatten -> BatchNorm
  -> Dense(128,relu) -> Dense(512,relu) -> Dense(n_spk) softmax.

Used to verify that conversion actually changes speaker identity
(SURVEY.md §0.5). Keras defaults preserved: valid padding, glorot-uniform
kernels, BN eps 1e-3.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import bn_apply, bn_init, dense, dense_init, glorot_uniform


@dataclasses.dataclass(frozen=True)
class SpeakerIdConfig:
    n_timesteps: int = 400
    n_features: int = 201  # power_dB windows (voice_identification.py:180)
    n_output: int = 630
    # TPU-first variant of the reference's C_in=1 shape pathology: fold k
    # consecutive time frames into input channels ([B,400,201,1] ->
    # [B,400/k,201,k]). The r4 MFU ablation showed the two convs are 26 of
    # 29 ms because a single input channel leaves the MXU ~99% idle; folding
    # raises conv1's C_in to k and quarters the activation rows. A DIFFERENT
    # model (time receptive field per tap grows k-fold), so it ships behind
    # a flag with a measured accuracy A/B (docs/DESIGN.md), never as the
    # reference-parity default (voice_identification.py:9-37 is fold=1).
    time_fold: int = 1

    @property
    def flat_dim(self) -> int:
        h = (self.n_timesteps // self.time_fold - 4) // 2  # conv5 valid, pool2
        w = (self.n_features - 4) // 2
        h = (h - 2) // 2                  # conv3 valid, pool2
        w = (w - 2) // 2
        return h * w * 64


def _conv2d_init(key, k, cin, cout):
    fan_in, fan_out = k * k * cin, k * k * cout
    return {
        "kernel": glorot_uniform(key, (k, k, cin, cout), fan_in, fan_out),
        "bias": jnp.zeros((cout,)),
    }


def _conv2d_valid(params, x):
    y = jax.lax.conv_general_dilated(
        x, params["kernel"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["bias"]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1), padding="VALID",
    )


def init(key, cfg: SpeakerIdConfig):
    if cfg.time_fold > 1 and cfg.n_timesteps % cfg.time_fold:
        raise ValueError(f"n_timesteps={cfg.n_timesteps} must divide by "
                         f"time_fold={cfg.time_fold}")
    if cfg.flat_dim <= 0:
        raise ValueError(f"degenerate geometry: conv/pool stack reduces "
                         f"[{cfg.n_timesteps}/{cfg.time_fold}, "
                         f"{cfg.n_features}] to zero rows/cols")
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    bn_params, bn_state = bn_init(cfg.flat_dim)
    params = {
        "conv1": _conv2d_init(k1, 5, cfg.time_fold, 32),
        "conv2": _conv2d_init(k2, 3, 32, 64),
        "bn": bn_params,
        "dense1": dense_init(k3, cfg.flat_dim, 128),
        "dense2": dense_init(k4, 128, 512),
        "dense3": dense_init(k5, 512, cfg.n_output),
    }
    return params, {"bn": bn_state}


def apply(params, state, x, *, cfg: SpeakerIdConfig, train: bool = False,
          bn_momentum=None):
    """[B, T, F] power_dB windows -> (logits [B, n_spk], new_state).

    ``bn_momentum`` overrides the BN moving-stat decay (train/bn_recal.py
    passes 0.0 to collect true batch statistics)."""
    if cfg.time_fold > 1:
        B, T, F = x.shape
        k = cfg.time_fold
        # [B, T, F] -> [B, T/k, F, k]: k consecutive frames become channels
        h = x.reshape(B, T // k, k, F).transpose(0, 1, 3, 2)
    else:
        h = x[..., None]
    h = jax.nn.relu(_conv2d_valid(params["conv1"], h))
    h = _maxpool2(h)
    h = jax.nn.relu(_conv2d_valid(params["conv2"], h))
    h = _maxpool2(h)
    h = h.reshape(h.shape[0], -1)
    h, bn_state = bn_apply(params["bn"], state["bn"], h, train,
                           momentum=bn_momentum)
    h = jax.nn.relu(dense(params["dense1"], h))
    h = jax.nn.relu(dense(params["dense2"], h))
    logits = dense(params["dense3"], h)
    return logits, {"bn": bn_state}
