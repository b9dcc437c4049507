"""Two-step spectrogram decoder: PPG -> target-speaker mel -> linear spectrogram.

Pure-function rebuild of `decoder_specs._build_model` (decoder.py:75-182):

  step1: prenet(E=256) -> CBHG(K=32, hwy=4) -> dense(80)  = y_mel
  step2: prenet(E=512) -> CBHG(K=32, hwy=6) -> dense(201) = y_stft

Step2's input is y_mel, or — when `use_target_mel_step2` — the scheduled mix
f*y_mel + (1-f)*target_mel with f = min(1, 1.02*tanh(epoch/target_mel_step2_val))
(decoder.py:146-155, :258-260). The schedule lives in train/, not here; apply
takes the already-computed mix factor.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

from ..nn import CBHGConfig, cbhg_apply, cbhg_init, dense, dense_init, prenet_apply, prenet_init


@dataclasses.dataclass(frozen=True)
class DecoderStepConfig:
    embed_size: int
    num_conv_banks: int
    num_highwaynet_blocks: int
    n_output: int
    fused_gru: bool = False  # direction-fused GRU scan (nn/modules.py)
    use_lstm: bool = False   # the reference forwards cfg_d['use_lstm'] into
                             # BOTH CBHG stacks (decoder.py:123, :175)
    scan_unroll: int = 1     # GRU/LSTM lax.scan body replication

    @property
    def cbhg(self) -> CBHGConfig:
        return CBHGConfig(self.embed_size, self.num_conv_banks,
                          self.num_highwaynet_blocks, use_lstm=self.use_lstm,
                          fused_gru=self.fused_gru,
                          scan_unroll=self.scan_unroll)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Mirrors hp/decoder_cfg_d.json fields that shape the graph."""

    n_timesteps: int = 400
    input_dim: int = 61  # PPG width == encoder n_output
    step1: DecoderStepConfig = DecoderStepConfig(256, 32, 4, 80)
    step2: DecoderStepConfig = DecoderStepConfig(512, 32, 6, 201)
    dropout_rate: float = 0.1
    use_target_mel_step2: bool = False
    target_mel_step2_val: float = 500.0
    use_lstm: bool = False  # informational mirror of cfg_d['use_lstm']; the
                            # per-step use_lstm flags govern the stacks
                            # (config_from_cfg_d sets both)


def _step_init(key, in_dim, step: DecoderStepConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    cbhg_params, cbhg_state = cbhg_init(k2, step.cbhg)
    params = {
        "prenet": prenet_init(k1, in_dim, step.embed_size),
        "CBHG": cbhg_params,
        "y_logits": dense_init(k3, step.embed_size, step.n_output),
    }
    return params, {"CBHG": cbhg_state}


def init(key, cfg: DecoderConfig):
    k1, k2 = jax.random.split(key)
    s1_params, s1_state = _step_init(k1, cfg.input_dim, cfg.step1)
    s2_params, s2_state = _step_init(k2, cfg.step1.n_output, cfg.step2)
    return {"step1": s1_params, "step2": s2_params}, {"step1": s1_state, "step2": s2_state}


def _step_apply(params, state, x, step: DecoderStepConfig, dropout_rate, train, rng,
                bn_momentum=None):
    if train:
        rng, pre_rng = jax.random.split(rng)
    else:
        pre_rng = None
    h = prenet_apply(params["prenet"], x, dropout_rate=dropout_rate, train=train, rng=pre_rng)
    h, cbhg_state = cbhg_apply(params["CBHG"], state["CBHG"], h, cfg=step.cbhg,
                               train=train, bn_momentum=bn_momentum)
    return dense(params["y_logits"], h), {"CBHG": cbhg_state}


def apply(params, state, ppg, *, cfg: DecoderConfig, train: bool = False, rng=None,
          target_mel=None, f_mel_pred: float = 0.0, bn_momentum=None):
    """[B, T, 61] PPG -> (y_mel [B,T,80], y_stft [B,T,201], new_state).

    When cfg.use_target_mel_step2 and target_mel is given, step2 consumes
    f_mel_pred*y_mel + (1-f_mel_pred)*target_mel (decoder.py:148-152);
    otherwise it consumes y_mel directly (decoder.py:155). ``bn_momentum``
    overrides the BN moving-stat decay (train/bn_recal.py passes 0.0).
    """
    if train:
        r1, r2 = jax.random.split(rng)
    else:
        r1 = r2 = None
    y_mel, s1_state = _step_apply(params["step1"], state["step1"], ppg,
                                  cfg.step1, cfg.dropout_rate, train, r1,
                                  bn_momentum=bn_momentum)
    if cfg.use_target_mel_step2 and target_mel is not None:
        step2_in = f_mel_pred * y_mel + (1.0 - f_mel_pred) * target_mel
    else:
        step2_in = y_mel
    y_stft, s2_state = _step_apply(params["step2"], state["step2"], step2_in,
                                   cfg.step2, cfg.dropout_rate, train, r2,
                                   bn_momentum=bn_momentum)
    return y_mel, y_stft, {"step1": s1_state, "step2": s2_state}


def config_from_cfg_d(cfg_d: dict[str, Any]) -> DecoderConfig:
    """Build from a reference-format cfg dict (hp/decoder_cfg_d.json)."""
    t, e = cfg_d["input_shape"]
    s1, s2 = cfg_d["steps_v"]

    use_lstm = bool(cfg_d.get("use_lstm", False))

    def step(d, default_embed):
        return DecoderStepConfig(
            embed_size=d["embed_size"] if d["embed_size"] is not None else default_embed,
            num_conv_banks=d["num_conv_banks"],
            num_highwaynet_blocks=d["num_highwaynet_blocks"],
            n_output=d["n_output"],
            use_lstm=use_lstm,
        )

    return DecoderConfig(
        n_timesteps=t,
        input_dim=e,
        step1=step(s1, e),
        step2=step(s2, s1["n_output"]),
        dropout_rate=cfg_d.get("dropout_rate", 0.1),
        use_target_mel_step2=cfg_d.get("use_target_mel_step2", False),
        target_mel_step2_val=cfg_d.get("target_mel_step2_val", 500.0),
        use_lstm=cfg_d.get("use_lstm", False),
    )
