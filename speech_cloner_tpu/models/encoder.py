"""Phoneme-posterior encoder: MFCC frames -> 61 TIMIT phone posteriors (PPG).

Pure-function rebuild of the reference's `encoder_spec_phn._build_model`
(encoder.py:78-123): prenet -> CBHG -> dense(n_output) logits, with softmax
posteriors and argmax classes derived from the logits. Weights import 1:1
from the shipped TF enc_*_ckpt checkpoints (runtime/tf_import.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..nn import (
    CBHGConfig,
    cbhg_apply,
    cbhg_init,
    dense,
    dense_init,
    prenet_apply,
    prenet_init,
)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Mirrors hp/encoder_cfg_d.json fields that shape the graph."""

    n_timesteps: int = 400
    input_dim: int = 80            # n_mfcc * (2 if deltas else 1)
    n_output: int = 61
    embed_size: int | None = None  # None -> input_dim (encoder.py:91-92)
    num_conv_banks: int = 6
    num_highwaynet_blocks: int = 1
    dropout_rate: float = 0.4
    use_lstm: bool = False
    fused_gru: bool = False  # direction-fused GRU scan (nn/modules.py)
    scan_unroll: int = 1     # GRU/LSTM lax.scan body replication

    @property
    def embed(self) -> int:
        return self.embed_size if self.embed_size is not None else self.input_dim

    @property
    def cbhg(self) -> CBHGConfig:
        return CBHGConfig(
            embed_size=self.embed,
            num_banks=self.num_conv_banks,
            num_highway=self.num_highwaynet_blocks,
            use_lstm=self.use_lstm,
            fused_gru=self.fused_gru,
            scan_unroll=self.scan_unroll,
        )


def init(key, cfg: EncoderConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    cbhg_params, cbhg_state = cbhg_init(k2, cfg.cbhg)
    params = {
        "prenet": prenet_init(k1, cfg.input_dim, cfg.embed),
        "CBHG": cbhg_params,
        "y_logits": dense_init(k3, cfg.embed, cfg.n_output),
    }
    state = {"CBHG": cbhg_state}
    return params, state


def apply(params, state, x, *, cfg: EncoderConfig, train: bool = False, rng=None,
          bn_momentum=None):
    """[B, T, input_dim] -> (logits [B, T, n_output], new_state).

    Softmax posteriors (the decoder's PPG input, decoder.py:86) are
    jax.nn.softmax(logits); classes are argmax(logits). ``bn_momentum``
    overrides the BN moving-stat decay (train/bn_recal.py passes 0.0 to
    collect true batch statistics).
    """
    if train:
        rng, pre_rng = jax.random.split(rng)
    else:
        pre_rng = None
    h = prenet_apply(params["prenet"], x, dropout_rate=cfg.dropout_rate,
                     train=train, rng=pre_rng)
    h, cbhg_state = cbhg_apply(params["CBHG"], state["CBHG"], h, cfg=cfg.cbhg,
                               train=train, bn_momentum=bn_momentum)
    logits = dense(params["y_logits"], h)
    return logits, {"CBHG": cbhg_state}


def posteriors(logits):
    return jax.nn.softmax(logits, axis=-1)


def predict_classes(logits):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def config_from_cfg_d(cfg_d: dict[str, Any]) -> EncoderConfig:
    """Build from a reference-format cfg dict (hp/encoder_cfg_d.json)."""
    t, e = cfg_d["input_shape"]
    return EncoderConfig(
        n_timesteps=t,
        input_dim=e,
        n_output=cfg_d["n_output"],
        embed_size=cfg_d.get("embed_size"),
        num_conv_banks=cfg_d["num_conv_banks"],
        num_highwaynet_blocks=cfg_d["num_highwaynet_blocks"],
        dropout_rate=cfg_d.get("dropout_rate", 0.4),
        use_lstm=cfg_d.get("use_lstm", False),
    )
