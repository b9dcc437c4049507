"""NN module library (reference: modules.py, rebuilt as pure functions)."""

from .modules import (
    BANK_EMBED,
    BN_EPS,
    BN_MOMENTUM,
    CBHGConfig,
    bn_apply,
    bn_init,
    cbhg_apply,
    cbhg_init,
    conv1d,
    conv1d_banks_apply,
    conv1d_banks_init,
    conv1d_init,
    dense,
    dense_init,
    dropout,
    glorot_uniform,
    gru_apply,
    gru_init,
    highway_apply,
    highway_init,
    lstm_apply,
    lstm_init,
    maxpool1d_same,
    pack_bank_kernels,
    prenet_apply,
    prenet_init,
)

__all__ = [
    "BANK_EMBED", "BN_EPS", "BN_MOMENTUM", "CBHGConfig", "bn_apply", "bn_init",
    "cbhg_apply", "cbhg_init", "conv1d", "conv1d_banks_apply",
    "conv1d_banks_init", "conv1d_init", "dense", "dense_init", "dropout",
    "glorot_uniform", "gru_apply", "gru_init", "highway_apply", "highway_init",
    "lstm_apply", "lstm_init", "maxpool1d_same", "pack_bank_kernels",
    "prenet_apply", "prenet_init",
]
