"""Runtime: config, checkpointing, TF weight import, metrics, profiling."""

from .checkpoint import Checkpointer
from .config import (
    derive_audio_fields,
    feature_config_from_cfg_d,
    load_cfg_d,
    make_dir_path,
    save_cfg_d,
    show_diff,
)

__all__ = [
    "Checkpointer", "derive_audio_fields", "feature_config_from_cfg_d",
    "load_cfg_d", "make_dir_path", "save_cfg_d", "show_diff",
]
