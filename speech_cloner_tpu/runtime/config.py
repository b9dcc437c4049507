"""Config system: JSON round-trip of flat cfg dicts + derived fields.

Parity with the reference's aux_func.py (load_cfg_d :43, save_cfg_d :53,
show_diff :18) minus the interactive confirm prompt (callers pass
``on_conflict``), plus the derived-field computation the readers do inline
(hop_length/win_length from ms — TIMIT_reader.py:20-26; n_stft —
decoder.py:585).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable


def make_dir_path(path: str) -> None:
    if path:
        os.makedirs(path, exist_ok=True)


def show_diff(cfg_d: dict, old_cfg_d: dict, i_level: int = 0, out=print) -> int:
    """Recursive dict diff; returns number of changes (aux_func.py:18-41)."""
    keys = sorted(set(cfg_d) | set(old_cfg_d))
    n_changes = 0
    pad = i_level * "    "
    for k in keys:
        if k in cfg_d and k in old_cfg_d:
            if cfg_d[k] != old_cfg_d[k]:
                if isinstance(cfg_d[k], dict) and isinstance(old_cfg_d[k], dict):
                    out(f"{pad} |-> {k}")
                    n_changes += show_diff(cfg_d[k], old_cfg_d[k], i_level + 1, out)
                else:
                    out(f"{pad} |-> {k}: {old_cfg_d[k]!r} >>> {cfg_d[k]!r}")
                    n_changes += 1
        elif k not in cfg_d:
            out(f"{pad} |-> {k}: {old_cfg_d[k]!r} >>> ERASED")
            n_changes += 1
        else:
            out(f"{pad} |-> {k}: EMPTY >>> {cfg_d[k]!r}")
            n_changes += 1
    return n_changes


def load_cfg_d(cfg_path: str) -> dict[str, Any]:
    with open(cfg_path) as f:
        return json.load(f)


def save_cfg_d(
    cfg_d: dict,
    cfg_path: str,
    on_conflict: Callable[[dict, dict], bool] | str = "overwrite",
) -> bool:
    """Save a cfg dict; if the file exists and differs, ``on_conflict``
    decides ('overwrite' | 'keep' | callable(new, old) -> bool).
    Returns True if written.
    """
    cfg_path = cfg_path.replace("\\", "/")
    make_dir_path(os.path.dirname(cfg_path))
    if os.path.exists(cfg_path):
        old = load_cfg_d(cfg_path)
        normalized = json.loads(json.dumps(cfg_d))
        if old == normalized:
            return False
        if on_conflict == "keep":
            return False
        if callable(on_conflict) and not on_conflict(normalized, old):
            return False
    with open(cfg_path, "w") as f:
        json.dump(cfg_d, f, indent=1, sort_keys=True)
    return True


def derive_audio_fields(cfg_d: dict[str, Any]) -> dict[str, Any]:
    """Compute hop_length/win_length (samples) and n_stft from the ms-based
    fields, like the readers do at construction (TIMIT_reader.py:20-26,
    decoder.py:585). Returns a new dict."""
    d = dict(cfg_d)
    if "hop_length" not in d and "hop_length_ms" in d:
        d["hop_length"] = int(d["hop_length_ms"] * d["sample_rate"] / 1000.0)
    if "win_length" not in d and "win_length_ms" in d:
        d["win_length"] = int(d["win_length_ms"] * d["sample_rate"] / 1000.0)
    if "n_stft" not in d and "win_length" in d:
        n_fft = d.get("n_fft") or d["win_length"]
        d["n_stft"] = n_fft // 2 + 1
    return d


def feature_config_from_cfg_d(cfg_d: dict[str, Any]):
    """Reference-format ds cfg dict -> ops.FeatureConfig."""
    from ..ops.features import FeatureConfig

    d = derive_audio_fields(cfg_d)
    return FeatureConfig(
        sample_rate=d["sample_rate"],
        pre_emphasis=d["pre_emphasis"],
        hop_length=d["hop_length"],
        win_length=d["win_length"],
        n_fft=d.get("n_fft"),
        n_mels=d["n_mels"],
        n_mfcc=d["n_mfcc"],
        window=d["window"],
        mfcc_normaleze_first_mfcc=d["mfcc_normaleze_first_mfcc"],
        mfcc_norm_factor=d["mfcc_norm_factor"],
        calc_mfcc_derivate=d["calc_mfcc_derivate"],
        M_dB_norm_factor=d["M_dB_norm_factor"],
        P_dB_norm_factor=d["P_dB_norm_factor"],
        mean_abs_amp_norm=d["mean_abs_amp_norm"],
        clip_output=d["clip_output"],
    )
