"""dB conversions with librosa's exact clipping semantics.

Reference pins:
  P_dB   = librosa.power_to_db(P)            (audio_lib.py:157)  ref=1, amin=1e-10, top_db=80
  M_dB   = librosa.amplitude_to_db(M_spec)   (audio_lib.py:172)  amin=1e-5, top_db=80
  power  = librosa.db_to_power(dB)           (audio_lib.py:298)

Note: top_db clips relative to the *global* max of the array — a whole-array
reduction, cheap on device.
"""

from __future__ import annotations

import numpy as np


def power_to_db(P, ref: float = 1.0, amin: float = 1e-10, top_db: float | None = 80.0, xp=np):
    log_spec = 10.0 * xp.log10(xp.maximum(amin, P))
    log_spec = log_spec - 10.0 * np.log10(max(amin, ref))
    if top_db is not None:
        log_spec = xp.maximum(log_spec, xp.max(log_spec) - top_db)
    return log_spec


def amplitude_to_db(S, ref: float = 1.0, amin: float = 1e-5, top_db: float | None = 80.0, xp=np):
    magnitude = xp.abs(S)
    return power_to_db(magnitude**2, ref=ref**2, amin=amin**2, top_db=top_db, xp=xp)


def db_to_power(dB, ref: float = 1.0, xp=np):
    return ref * xp.power(10.0, 0.1 * dB)


def db_to_amplitude(dB, ref: float = 1.0, xp=np):
    return db_to_power(dB, ref=ref**2, xp=xp) ** 0.5
