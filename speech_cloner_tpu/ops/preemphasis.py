"""Pre-emphasis filter and its inverse, on-device.

Reference semantics (audio_lib.py:12-47):
  forward : y[n] = x[n] - c*x[n-1]            (scipy lfilter([1,-c],[1],x) — FIR, exact)
  inverse : y[n] = x[n] + c*y[n-1]            (scipy lfilter([1],[1,-c],x) — IIR)

The forward filter is a 2-tap FIR — trivially parallel. The inverse is a
first-order linear recurrence; the reference runs it serially on host CPU.
Here it is an O(log n) ``jax.lax.associative_scan`` so the whole vocoder tail
stays on device (SURVEY.md §7 "hard parts": inverse pre-emphasis as
associative scan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def preemphasis(x, coeff: float = 0.97, xp=jnp):
    """y[n] = x[n] - coeff*x[n-1], y[0] = x[0]. Works for numpy and jnp."""
    if coeff == 0.0:
        return x
    y = x - coeff * xp.concatenate([xp.zeros((1,), dtype=x.dtype), x[:-1]])
    return y


def inv_preemphasis(x, coeff: float = 0.97):
    """Inverse pre-emphasis y[n] = x[n] + coeff*y[n-1] via associative scan.

    The recurrence y[n] = a*y[n-1] + b[n] with constant a composes as
    (a1,b1)∘(a2,b2) = (a1*a2, a2*b1 + b2); an associative scan over these
    pairs yields all prefixes in O(log n) depth on the VPU.
    """
    if coeff == 0.0:
        return x
    a = jnp.full_like(x, coeff)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, y = jax.lax.associative_scan(combine, (a, x))
    return y


def inv_preemphasis_np(x, coeff: float = 0.97):
    """Host/numpy reference of the IIR inverse (scipy lfilter, like audio_lib.py:46)."""
    if coeff == 0.0:
        return x
    from scipy import signal

    return signal.lfilter([1.0], [1.0, -coeff], x).astype(x.dtype)
