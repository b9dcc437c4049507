"""Griffin-Lim phase reconstruction, fully on device.

The reference runs 200 serial librosa istft/stft rounds on host CPU — the
dominant inference cost (audio_lib.py:249-274, test.py:497). Here the whole
loop is a ``jax.lax.fori_loop`` over batched rfft/irfft + slice-based
overlap-add, compiled once and resident in HBM; the host only sees the final
waveform.

`from_power_to_wav` mirrors audio_lib.py:278-308: dB denorm
sqrt(db_to_power(P/0.01 - 80)), optional spectral sharpening exponent
``realse`` with mean-power renorm, inverse pre-emphasis (associative scan),
output amplitude norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .db import db_to_power
from .preemphasis import inv_preemphasis
from .stft import istft, stft


def griffin_lim(
    stft_amp,
    win_length: int,
    hop_length: int,
    num_iters: int = 200,
    n_fft: int | None = None,
    window: str = "hann",
    key=None,
    init_phase=None,
    momentum: float = 0.0,
    unroll: int = 1,
    return_stft: bool = False,
    dft: str = "fft",
):
    """Phase reconstruction from a time-major magnitude spectrogram [T, F].

    Reference loop structure (audio_lib.py:255-274): random phase in [0, pi),
    then num_iters rounds of istft -> stft -> keep-phase/replace-magnitude,
    where the final round is istft only. ``init_phase`` overrides the random
    init for deterministic/parity runs.

    ``return_stft`` also returns the final complex spectrogram the waveform
    was synthesized from — the streaming pipeline carries its trailing phase
    into the next chunk's ``init_phase`` for phase-coherent continuation.

    ``momentum`` > 0 enables Fast Griffin-Lim (Perraudin et al.; see also
    Deep Griffin-Lim Iteration, arXiv:1903.03971): the projected spectrogram
    is extrapolated by momentum*(P_t - P_{t-1}) before the phase is reused —
    markedly better convergence at the same iteration count. 0.0 reproduces
    the reference exactly; ~0.99 is a good setting.

    ``unroll`` replicates the loop body k times per fori_loop iteration to
    amortize the runtime's fixed per-iteration dispatch cost (identical
    math; num_iters-1 must stay divisible by it to reproduce the reference
    count — it is rounded down to the nearest divisor otherwise).
    ``unroll >= num_iters - 1`` removes the while loop entirely: the body
    is traced straight-line, which on runtimes with a fixed per-while-
    iteration cost (docs/DESIGN.md GL probes) is the only form that pays
    at small frame counts (the streaming chunks).
    """
    if n_fft is None:
        n_fft = win_length
    if key is None:
        key = jax.random.PRNGKey(0)

    stft_amp = stft_amp.astype(jnp.float32)
    if init_phase is not None:
        phase0 = jnp.asarray(init_phase, dtype=jnp.float32)
    else:
        phase0 = jnp.pi * jax.random.uniform(key, stft_amp.shape, dtype=jnp.float32)
    S0 = stft_amp * jnp.exp(1j * phase0)

    def project(S):
        wav = istft(S, hop_length=hop_length, win_length=win_length, n_fft=n_fft,
                    window=window, xp=jnp, dft=dft)
        return stft(wav, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
                    window=window, xp=jnp, dft=dft)

    def replace_magnitude(S):
        # amp * S/|S| == amp * exp(i*angle(S)) (audio_lib.py:268-270) but as a
        # complex normalization — one rsqrt instead of atan2 + sincos per bin.
        mag = jnp.abs(S)
        return stft_amp * (S / jnp.maximum(mag, jnp.finfo(jnp.float32).tiny))

    n_body = max(num_iters - 1, 0)
    k = max(1, min(unroll, n_body) if n_body else 1)
    while n_body % k:
        k -= 1

    if momentum == 0.0:
        def body(_, S):
            for _ in range(k):
                S = replace_magnitude(project(S))
            return S

        if k == n_body:           # fully unrolled: no while loop at all
            S = body(0, S0)
        else:
            S = jax.lax.fori_loop(0, n_body // k, body, S0)
    else:
        def body(_, carry):
            S, P_prev = carry
            for _ in range(k):
                P = project(S)
                extrap = P + momentum * (P - P_prev)
                S, P_prev = replace_magnitude(extrap), P
            return S, P_prev

        if k == n_body:
            S, _ = body(0, (S0, jnp.zeros_like(S0)))
        else:
            S, _ = jax.lax.fori_loop(0, n_body // k, body,
                                     (S0, jnp.zeros_like(S0)))
    wav = istft(S, hop_length=hop_length, win_length=win_length, n_fft=n_fft,
                window=window, xp=jnp, dft=dft)
    return (wav, S) if return_stft else wav


def griffin_lim_dyn(
    stft_amp,
    win_length: int,
    hop_length: int,
    num_iters,
    n_fft: int | None = None,
    window: str = "hann",
    key=None,
    init_phase=None,
    momentum=0.0,
    return_stft: bool = False,
    dft: str = "fft",
):
    """`griffin_lim` with ``num_iters`` and ``momentum`` as TRACED runtime
    values: one compiled executable serves every (iteration count, momentum)
    quality setting.

    Why this exists: the static form bakes the trip count into the program,
    and on the axon remote runtime the first execution of a high-trip-count
    ``fori_loop`` program is erratically slow even on a persistent-cache hit
    (BENCH r5 probes: 199-trip parity vocoder 240-650 s after the hit, the
    24-trip fast-GL program ~2 s — docs/ROUND5.md). A data-dependent
    ``lax.while_loop`` cannot be unrolled or specialized on the count, so
    parity-200 and fast-GL-25 share one small executable, warmed once at
    n=2. Math is identical to `griffin_lim`: with momentum m the body is
    ``P + m*(P - P_prev)``, and m == 0.0 reproduces the reference exactly
    (``P + 0*(P - P_prev) == P`` elementwise, up to the sign of zeros, which
    the downstream magnitude/normalize steps cannot observe).
    """
    if n_fft is None:
        n_fft = win_length
    if key is None:
        key = jax.random.PRNGKey(0)

    stft_amp = stft_amp.astype(jnp.float32)
    if init_phase is not None:
        phase0 = jnp.asarray(init_phase, dtype=jnp.float32)
    else:
        phase0 = jnp.pi * jax.random.uniform(key, stft_amp.shape, dtype=jnp.float32)
    S0 = stft_amp * jnp.exp(1j * phase0)
    momentum = jnp.asarray(momentum, dtype=jnp.float32)

    def project(S):
        wav = istft(S, hop_length=hop_length, win_length=win_length, n_fft=n_fft,
                    window=window, xp=jnp, dft=dft)
        return stft(wav, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
                    window=window, xp=jnp, dft=dft)

    def replace_magnitude(S):
        mag = jnp.abs(S)
        return stft_amp * (S / jnp.maximum(mag, jnp.finfo(jnp.float32).tiny))

    n_body = jnp.maximum(jnp.asarray(num_iters, jnp.int32) - 1, 0)

    def cond(carry):
        i, _, _ = carry
        return i < n_body

    def body(carry):
        i, S, P_prev = carry
        P = project(S)
        extrap = P + momentum * (P - P_prev)
        return i + 1, replace_magnitude(extrap), P

    _, S, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), S0, jnp.zeros_like(S0)))
    wav = istft(S, hop_length=hop_length, win_length=win_length, n_fft=n_fft,
                window=window, xp=jnp, dft=dft)
    return (wav, S) if return_stft else wav


def from_power_to_wav(
    P,
    P_dB_norm_factor: float = 0.01,
    pre_emphasis: float = 0.97,
    hop_length: int = 80,
    win_length: int = 400,
    mean_abs_amp_norm: float = 0.01,
    n_iter: int = 200,
    n_fft: int | None = None,
    realse: float = 1.0,
    key=None,
    momentum: float = 0.0,
    unroll: int = 1,
    dft: str = "fft",
):
    """Normalized power_dB map [T, n_stft] -> waveform, entirely on device.

    ``dft="matmul"`` computes the STFT/ISTFT pairs as MXU matmuls against
    precomputed cos/sin bases (ops/stft.py `_dft_mats`) — measured 1.7x
    faster end-to-end for 200-iter GL on a 60 s clip (parity RTF 0.0034 vs
    0.0059-0.0063, docs/ROUND5.md), numerically equivalent to ~1e-5."""
    P = jnp.maximum(0.0, P)

    if realse != 1.0:  # spectral sharpening with mean-power renorm (audio_lib.py:292-296)
        p_mean = jnp.mean(P)
        P = P**realse
        P = (p_mean / jnp.mean(P)) * P

    F = jnp.sqrt(db_to_power(P / P_dB_norm_factor - 80.0, xp=jnp))
    y = griffin_lim(F, win_length, hop_length, num_iters=n_iter, n_fft=n_fft,
                    key=key, momentum=momentum, unroll=unroll, dft=dft)

    if pre_emphasis != 0.0:
        y = inv_preemphasis(y, pre_emphasis)

    y = y * (mean_abs_amp_norm / jnp.mean(jnp.abs(y)))
    return y


def from_power_to_wav_dyn(
    P,
    n_iter,
    momentum=0.0,
    P_dB_norm_factor: float = 0.01,
    pre_emphasis: float = 0.97,
    hop_length: int = 80,
    win_length: int = 400,
    mean_abs_amp_norm: float = 0.01,
    n_fft: int | None = None,
    realse: float = 1.0,
    key=None,
    dft: str = "fft",
):
    """`from_power_to_wav` with traced ``n_iter``/``momentum`` (see
    `griffin_lim_dyn`): one executable per spectrogram shape serves every
    Griffin-Lim quality setting. ``dft="matmul"`` computes the transforms
    as MXU matmuls — no FFT custom call, hence no axon first-execution
    finalize stall (ops/stft.py `_dft_mats`)."""
    P = jnp.maximum(0.0, P)

    if realse != 1.0:
        p_mean = jnp.mean(P)
        P = P**realse
        P = (p_mean / jnp.mean(P)) * P

    F = jnp.sqrt(db_to_power(P / P_dB_norm_factor - 80.0, xp=jnp))
    y = griffin_lim_dyn(F, win_length, hop_length, n_iter, n_fft=n_fft,
                        key=key, momentum=momentum, dft=dft)

    if pre_emphasis != 0.0:
        y = inv_preemphasis(y, pre_emphasis)

    y = y * (mean_abs_amp_norm / jnp.mean(jnp.abs(y)))
    return y
