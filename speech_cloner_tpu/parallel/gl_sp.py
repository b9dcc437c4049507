"""Sequence-parallel Griffin-Lim: the vocoder loop with the time axis
sharded over a 'seq' mesh.

Completes the device-resident long-form story (SURVEY.md §5): with the model
forward already sequence-parallel (parallel/halo.py), this shards the
200-iteration istft/stft projection loop too, so arbitrarily long audio
never has to gather onto one chip until the final waveform assembly.

Exactness: the overlap-add crosses shard boundaries through a single
ppermute of the (n_fft - hop)-sample boundary tail per iteration, and the
re-framing borrows the same number of samples back from the right neighbor —
both transfers ride the ICI. The global reflect-padding of librosa's
center=True stft only affects the first/last n_fft//(2*hop) frames; those
are recomputed locally on the edge shards, so every frame of every iteration
is bit-equivalent (up to float addition order) to the single-device loop.

Requires hop | n_fft and n_fft == win_length (true for every shipped
config: 400/80).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.db import db_to_power
from ..ops.preemphasis import inv_preemphasis
from ..ops.stft import window_sumsquare
from ..ops.windows import get_window, pad_center


def _ola_local(frames, hop: int, xp=jnp):
    """[T, k*hop] -> [T*hop + (k-1)*hop] local overlap-add (slice trick)."""
    n_frames, n_fft = frames.shape
    k = n_fft // hop
    f = frames.reshape(n_frames, k, hop)
    f = xp.pad(f, ((k - 1, k - 1), (0, 0), (0, 0)))
    n_out = n_frames + k - 1
    acc = f[k - 1 : k - 1 + n_out, 0, :]
    for j in range(1, k):
        acc = acc + f[k - 1 - j : k - 1 - j + n_out, j, :]
    return acc.reshape(n_out * hop)


def _frame_local(y, n_fft: int, hop: int):
    """[T*hop + (n_fft-hop)] samples -> [T, n_fft] frames at stride hop."""
    n = y.shape[0]
    k = n_fft // hop
    n_frames = 1 + (n - n_fft) // hop
    chunks = y.reshape(n // hop, hop)
    parts = [chunks[j : j + n_frames] for j in range(k)]
    return jnp.concatenate(parts, axis=1)


def _gl_shard_fn(n_fft: int, hop: int, num_iters: int, window: str,
                 axis_name: str, momentum: float = 0.0):
    """Build the per-shard GL loop body (runs under shard_map)."""
    win = jnp.asarray(pad_center(get_window(window, n_fft, xp=np), n_fft),
                      jnp.float32)
    k = n_fft // hop
    tail_len = n_fft - hop  # (k-1)*hop samples that spill past a shard
    tiny = np.finfo(np.float32).tiny
    half = n_fft // 2

    def shard_fn(amp, phase0, wss_body, wss_tail):
        """amp/phase0: [T_loc, F] shard; wss_body: [T_loc*hop] shard;
        wss_tail: [tail_len] replicated. Returns (body, tail) waveform
        pieces in untrimmed global coordinates."""
        n = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        T_loc = amp.shape[0]
        body_len = T_loc * hop

        def istft_sp(S):
            frames = jnp.fft.irfft(S, n=n_fft, axis=1) * win[None, :]
            ola = _ola_local(frames, hop)
            body_raw = ola[:body_len]
            tail = ola[body_len:]
            # boundary tail flows rightward; shard 0 receives zeros
            recv = jax.lax.ppermute(tail, axis_name,
                                    [(i, i + 1) for i in range(n - 1)])
            body_raw = body_raw.at[:tail_len].add(recv)
            body = jnp.where(wss_body > tiny,
                             body_raw / jnp.where(wss_body > tiny, wss_body, 1.0),
                             body_raw)
            tail_div = jnp.where(wss_tail > tiny,
                                 tail / jnp.where(wss_tail > tiny, wss_tail, 1.0),
                                 tail)
            return body, tail_div

        def reframe_sp(body, tail_div):
            # extension: right neighbor's first tail_len body samples,
            # or (last shard) its own divided tail
            send = body[:tail_len]
            recv = jax.lax.ppermute(send, axis_name,
                                    [(i + 1, i) for i in range(n - 1)])
            ext = jnp.where(idx == n - 1, tail_div, recv)
            y_ext = jnp.concatenate([body, ext])
            frames = _frame_local(y_ext, n_fft, hop)

            # librosa center=True reflect-pad corrections, edge shards only.
            # global frame t uses y_trim[t*hop - half : t*hop - half + n_fft]
            # with y_trim = y_untrim[half : -half]; interior frames coincide
            # with y_untrim[t*hop : t*hop + n_fft] == the rows above.
            n_fix = -(-half // hop)  # frames touching the reflected region
            # -- global start (shard 0): y_pad = [reflect pad | y_untrim[half:]]
            # with pad = y_trim[1 : half+1] reversed = y_untrim[half+1 : 2*half+1]
            # reversed; y_start[s] == y_pad[s] in global coordinates.
            start_pad = body[half + 1 : 2 * half + 1][::-1]
            y_start = jnp.concatenate([start_pad, body[half:], ext])
            for t in range(n_fix):
                row = jax.lax.dynamic_slice(y_start, (t * hop,), (n_fft,))
                frames = frames.at[t].set(
                    jnp.where(idx == 0, row, frames[t]))
            # -- global end (last shard): y_trim ends at untrimmed L-half;
            # suffix pad = y_trim[-half-1 : -1] reversed
            y_end_region = jnp.concatenate([body, tail_div])  # local untrimmed
            L_loc = body_len + tail_len            # local untrimmed length
            trim_end = L_loc - half                # local index of y_trim end
            end_pad = y_end_region[trim_end - half - 1 : trim_end - 1][::-1]
            y_endp = jnp.concatenate([y_end_region[:trim_end], end_pad])
            # last global frame index (local): t_last = T_loc - 1; frame t
            # starts at local sample t*hop
            for j in range(n_fix):
                t = T_loc - 1 - j
                row = jax.lax.dynamic_slice(y_endp, (t * hop,), (n_fft,))
                frames = frames.at[t].set(
                    jnp.where(idx == n - 1, row, frames[t]))
            return frames

        def project(S):
            body, tail_div = istft_sp(S)
            frames = reframe_sp(body, tail_div)
            return jnp.fft.rfft(frames * win[None, :], n=n_fft, axis=1)

        def replace_mag(S2):
            mag = jnp.abs(S2)
            return amp * (S2 / jnp.maximum(mag, tiny))

        S0 = amp * jnp.exp(1j * phase0)
        if momentum == 0.0:
            def body_fn(_, S):
                return replace_mag(project(S))

            S = jax.lax.fori_loop(0, max(num_iters - 1, 0), body_fn, S0)
        else:
            def body_fn(_, carry):
                S, P_prev = carry
                Pp = project(S)
                return replace_mag(Pp + momentum * (Pp - P_prev)), Pp

            S, _ = jax.lax.fori_loop(0, max(num_iters - 1, 0), body_fn,
                                     (S0, jnp.zeros_like(S0)))
        return istft_sp(S)

    return shard_fn


def griffin_lim_seq_parallel(stft_amp, mesh: Mesh, *, win_length: int = 400,
                             hop_length: int = 80, num_iters: int = 200,
                             n_fft: int | None = None, window: str = "hann",
                             key=None, init_phase=None, momentum: float = 0.0,
                             axis_name: str = "seq"):
    """Sharded GL: time-major magnitude [T, F] -> waveform [T*hop - hop].

    T must divide by the mesh size; results match ops.griffin_lim given the
    same init phase (float addition order aside).
    """
    from jax import shard_map

    n_fft = n_fft or win_length
    assert n_fft % hop_length == 0 and n_fft == win_length, "hop | n_fft required"
    n = mesh.devices.size
    T, F = stft_amp.shape
    assert T % n == 0, f"frame count {T} must divide by mesh size {n}"
    assert (T // n) * hop_length > 2 * (n_fft // 2), \
        f"shard too short for edge reflection: T_loc={T // n}"
    if key is None:
        key = jax.random.PRNGKey(0)

    amp = jnp.asarray(stft_amp, jnp.float32)
    if init_phase is None:
        init_phase = jnp.pi * jax.random.uniform(key, amp.shape, dtype=jnp.float32)
    wss = jnp.asarray(
        window_sumsquare(window, T, hop_length, win_length, n_fft, xp=np),
        jnp.float32)
    body_all, wss_tail = wss[: T * hop_length], wss[T * hop_length :]

    fn = shard_map(
        _gl_shard_fn(n_fft, hop_length, num_iters, window, axis_name, momentum),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name), P()),
        out_specs=(P(axis_name), P(axis_name)),
    )
    body, tails = fn(amp, jnp.asarray(init_phase, jnp.float32), body_all, wss_tail)
    tail = tails[-(n_fft - hop_length):]  # only the last shard's tail is real
    y_untrim = jnp.concatenate([body, tail])
    return y_untrim[n_fft // 2 : y_untrim.shape[0] - n_fft // 2]


def from_power_to_wav_seq_parallel(P_dB, mesh: Mesh, *, P_dB_norm_factor=0.01,
                                   pre_emphasis=0.97, hop_length=80,
                                   win_length=400, mean_abs_amp_norm=0.045,
                                   n_iter=200, n_fft=None, realse=1.0,
                                   key=None, momentum: float = 0.0):
    """Sharded equivalent of ops.from_power_to_wav (audio_lib.py:278-308)."""
    Pc = jnp.maximum(0.0, P_dB)
    if realse != 1.0:
        p_mean = jnp.mean(Pc)
        Pc = Pc**realse
        Pc = (p_mean / jnp.mean(Pc)) * Pc
    F = jnp.sqrt(db_to_power(Pc / P_dB_norm_factor - 80.0, xp=jnp))
    y = griffin_lim_seq_parallel(F, mesh, win_length=win_length,
                                 hop_length=hop_length, num_iters=n_iter,
                                 n_fft=n_fft, key=key, momentum=momentum)
    if pre_emphasis != 0.0:
        y = inv_preemphasis(y, pre_emphasis)
    return y * (mean_abs_amp_norm / jnp.mean(jnp.abs(y)))
