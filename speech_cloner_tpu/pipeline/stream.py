"""Streaming voice conversion: incremental cloning with bounded latency.

The reference can only convert COMPLETE recordings — its long-form strategy
is two half-offset window passes over the whole clip, stitched on host
(test.py:87-145), so the first output sample exists only after the last
input sample is available. `StreamingCloner` converts incrementally: push
audio as it arrives, receive cloned audio with a fixed worst-case input
latency of ``(chunk + lookahead + edge) frames`` (~3 s at the defaults).
This capability has no reference counterpart; it falls out of the
device-resident pipeline plus careful handling of the front-end's
whole-clip statistics.

Fidelity to the offline (full-clip) forward, chunk by chunk (measured at
production geometry in tools/stream_fidelity.py; results in docs/DESIGN.md):

- **model context**: each chunk's forward sees ``context_frames`` of real
  left context (recomputed from h=0 each step — the same warmup principle
  as the sequence-parallel path, parallel/halo.py; GRU state error decays
  exponentially in context length) and ``lookahead_frames`` of real right
  context for the backward GRU directions. Chunk 0's forward direction
  starts at h=0 == the exact global start, and the final flush window ends
  exactly at the last real frame, where the backward direction's h=0 is
  the exact global end (a zero-padded lookahead there would corrupt the
  tail the same way zero conv halos corrupted SP edges in round 2).
- **whole-clip feature statistics are carried, not re-estimated**: the
  reference normalizes amplitude by the clip-wide mean |y|
  (audio_lib.py:125-126) — streaming freezes the gain after the first
  window. MFCCs are invariant to that gain except through the first
  cepstral coefficient (a uniform dB offset lands entirely on the DC
  basis row of the orthonormal DCT), and the reference removes exactly
  that offset by subtracting frame 0's raw c0 (audio_lib.py:220-221) —
  streaming carries that scalar from chunk 0 and subtracts it in every
  chunk. The residual gain sensitivity enters only through the dB floor
  (``amin``) on near-silent mel bins; pass ``input_gain`` to remove it
  entirely when the capture level is calibrated. amplitude_to_db's
  ``top_db`` clip is relative to the GLOBAL mel max (ops/db.py) —
  streaming carries a running max.
- **STFT chunk edges see real neighbor audio**: the offline reflect pad
  only applies at the true clip edges, where streaming reproduces it (the
  flush window is framed center=False over an offline-identical
  reflect-padded tail); ``edge_frames`` boundary frames per side are
  computed and discarded in steady chunks.
- **vocoder continuity**: Griffin-Lim runs per chunk over
  ``[chunk - margin, chunk + margin]`` frames, seeded with the previous
  chunk's final STFT phase over the leading margin (phase-coherent
  continuation), the waveform overlap is crossfaded in the pre-emphasized
  domain, the inverse-pre-emphasis IIR state (audio_lib.py:31-47) carries
  across chunks exactly, and the output amplitude norm
  (audio_lib.py:306) becomes an EMA-smoothed gain with a per-chunk linear
  ramp instead of per-chunk AGC (which would pump).

Compiled-program economics: one (features+model) program and one vocoder
program per window shape. Steady state is one shape; ramp-up steps (while
``f0 < context_frames``) and the fixed-size flush window each compile
their own, all cached in the pipeline's bounded LRU.
"""

from __future__ import annotations

import numpy as np

from ..ops.db import db_to_power
from ..ops.features import feature_matrices
from ..ops.griffin_lim import griffin_lim
from ..ops.preemphasis import inv_preemphasis_np, preemphasis
from ..ops.stft import stft
from .clone import ClonePipeline

_TINY = np.float32(np.finfo(np.float32).tiny)


class StreamingCloner:
    """Incremental wav -> cloned-wav converter around a `ClonePipeline`.

    Usage::

        s = StreamingCloner(pipeline)
        for block in microphone():          # arbitrary block sizes
            out.append(s.push(block))       # 0+ samples per call
        out.append(s.flush())               # drain the tail

    Emits float32 waveform at the pipeline's output level convention
    (`pipeline.mean_abs_amp_norm`). Total emitted length is exactly
    ``(n_samples // hop + 1) * hop`` — one hop per STFT frame of the
    pushed audio, like the offline frame grid (the final hop has no
    synthesizable frame beyond the last one and is emitted as the inverse
    pre-emphasis decay tail).
    """

    def __init__(
        self,
        pipeline: ClonePipeline,
        *,
        chunk_frames: int = 400,
        context_frames: int = 400,
        lookahead_frames: int = 200,
        margin_frames: int = 16,
        edge_frames: int = 4,
        seed: int = 0,
        input_gain: float | None = None,
        out_gain_ema: float = 0.9,
        collect_debug: bool = False,
    ):
        if chunk_frames < 1:
            raise ValueError("chunk_frames must be >= 1")
        if margin_frames < 2:
            raise ValueError("margin_frames must be >= 2 (crossfade needs >= 1 hop)")
        if margin_frames > lookahead_frames + edge_frames:
            raise ValueError("margin_frames must be <= lookahead_frames + edge_frames")
        feat = pipeline.feat_cfg
        # edge_frames must cover the STFT reflect-pad contamination depth
        min_edge = -(-feat.n_fft_ // (2 * feat.hop_length))  # ceil(n_fft/2 / hop)
        if edge_frames < min_edge:
            raise ValueError(f"edge_frames must be >= {min_edge} for this STFT geometry")

        self.p = pipeline
        self.feat = feat
        self.hop = feat.hop_length
        self.C = chunk_frames
        self.Lc = context_frames
        self.Rc = lookahead_frames
        self.M = margin_frames
        self.EB = edge_frames
        self.out_gain_ema = out_gain_ema
        self.collect_debug = collect_debug
        self.debug_stft: list[np.ndarray] = []

        self._rng = np.random.default_rng(seed)
        self._buf = np.zeros(0, np.float32)
        self._buf_start = 0        # global sample index of _buf[0]
        self._n_samples = 0        # total samples pushed
        self._f0 = 0               # next frame index to emit
        self._gain = input_gain    # input amp-norm gain; frozen at first step
        self._c0 = 0.0             # carried raw first-MFCC offset (chunk 0 frame 0)
        self._mel_max = -np.inf    # carried global max for the top_db clip
        self._tail: np.ndarray | None = None        # preemph-domain overlap
        self._phase_tail: np.ndarray | None = None  # [M, n_stft] carried phase
        self._inv_state = 0.0      # inverse-preemphasis IIR state (last output)
        self._out_ema: float | None = None
        self._out_gain_prev: float | None = None
        self._done = False
        mel_w, dct = feature_matrices(feat)
        self._mel_w = mel_w
        self._dct = dct

    # ------------------------------------------------------------- public ---

    @property
    def min_input_frames(self) -> int:
        """Frames of input needed before the first chunk can emit (the
        algorithmic input latency, excluding compute)."""
        return self.C + self.Rc + self.EB

    @property
    def latency_seconds(self) -> float:
        return self.min_input_frames * self.hop / self.feat.sample_rate

    def push(self, samples) -> np.ndarray:
        """Feed arbitrary-length audio; returns newly available output."""
        if self._done:
            raise RuntimeError("push() after flush()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size:
            self._buf = np.concatenate([self._buf, samples])
            self._n_samples += samples.size
        out = []
        while (self._f0 + self.min_input_frames) * self.hop <= self._n_samples:
            out.append(self._step())
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def flush(self) -> np.ndarray:
        """Convert the remaining tail exactly and finish the stream.

        Unlike the steady chunks (which always have real lookahead), the
        flush window ends at the last real frame: the backward GRUs enter
        it at h=0 — precisely the offline forward's global end — and the
        STFT tail is reflect-padded the way the offline front-end pads it.
        """
        if self._done:
            return np.zeros(0, np.float32)
        self._done = True
        total = self._n_samples // self.hop + 1 if self._n_samples else 0
        if self._f0 >= total:
            return np.zeros(0, np.float32)
        return self._flush_step(total)

    def convert_all(self, wav, block: int = 16000) -> np.ndarray:
        """Convenience: stream a complete waveform through push/flush."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        parts = [self.push(wav[i:i + block]) for i in range(0, wav.size, block)]
        parts.append(self.flush())
        return np.concatenate(parts)

    # -------------------------------------------------------------- steps ---

    def _step(self) -> np.ndarray:
        """One steady chunk: emit frames [f0, f0+C) from a real-context
        window [f0-Lc-EB, f0+C+Rc+EB) (clamped at the global start)."""
        import jax.numpy as jnp

        hop, C, M = self.hop, self.C, self.M
        f0 = self._f0
        f1 = f0 + C
        a = max(0, f0 - self.Lc - self.EB)       # window start frame
        e = f1 + self.Rc + self.EB               # window end frame
        v0 = max(0, f0 - M)                      # vocode region start frame
        v1 = f1 + M

        y_slice = self._buf[a * hop - self._buf_start : e * hop - self._buf_start]
        if self._gain is None:
            m = float(np.mean(np.abs(y_slice)))
            self._gain = self.feat.mean_abs_amp_norm / max(m, float(_TINY))

        first = f0 == 0
        fwd = self.p._jitted(
            "stream_fwd", (y_slice.size, v0 - a, v1 - a, first),
            lambda: self._build_fwd(y_slice.size, v0 - a, v1 - a, first))
        if first:
            stft_v, mel_max, c0 = fwd(jnp.asarray(y_slice),
                                      np.float32(self._gain),
                                      np.float32(self._mel_max))
            self._c0 = float(c0)
        else:
            stft_v, mel_max = fwd(jnp.asarray(y_slice), np.float32(self._gain),
                                  np.float32(self._c0), np.float32(self._mel_max))
        self._mel_max = float(mel_max)
        if self.collect_debug:
            self.debug_stft.append(np.asarray(stft_v)[f0 - v0 : f1 - v0])

        # vocode [v0, v1) with carried-phase init
        W_v = v1 - v0
        phase = np.pi * self._rng.random((W_v, self.feat.n_stft)).astype(np.float32)
        if self._phase_tail is not None:
            phase[:M] = self._phase_tail
        gl = self.p._jitted("stream_gl", (W_v, f1 - v0, True),
                            lambda: self._build_gl(W_v, f1 - v0))
        wav_pre, phase_tail = gl(stft_v, jnp.asarray(phase))
        wav_pre = np.array(wav_pre)              # [(W_v-1)*hop], preemph domain
        self._phase_tail = np.asarray(phase_tail)

        t_lo = (f1 - v0) * hop
        emit = self._emit(wav_pre, (f0 - v0) * hop, C * hop,
                          wav_pre[t_lo : t_lo + (M - 1) * hop].copy())

        # advance; drop audio no future window (incl. the flush window's
        # reflect-padded tail framing) can reach
        self._f0 = f1
        keep_from = max(0, (self._f0 - (self.Lc + self.C + self.Rc + 2 * self.EB))
                        * hop - self.feat.n_fft_)
        if keep_from > self._buf_start:
            self._buf = self._buf[keep_from - self._buf_start:]
            self._buf_start = keep_from
        return emit

    def _flush_step(self, total: int) -> np.ndarray:
        """The exact end window: frames [total - W_end, total), framed
        center=False over offline-identical reflect padding, emitting the
        remaining R = total - f0 frames (R <= C + Rc + EB by construction:
        push() drains eagerly)."""
        import jax.numpy as jnp

        hop, M = self.hop, self.M
        feat = self.feat
        f0 = self._f0
        W_end = min(total, self.Lc + self.C + self.Rc + 2 * self.EB)
        a = total - W_end
        half = feat.n_fft_ // 2
        L = self._n_samples

        # offline-identical padded sample stream for frames [a, total):
        # padded[i] corresponds to global sample i with single reflection
        # at both true clip edges (np.pad mode='reflect' semantics)
        idx = np.arange(a * hop - half, (total - 1) * hop - half + feat.n_fft_)
        idx = np.abs(idx)
        idx = np.where(idx > L - 1, np.maximum(2 * (L - 1) - idx, 0), idx)
        y_ext = self._buf[idx - self._buf_start]

        if self._gain is None:
            m = float(np.mean(np.abs(self._buf[max(0, -self._buf_start):])))
            self._gain = feat.mean_abs_amp_norm / max(m, float(_TINY))

        first = f0 == 0
        fwd = self.p._jitted("stream_fwd_end", (y_ext.size, W_end, first),
                             lambda: self._build_fwd(y_ext.size, 0, W_end, first,
                                                     centered=False))
        if first:
            stft_full, mel_max, c0 = fwd(jnp.asarray(y_ext),
                                         np.float32(self._gain),
                                         np.float32(self._mel_max))
            self._c0 = float(c0)
        else:
            stft_full, mel_max = fwd(jnp.asarray(y_ext), np.float32(self._gain),
                                     np.float32(self._c0),
                                     np.float32(self._mel_max))
        self._mel_max = float(mel_max)
        stft_full = np.asarray(stft_full)
        if self.collect_debug:
            self.debug_stft.append(stft_full[f0 - a : total - a])

        # fixed-size end vocode region [total - W_v, total)
        W_v = min(self.C + self.Rc + self.EB + M, total)
        v0 = total - W_v
        stft_v = stft_full[v0 - a : total - a]
        phase = np.pi * self._rng.random((W_v, feat.n_stft)).astype(np.float32)
        if self._phase_tail is not None and f0 - M >= v0:
            phase[f0 - M - v0 : f0 - v0] = self._phase_tail
        gl = self.p._jitted("stream_gl_end", (W_v, M, False),
                            lambda: self._build_gl(W_v, M, tail=False))
        wav_pre = np.array(gl(jnp.asarray(stft_v), jnp.asarray(phase)))

        emit = self._emit(wav_pre, (f0 - v0) * hop, (total - f0) * hop, None)
        self._f0 = total
        return emit

    def _emit(self, wav_pre, s_lo: int, n_emit: int, tail):
        """Shared host tail of a step: crossfade the leading margin with the
        previous chunk, cut the emit region (zero-extending past the last
        synthesizable sample), carry the inverse-pre-emphasis IIR state, and
        apply the EMA output gain with a per-chunk linear ramp."""
        if self._tail is not None:
            ov = self._tail.size                 # (M-1)*hop
            # raised-cosine fade from the previous chunk into this one (a
            # flush with fewer remaining samples than the margin fades over
            # what exists)
            w = 0.5 * (1.0 + np.cos(np.pi * np.arange(ov) / ov)).astype(np.float32)
            n = min(ov, wav_pre.size - s_lo)
            wav_pre[s_lo:s_lo + n] = (w[:n] * self._tail[:n]
                                      + (1.0 - w[:n]) * wav_pre[s_lo:s_lo + n])
        self._tail = tail
        emit = np.zeros(n_emit, np.float32)
        seg = wav_pre[s_lo:s_lo + n_emit]
        emit[:seg.size] = seg

        # exact streaming inverse pre-emphasis: the IIR y[n] = x[n] + c*y[n-1]
        # continues across chunks by folding c*y_prev into the first sample
        c = self.feat.pre_emphasis
        if c != 0.0 and emit.size:
            emit[0] += c * self._inv_state
            emit = inv_preemphasis_np(emit, c)
            self._inv_state = float(emit[-1])

        # EMA output gain with a per-chunk linear ramp (no per-chunk AGC)
        if emit.size:
            m_abs = float(np.mean(np.abs(emit)))
            self._out_ema = (m_abs if self._out_ema is None else
                             self.out_gain_ema * self._out_ema
                             + (1.0 - self.out_gain_ema) * m_abs)
            g_new = self.p.mean_abs_amp_norm / max(self._out_ema, float(_TINY))
            g_prev = g_new if self._out_gain_prev is None else self._out_gain_prev
            emit *= np.linspace(g_prev, g_new, emit.size, dtype=np.float32)
            self._out_gain_prev = g_new
        return emit

    # ----------------------------------------------------- device builders ---

    def _build_fwd(self, n_samples: int, v_lo: int, v_hi: int, first: bool,
                   centered: bool = True):
        """(features + encoder + decoder) for one window -> stft_pred slice.

        Mirrors ops/features.mfcc_input (audio_lib.py:89-244) with the three
        whole-clip statistics replaced by carried values: fixed gain, carried
        raw-c0 offset, carried running mel max for the top_db clip. The flush
        window passes ``centered=False``: its input is already the
        offline-identical reflect-padded sample stream.
        """
        import jax
        import jax.numpy as jnp

        feat = self.feat
        mel_w = jnp.asarray(self._mel_w)
        dct = jnp.asarray(self._dct)
        n_frames = (n_samples // feat.hop_length if centered else
                    (n_samples - feat.n_fft_) // feat.hop_length + 1)

        def features(y, gain, c0_in, mel_max_in):
            y = y * gain
            y = preemphasis(y, feat.pre_emphasis, xp=jnp)
            F = jnp.abs(stft(y, n_fft=feat.n_fft_, hop_length=feat.hop_length,
                             win_length=feat.win_length, window=feat.window,
                             center=centered, xp=jnp))
            P = F * F
            M_spec = P @ mel_w.T
            # amplitude_to_db (ops/db.py) with the global max carried across
            # chunks: amin=1e-5 on magnitude == 1e-10 on power
            raw = 10.0 * jnp.log10(jnp.maximum(1e-10, M_spec * M_spec))
            mel_max = jnp.maximum(mel_max_in, jnp.max(raw))
            M_dB = jnp.maximum(raw, mel_max - 80.0)
            MFCC = M_dB @ dct.T
            c0 = MFCC[0, 0] if first else c0_in
            if feat.mfcc_normaleze_first_mfcc:
                MFCC = MFCC.at[:, 0].add(-c0)
            if feat.mfcc_norm_factor != 1.0:
                MFCC = feat.mfcc_norm_factor * MFCC
            if feat.calc_mfcc_derivate:
                zeros = jnp.zeros((1, MFCC.shape[1]), jnp.float32)
                d = 2.0 * jnp.concatenate([zeros, MFCC[2:] - MFCC[:-2], zeros], 0)
                MFCC = jnp.concatenate([MFCC, d], 1)
            if feat.clip_output:
                MFCC = jnp.clip(MFCC, -1.0, 1.0)
            return MFCC, mel_max, c0

        if first:
            def fn(y, gain, mel_max_in):
                mfcc, mel_max, c0 = features(y, gain, 0.0, mel_max_in)
                _, stft_pred, _ = self.p.forward_windows(mfcc[:n_frames][None])
                return stft_pred[0, v_lo:v_hi], mel_max, c0
        else:
            def fn(y, gain, c0_in, mel_max_in):
                mfcc, mel_max, _ = features(y, gain, c0_in, mel_max_in)
                _, stft_pred, _ = self.p.forward_windows(mfcc[:n_frames][None])
                return stft_pred[0, v_lo:v_hi], mel_max
        return jax.jit(fn)

    def _build_gl(self, n_frames: int, tail_lo: int, tail: bool = True):
        """Griffin-Lim over one vocode region, seeded phase, returning the
        pre-emphasized-domain waveform (plus the trailing-margin phase for
        the next chunk unless ``tail=False`` — the flush has no successor).
        Denorm matches from_power_to_wav (audio_lib.py:278-308) minus the
        inverse pre-emphasis + amp norm, which stream host-side."""
        import jax
        import jax.numpy as jnp

        feat = self.feat
        p = self.p

        def fn(stft_v, phase0):
            P = jnp.maximum(0.0, stft_v)
            if p.realse != 1.0:
                # per-chunk mean renorm — an approximation of the clip-wide
                # renorm (audio_lib.py:292-296); exact when realse == 1
                p_mean = jnp.mean(P)
                P = P ** p.realse
                P = (p_mean / jnp.mean(P)) * P
            F = jnp.sqrt(db_to_power(P / feat.P_dB_norm_factor - 80.0, xp=jnp))
            wav, S = griffin_lim(F, feat.win_length, feat.hop_length,
                                 num_iters=p.n_iter, n_fft=feat.n_fft_,
                                 window=feat.window, init_phase=phase0,
                                 momentum=p.gl_momentum, return_stft=True)
            if not tail:
                return wav
            return wav, jnp.angle(S[tail_lo - self.M : tail_lo])
        return jax.jit(fn)
