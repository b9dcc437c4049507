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

Multi-stream serving: ``batch=B`` converts B independent live streams in
lockstep through ONE device program per step (2-D ``[B, n]`` push/flush
API). On the TPU the per-chunk cost is dominated by Griffin-Lim's fixed
per-loop-iteration dispatch cost (docs/DESIGN.md), which is paid once per
STEP, not per stream — so per-chip concurrent-stream capacity scales far
better than running B single-stream sessions. Every carried statistic
(gain, c0, mel max, phase, IIR state, output gain) is per-stream; a
batched run is numerically the per-stream runs (test_stream.py).

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
  (audio_lib.py:125-126) — streaming estimates the gain from the first
  window and, by default (``gain_mode="running"``), keeps refining it to
  the mean over *everything that has arrived*, converging to the offline
  clip-wide estimate (the flush window runs at EXACTLY the offline gain).
  Refining is safe because MFCCs are invariant to that gain except through
  the first cepstral coefficient (a uniform gain is a uniform dB offset,
  which lands entirely on the DC basis row of the orthonormal DCT), and
  the reference removes exactly that offset by subtracting frame 0's raw
  c0 (audio_lib.py:220-221). To keep that subtraction exact while the
  gain evolves, streaming carries the first emitted frame's mel spectrum
  AT UNIT GAIN (the mel power map scales as gain²) and re-derives raw c0
  on device every window at that window's gain and running mel max —
  floors included. (A scalar c0 shifted by ``delta_dB*sqrt(n_mels)`` is
  NOT exact: amin-floored bins don't shift with gain, and measurement
  showed a silence-heavy frame 0 makes the scalar form worse than no
  update at all.) The running mel max itself shifts exactly
  (``mel_max += delta_dB``; the max is never a floored value once any
  sound has arrived). The residual gain sensitivity enters only through
  the dB floor (``amin``) on near-silent mel bins of the OTHER frames —
  and decays as the running estimate converges; pass ``input_gain`` to
  remove it entirely when the capture level is calibrated, or
  ``gain_mode="frozen"`` to keep the first-window estimate for the whole
  stream. amplitude_to_db's ``top_db`` clip is relative to the GLOBAL mel
  max (ops/db.py) — streaming carries a running max.
- **STFT chunk edges see real neighbor audio**: the offline reflect pad
  only applies at the true clip edges, where streaming reproduces it — the
  flush window is framed center=False over the pre-emphasized stream
  reflect-padded exactly as the offline front-end pads it (pre-emphasis
  FIRST, np.pad-reflect semantics, ops/features.mfcc_input); ``edge_frames``
  boundary frames per side are computed and discarded in steady chunks.
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
from ..ops.preemphasis import preemphasis
from ..ops.stft import stft
from .clone import ClonePipeline

_TINY = np.float32(np.finfo(np.float32).tiny)
# floor for the mean-|y| input-gain estimates: a silent window must not
# produce a gain whose SQUARE overflows float32 (the carried unit-gain
# mel0 is rescaled by gain^2 on device; norm/1e-12 squared is ~2e21,
# comfortably finite, where norm/float32-tiny squared is inf -> NaN)
_MIN_MEAN = np.float32(1e-12)


class StreamingCloner:
    """Incremental wav -> cloned-wav converter around a `ClonePipeline`.

    Usage::

        s = StreamingCloner(pipeline)
        for block in microphone():          # arbitrary block sizes
            out.append(s.push(block))       # 0+ samples per call
        out.append(s.flush())               # drain the tail

    With ``batch=B``, push/flush take and return ``[B, n]`` arrays and the
    B streams are converted in lockstep (equal lengths; a serving frontend
    pads idle streams with silence).

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
        batch: int | None = None,
        mesh=None,
        input_gain=None,
        gain_mode: str | None = None,
        first_gain: str = "window",
        out_gain_ema: float = 0.9,
        collect_debug: bool = False,
    ):
        if chunk_frames < 1:
            raise ValueError("chunk_frames must be >= 1")
        if margin_frames < 2:
            raise ValueError("margin_frames must be >= 2 (crossfade needs >= 1 hop)")
        if margin_frames > lookahead_frames + edge_frames:
            raise ValueError("margin_frames must be <= lookahead_frames + edge_frames")
        if margin_frames > context_frames + edge_frames:
            # _step's vocode region starts margin frames before the emit
            # start; the window only reaches context+edge frames back, so a
            # larger margin would slice the stft_pred window out of range
            raise ValueError("margin_frames must be <= context_frames + edge_frames")
        if chunk_frames < margin_frames - 1:
            # the crossfade region ((margin-1) hops) must fit inside one
            # emitted chunk, or it would overlap the tail snapshot taken for
            # the NEXT chunk and leave a seam discontinuity
            raise ValueError("chunk_frames must be >= margin_frames - 1")
        if batch is not None and batch < 1:
            raise ValueError("batch must be >= 1")
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
        # gain_mode: "running" keeps refining the input-gain estimate to the
        # mean |y| over everything arrived so far (exact modulo the amin
        # floor — requires the c0 normalization that makes MFCCs
        # gain-invariant); "frozen" keeps the first-window estimate (the
        # round-3 behavior). None = running when supported, else frozen.
        if gain_mode not in (None, "running", "frozen"):
            raise ValueError("gain_mode must be 'running' or 'frozen'")
        if gain_mode == "running" and not feat.mfcc_normaleze_first_mfcc:
            raise ValueError(
                "gain_mode='running' needs mfcc_normaleze_first_mfcc (the "
                "carried-c0 subtraction is what makes a gain update exact)")
        self._running = (gain_mode != "frozen" and input_gain is None
                         and feat.mfcc_normaleze_first_mfcc)
        # first_gain: scope of a stream's FIRST (frozen-at-pending) gain
        # estimate. "window" = that step's full model window (context +
        # emit + lookahead + edge; deterministic in the stream CONTENT, so
        # output is invariant to how the audio was sliced into pushes).
        # "buffered" = everything the occupant has pushed by its first step
        # — strictly closer to the offline clip-wide estimate (exactly it,
        # when the whole clip is pushed before the first read) at the cost
        # of push-granularity-dependent output (measured in
        # tools/stream_fidelity.py --first-gain buffered).
        if first_gain not in ("window", "buffered"):
            raise ValueError("first_gain must be 'window' or 'buffered'")
        self.first_gain = first_gain
        self.out_gain_ema = out_gain_ema
        self.collect_debug = collect_debug
        self.debug_stft: list[np.ndarray] = []
        self._vec = batch is not None
        B = self.B = batch or 1
        # multi-chip lockstep: shard the stream axis over a 1-D device mesh —
        # pure data parallelism of the per-step programs (params replicated,
        # B/n streams per chip, ZERO cross-chip collectives in steady state).
        # Capacity then scales as n_chips x streams-per-chip with the same
        # single-program serving structure (tools/stream_capacity.py).
        self.mesh = mesh
        if mesh is not None:
            if B % mesh.size != 0:
                raise ValueError(f"batch={B} must divide over the {mesh.size}-"
                                 "device mesh")
            if len(mesh.axis_names) != 1:
                raise ValueError("stream mesh must be 1-D (streams axis only)")
        self._mesh_key = (None if mesh is None else
                          (mesh.axis_names, mesh.devices.shape))
        self._dev_params = None   # lazy: weights placed for the step programs

        # per-stream RNG: stream i draws from seed+i, so a batched run is
        # draw-for-draw the B single-stream runs with seeds seed..seed+B-1
        self._rng = [np.random.default_rng(seed + i) for i in range(B)]
        self._buf = np.zeros((B, 0), np.float32)
        self._buf_start = 0        # global sample index of _buf[:, 0]
        self._n_samples = 0        # total samples pushed per stream
        self._f0 = 0               # next frame index to emit
        # per-stream carried statistics. ``_pending[i]`` marks a stream whose
        # gain (host-estimated from its first window) and c0 (captured on
        # device at its first emitted frame) are still to be frozen — true at
        # construction (unless ``input_gain`` pins the gain) and again after
        # ``reset_stream(i)`` hands the slot to a new stream.
        if input_gain is None:
            self._gain = np.ones(B, np.float32)
        else:
            self._gain = np.broadcast_to(
                np.asarray(input_gain, np.float32), (B,)).copy()
        self._ext_gain = input_gain is not None
        self._pending = np.ones(B, bool)
        # global sample index where each slot's CURRENT occupant's audio
        # begins: 0 at construction, the reset-time push count after
        # reset_stream — first-gain estimates and running accumulators
        # never include the zeroed span before a mid-window occupant's
        # audio actually arrived
        self._audio_from = np.zeros(B, np.int64)
        # running-gain accumulators: Σ|y| and sample count over the slot's
        # current occupant (from where its audio begins), plus the global
        # sample index each slot's sums include up to (per-slot: a pending
        # slot under first_gain="buffered" accumulates ahead of the others)
        self._g_sum = np.zeros(B, np.float64)
        self._g_cnt = np.zeros(B, np.int64)
        self._g_upto = np.zeros(B, np.int64)
        # carried first-emitted-frame mel spectrum at UNIT gain: raw c0 is
        # recomputed from it on device each window at the current gain and
        # mel max (exact through the amin/top_db floors at any gain)
        self._m0 = np.zeros((B, feat.n_mels), np.float32)
        self._mel_max = np.full(B, -np.inf, np.float32)  # top_db running max
        self._tail: np.ndarray | None = None     # [B, (M-1)*hop] preemph overlap
        self._phase_tail: np.ndarray | None = None  # [B, M, n_stft]
        self._inv_state = np.zeros(B, np.float32)   # inverse-preemphasis IIR
        self._out_ema = np.zeros(B, np.float32)
        self._out_gain_prev = np.zeros(B, np.float32)
        self._out_pending = np.ones(B, bool)
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

    def reset_stream(self, i: int) -> None:
        """Hand stream slot ``i`` to a NEW independent stream (serving slot
        reuse): every carried per-stream statistic is cleared, without
        touching the other slots or the shared global frame clock.

        The slot's next step re-estimates its input gain from that window's
        emit-onward samples and re-captures its c0 at its first emitted
        frame — the same freeze-at-first-window semantics a fresh
        StreamingCloner applies at the global start (at global frame 0 the
        emit-onward slice IS the whole first window, so a construction-time
        "reset" is numerically the previous behavior; regression-locked by
        test_streaming_push_block_size_invariance et al.). Frames the new
        occupant emits before its own audio arrives are converted silence.
        """
        self._pending[i] = True
        self._m0[i] = 0.0
        self._mel_max[i] = -np.inf
        self._inv_state[i] = 0.0
        self._out_pending[i] = True
        self._g_sum[i] = 0.0
        self._g_cnt[i] = 0
        # the occupant's audio starts at the next pushed sample: its gain
        # statistics must not include the zeroed span this reset leaves in
        # the slot's current window
        self._audio_from[i] = self._n_samples
        # the input buffer still holds the PREVIOUS occupant's audio, which
        # would otherwise become the new stream's left context (cross-session
        # leakage); the new occupant's context starts as silence
        self._buf[i] = 0.0
        if self._tail is not None:
            self._tail[i] = 0.0          # fade the new stream in from zero
        if self._phase_tail is not None:  # not the previous occupant's phase
            self._phase_tail[i] = np.pi * self._rng[i].random(
                self._phase_tail.shape[1:]).astype(np.float32)

    def _in(self, samples) -> np.ndarray:
        samples = np.asarray(samples, np.float32)
        if self._vec:
            if samples.ndim != 2 or samples.shape[0] != self.B:
                raise ValueError(f"batch={self.B} streams expect [B, n] audio")
            return samples
        return samples.reshape(1, -1)

    def _out(self, parts) -> np.ndarray:
        out = (np.concatenate(parts, axis=1) if parts
               else np.zeros((self.B, 0), np.float32))
        return out if self._vec else out[0]

    def push(self, samples) -> np.ndarray:
        """Feed arbitrary-length audio; returns newly available output."""
        if self._done:
            raise RuntimeError("push() after flush()")
        samples = self._in(samples)
        if samples.shape[1]:
            self._buf = np.concatenate([self._buf, samples], axis=1)
            self._n_samples += samples.shape[1]
        out = []
        while (self._f0 + self.min_input_frames) * self.hop <= self._n_samples:
            out.append(self._step())
        return self._out(out)

    def flush(self) -> np.ndarray:
        """Convert the remaining tail exactly and finish the stream.

        Unlike the steady chunks (which always have real lookahead), the
        flush window ends at the last real frame: the backward GRUs enter
        it at h=0 — precisely the offline forward's global end — and the
        STFT tail is reflect-padded the way the offline front-end pads it.
        """
        if self._done:
            return self._out([])
        self._done = True
        total = self._n_samples // self.hop + 1 if self._n_samples else 0
        if self._f0 >= total:
            return self._out([])
        return self._out([self._flush_step(total)])

    def convert_all(self, wav, block: int = 16000) -> np.ndarray:
        """Convenience: stream complete waveform(s) through push/flush."""
        wav = self._in(wav)
        parts = [self.push(self._raw(wav[:, i:i + block]))
                 for i in range(0, wav.shape[1], block)]
        parts.append(self.flush())
        return (np.concatenate([self._in(p) for p in parts], axis=1)
                if self._vec else np.concatenate(parts))

    def _raw(self, x):
        return x if self._vec else x[0]

    # -------------------------------------------------------------- steps ---

    def _update_gains(self, win_lo: int, upto: int) -> None:
        """Per-step input-gain maintenance (host side, before the device
        call). ``win_lo``/``upto`` are the global sample bounds of this
        step's model window.

        Pending streams freeze their gain from this (their first) window:
        mean |y| over the occupant's samples in [max(win_lo, audio_from),
        upto) — the reference's clip-wide estimate (audio_lib.py:125-126)
        restricted to what has arrived, over the WHOLE window (context +
        emit + lookahead), never including a reset slot's zeroed
        pre-occupant span. With ``first_gain="buffered"`` the estimate
        extends to everything the occupant has pushed by this step
        (trading push-granularity invariance for a closer match to the
        offline estimate). In running mode (the default), non-pending
        streams then refine their gain to the mean |y| over everything the
        occupant has pushed so far (at flush that is the whole clip, so the
        final window runs at EXACTLY the offline gain). A gain change is a
        uniform dB shift of the mel-dB map, so the carried statistics are
        re-expressed exactly (modulo the amin floor, the module docstring's
        approximation class): raw c0 moves by ``delta_dB * Σ dct[0,:]`` and
        the running mel max by ``delta_dB``. An external ``input_gain``
        pins every stream's gain (c0 capture, driven by the same pending
        flags on device, still happens)."""
        if self._ext_gain:
            return
        if self._running:
            for i in range(self.B):
                u = int(self._g_upto[i])
                if upto > u:
                    seg = np.abs(self._buf[i, u - self._buf_start:
                                           upto - self._buf_start])
                    self._g_sum[i] += seg.sum(dtype=np.float64)
                    self._g_cnt[i] += seg.size
                    self._g_upto[i] = upto
        if self._pending.any():
            hi = max(self._n_samples, upto) \
                if self.first_gain == "buffered" else upto
            for i in np.flatnonzero(self._pending):
                lo = max(win_lo, int(self._audio_from[i]), self._buf_start)
                seg = np.abs(self._buf[i, lo - self._buf_start:
                                       hi - self._buf_start])
                m = max(float(seg.mean()) if seg.size else 0.0, _MIN_MEAN)
                self._gain[i] = self.feat.mean_abs_amp_norm / m
                if self._running:
                    # the occupant's accumulation domain starts where its
                    # audio does — overwrite whatever the increment above
                    # put in this slot, and record the span so later
                    # increments never double-count or shrink it
                    self._g_sum[i] = float(seg.sum(dtype=np.float64))
                    self._g_cnt[i] = seg.size
                    self._g_upto[i] = hi
        if self._running:
            upd = (~self._pending) & (self._g_cnt > 0)
            if upd.any():
                mean = np.maximum(
                    self._g_sum / np.maximum(self._g_cnt, 1), _MIN_MEAN)
                g_new = (self.feat.mean_abs_amp_norm / mean).astype(np.float32)
                delta = np.where(
                    upd, 20.0 * np.log10(g_new / self._gain), 0.0
                ).astype(np.float32)
                # a uniform gain change is a uniform dB shift of every
                # UNfloored mel value; the running max is unfloored by
                # construction, so it shifts exactly (c0 needs no host
                # adjustment: it is re-derived on device from the carried
                # unit-gain mel0 at whatever gain this window runs at)
                self._mel_max += delta
                self._gain = np.where(upd, g_new, self._gain)

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

        y = self._buf[:, a * hop - self._buf_start : e * hop - self._buf_start]
        self._update_gains(a * hop, e * hop)

        fwd = self.p._jitted(
            "stream_fwd", (y.shape, v0 - a, v1 - a, f0 - a, self._mesh_key),
            lambda: self._build_fwd(y.shape[1], v0 - a, v1 - a, f0 - a))
        stft_v, mel_max, mel0 = fwd(self._params(),
                                  jnp.asarray(y), jnp.asarray(self._gain),
                                  jnp.asarray(self._m0),
                                  jnp.asarray(self._pending),
                                  jnp.asarray(self._mel_max))
        # np.array (copy): jax buffers are read-only and reset_stream
        # writes per-slot
        self._m0 = np.array(mel0)
        self._pending[:] = False
        self._mel_max = np.array(mel_max)
        if self.collect_debug:
            sv = np.asarray(stft_v)[:, f0 - v0 : f1 - v0]
            self.debug_stft.append(sv if self._vec else sv[0])

        # vocode [v0, v1) with carried-phase init
        W_v = v1 - v0
        phase = np.pi * np.stack(
            [g.random((W_v, self.feat.n_stft)) for g in self._rng]
        ).astype(np.float32)
        if self._phase_tail is not None:
            phase[:, :M] = self._phase_tail
        gl = self.p._jitted("stream_gl", (self.B, W_v, f1 - v0, True, self._mesh_key),
                            lambda: self._build_gl(f1 - v0))
        wav_pre, phase_tail = gl(stft_v, jnp.asarray(phase))
        wav_pre = np.array(wav_pre)          # [B, (W_v-1)*hop], preemph domain
        self._phase_tail = np.array(phase_tail)

        t_lo = (f1 - v0) * hop
        emit = self._emit(wav_pre, (f0 - v0) * hop, C * hop,
                          wav_pre[:, t_lo : t_lo + (M - 1) * hop].copy())

        # advance; drop audio no future window (incl. the flush window's
        # reflect-padded tail framing) can reach
        self._f0 = f1
        keep_from = max(0, (self._f0 - (self.Lc + self.C + self.Rc + 2 * self.EB))
                        * hop - self.feat.n_fft_)
        if keep_from > self._buf_start:
            self._buf = self._buf[:, keep_from - self._buf_start:]
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

        # offline-identical padded sample stream for frames [a, total): the
        # offline front-end pre-emphasizes the WHOLE clip and then
        # reflect-pads the pre-emphasized samples (ops/features.mfcc_input:
        # preemphasis before the center=True STFT), so do the same here —
        # pre-emphasize on host across the arrived stream (exact: the
        # buffer retains an n_fft margin, so every needed x[i] has its
        # y[i-1]), THEN reflect-index with np.pad mode='reflect' semantics
        # (period-2(L-1) folding handles pads longer than the clip too).
        # Gain commutes with both (linear), so it still applies on device.
        c = feat.pre_emphasis
        x = self._buf.copy()
        if c != 0.0:
            x[:, 1:] -= c * self._buf[:, :-1]
            # x[:, 0] is only exact at the true clip start (x[0] = y[0]);
            # for a trimmed buffer the frames [a, total) never reach back
            # to buf_start (the keep_from margin guarantees it)
            assert self._buf_start == 0 or a * hop - half > self._buf_start, \
                (a, hop, half, self._buf_start)
        idx = np.arange(a * hop - half, (total - 1) * hop - half + feat.n_fft_)
        if L > 1:
            per = 2 * (L - 1)
            m = np.mod(idx, per)
            idx = np.minimum(m, per - m)
        else:
            idx = np.zeros_like(idx)
        y_ext = x[:, idx - self._buf_start]

        self._update_gains(self._buf_start, self._n_samples)

        fwd = self.p._jitted("stream_fwd_end", (y_ext.shape, W_end, f0 - a,
                                                "preemph", self._mesh_key),
                             lambda: self._build_fwd(y_ext.shape[1], 0, W_end,
                                                     f0 - a, centered=False,
                                                     pre_emphasized=True))
        stft_full, mel_max, mel0 = fwd(self._params(),
                                     jnp.asarray(y_ext), jnp.asarray(self._gain),
                                     jnp.asarray(self._m0),
                                     jnp.asarray(self._pending),
                                     jnp.asarray(self._mel_max))
        # np.array (copy): jax buffers are read-only and reset_stream
        # writes per-slot
        self._m0 = np.array(mel0)
        self._pending[:] = False
        self._mel_max = np.array(mel_max)
        stft_full = np.asarray(stft_full)
        if self.collect_debug:
            sv = stft_full[:, f0 - a : total - a]
            self.debug_stft.append(sv if self._vec else sv[0])

        # fixed-size end vocode region [total - W_v, total)
        W_v = min(self.C + self.Rc + self.EB + M, total)
        v0 = total - W_v
        stft_v = stft_full[:, v0 - a : total - a]
        phase = np.pi * np.stack(
            [g.random((W_v, feat.n_stft)) for g in self._rng]).astype(np.float32)
        if self._phase_tail is not None and f0 - M >= v0:
            phase[:, f0 - M - v0 : f0 - v0] = self._phase_tail
        gl = self.p._jitted("stream_gl_end", (self.B, W_v, M, False, self._mesh_key),
                            lambda: self._build_gl(M, tail=False))
        wav_pre = np.array(gl(jnp.asarray(stft_v), jnp.asarray(phase)))

        emit = self._emit(wav_pre, (f0 - v0) * hop, (total - f0) * hop, None)
        self._f0 = total
        return emit

    def _emit(self, wav_pre, s_lo: int, n_emit: int, tail):
        """Shared host tail of a step: crossfade the leading margin with the
        previous chunk, cut the emit region (zero-extending past the last
        synthesizable sample), carry the inverse-pre-emphasis IIR state, and
        apply the EMA output gain with a per-chunk linear ramp. All state is
        per-stream ([B, ...])."""
        if self._tail is not None:
            ov = self._tail.shape[1]             # (M-1)*hop
            # raised-cosine fade from the previous chunk into this one (a
            # flush with fewer remaining samples than the margin fades over
            # what exists)
            w = 0.5 * (1.0 + np.cos(np.pi * np.arange(ov) / ov)).astype(np.float32)
            n = min(ov, wav_pre.shape[1] - s_lo)
            wav_pre[:, s_lo:s_lo + n] = (
                w[None, :n] * self._tail[:, :n]
                + (1.0 - w[None, :n]) * wav_pre[:, s_lo:s_lo + n])
        self._tail = tail
        emit = np.zeros((self.B, n_emit), np.float32)
        seg = wav_pre[:, s_lo:s_lo + n_emit]
        emit[:, :seg.shape[1]] = seg

        # exact streaming inverse pre-emphasis: the IIR y[n] = x[n] + c*y[n-1]
        # continues across chunks by folding c*y_prev into the first sample
        c = self.feat.pre_emphasis
        if c != 0.0 and n_emit:
            from scipy import signal

            emit[:, 0] += c * self._inv_state
            emit = signal.lfilter([1.0], [1.0, -c], emit, axis=1).astype(np.float32)
            self._inv_state = emit[:, -1].copy()

        # EMA output gain with a per-chunk linear ramp (no per-chunk AGC);
        # an out-pending stream (its first chunk, or a reset slot's first
        # chunk under its new occupant) seeds its EMA from this chunk
        if n_emit:
            m_abs = np.mean(np.abs(emit), axis=1)
            self._out_ema = np.where(
                self._out_pending, m_abs,
                self.out_gain_ema * self._out_ema
                + (1.0 - self.out_gain_ema) * m_abs)
            g_new = (self.p.mean_abs_amp_norm
                     / np.maximum(self._out_ema, _TINY)).astype(np.float32)
            g_prev = np.where(self._out_pending, g_new, self._out_gain_prev)
            self._out_pending[:] = False
            t = np.linspace(0.0, 1.0, n_emit, dtype=np.float32)
            emit *= g_prev[:, None] + (g_new - g_prev)[:, None] * t[None, :]
            self._out_gain_prev = g_new
        return emit

    # ----------------------------------------------------- device builders ---

    def _params(self):
        """The pipeline weights placed for the step programs — single-device
        via the pipeline's cache, or replicated over the stream mesh. Passed
        to the compiled programs as runtime arguments (not closed-over
        constants) so the per-chunk executables stay small and persistent-
        cache-stable — see ClonePipeline.device_params."""
        if self._dev_params is None:
            import jax

            p = self.p
            if self.mesh is None:
                self._dev_params = p.device_params()
            else:
                from jax.sharding import NamedSharding, PartitionSpec

                self._dev_params = jax.device_put(
                    (p.enc_params, p.enc_state, p.dec_params, p.dec_state),
                    NamedSharding(self.mesh, PartitionSpec()))
        return self._dev_params

    def _jit_sharded(self, fn, in_ranks, out_ranks):
        """jit with the stream (batch) axis sharded over ``self.mesh`` —
        every input/output is stream-major, so rank alone determines its
        NamedSharding (a rank of ``None`` marks a replicated pytree, e.g.
        the weights). ``out_ranks`` may be a single int for a single-array
        output. With no mesh this is plain jit (single chip)."""
        import jax

        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec

        ax = self.mesh.axis_names[0]

        def sh(r):
            spec = (PartitionSpec() if r is None
                    else PartitionSpec(ax, *([None] * (r - 1))))
            return NamedSharding(self.mesh, spec)

        out = sh(out_ranks) if isinstance(out_ranks, int) \
            else tuple(sh(r) for r in out_ranks)
        return jax.jit(fn, in_shardings=tuple(sh(r) for r in in_ranks),
                       out_shardings=out)

    def _build_fwd(self, n_samples: int, v_lo: int, v_hi: int, c0_pos: int,
                   centered: bool = True, pre_emphasized: bool = False):
        """(features + encoder + decoder) for one window of B streams ->
        stft_pred slice [B, v_hi-v_lo, n_stft].

        Mirrors ops/features.mfcc_input (audio_lib.py:89-244) with the three
        whole-clip statistics replaced by carried per-stream values: the
        input gain, the first emitted frame's UNIT-GAIN mel spectrum (from
        which the raw-c0 offset is recomputed every window at the current
        gain/mel-max — exact through the amin and top_db floors, which a
        scalar-c0 dB-shift adjustment is not: floored bins do not shift
        with gain, and measurement showed a silence-heavy frame 0 makes
        the scalar form WORSE than no update at all), and the running mel
        max for the top_db clip. ``pending[i]`` marks a stream at its first
        step (fresh or just reset): it captures its mel0 from THIS window's
        frame ``c0_pos`` (its first emitted frame — frame 0 at the global
        start, exactly audio_lib.py:220-221) instead of using the carried
        value; the captured value is returned for carrying. Features are
        vmapped per stream; the model forward runs natively batched over
        the stream axis — one device program for all B streams. The flush
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

        def features(y, gain, mel0_in, pending, mel_max_in):
            y = y * gain
            if not pre_emphasized:  # the flush ships host-pre-emphasized audio
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
            # the mel power map scales as gain^2, so the first emitted
            # frame's mel spectrum is carried at unit gain and its raw c0
            # is re-derived here at THIS window's gain and mel max — the
            # same floors, in the same places, as the window it came from
            mel0 = jnp.where(pending, M_spec[c0_pos] / (gain * gain), mel0_in)
            raw0 = 10.0 * jnp.log10(jnp.maximum(
                1e-10, jnp.square(mel0 * (gain * gain))))
            c0 = jnp.maximum(raw0, mel_max - 80.0) @ dct[0]
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
            return MFCC[:n_frames], mel_max, mel0

        def fn(params, y, gain, mel0_in, pending, mel_max_in):
            mfcc, mel_max, mel0 = jax.vmap(features)(y, gain, mel0_in,
                                                     pending, mel_max_in)
            _, stft_pred, _ = self.p.forward_windows(mfcc, params)
            return stft_pred[:, v_lo:v_hi], mel_max, mel0
        return self._jit_sharded(fn, (None, 2, 1, 2, 1, 1), (3, 1, 2))

    def _build_gl(self, tail_lo: int, tail: bool = True):
        """Griffin-Lim over one vocode region of B streams, seeded phase,
        returning the pre-emphasized-domain waveforms (plus each stream's
        trailing-margin phase for the next chunk unless ``tail=False`` —
        the flush has no successor). Denorm matches from_power_to_wav
        (audio_lib.py:278-308) minus the inverse pre-emphasis + amp norm,
        which stream host-side. One fori_loop serves all streams: the
        runtime's fixed per-iteration cost is paid per step, not per
        stream."""
        import jax
        import jax.numpy as jnp

        feat = self.feat
        p = self.p

        def one(stft_v, phase0):
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
                                 momentum=p.gl_momentum, unroll=p.gl_unroll,
                                 dft=p.gl_dft, return_stft=True)
            if not tail:
                return wav
            return wav, jnp.angle(S[tail_lo - self.M : tail_lo])
        return self._jit_sharded(jax.vmap(one), (3, 3), (2, 3) if tail else 2)
