"""Live multi-session streaming conversion server.

The reference has no serving story at all (one process per file,
test.py:416-502) and no incremental path (its inference needs the complete
recording). This server multiplexes up to ``--slots`` concurrent LIVE
conversion sessions onto one chip: all sessions advance in lockstep through
ONE device program per chunk step (`pipeline/stream.StreamingCloner`
``batch=B``), which is where the measured capacity comes from — the
vocoder's fixed per-iteration cost is paid once per step, not per stream
(81 realtime streams/chip at B=16, docs/DESIGN.md "Streaming conversion";
tools/stream_capacity.py).

JSONL line protocol on stdin -> stdout (audio as base64 int16 mono PCM at
the feature sample rate):

    {"open": "alice"}                        -> {"opened": "alice", "slot": 0,
                                                 "latency_s": 3.02}
    {"sid": "alice", "pcm16": "<base64>"}    buffered; converted audio comes
                                             back as {"sid": "alice",
                                             "pcm16": ..., "t_s": ...} records
    {"sid": "alice", "input": "a.wav"}       convenience: feed a whole file
    {"close": "alice"}                       drain; a final trimmed chunk and
                                             {"closed": "alice", ...} follow
    {"tick": true}                           force one lockstep step (pads
                                             every shortfall with silence)

Stepping: a chunk step fires automatically once EVERY open (non-draining)
session has a full chunk buffered, and keeps firing to drain closing
sessions. A live frontend paces sessions at wall-clock rate and sends
{"tick": true} each chunk period instead — any session that underran is
padded with silence for the missing span (live semantics: an underrun IS
silence; the session's time base never stretches).

Slot lifecycle: a closed session's slot is reset (`reset_stream`) and
reusable immediately — the new occupant re-freezes its own input gain/c0/
phase/AGC state; nothing leaks across occupants (test_serve_stream.py
asserts byte-identical neighbor output under mid-run slot churn).

Conversion runs inline in the ingest thread: the chip is a serial resource
and the protocol is request->records, so a worker thread would only add
reordering hazards here (unlike apps/serve.py, whose requests are whole
files with per-request wall clocks).
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import time

import numpy as np


class _Session:
    __slots__ = ("sid", "slot", "start", "buf", "draining", "last_real",
                 "emitted")

    def __init__(self, sid: str, slot: int, start: int):
        self.sid = sid
        self.slot = slot
        self.start = start          # global sample index of its first feed
        self.buf: list[np.ndarray] = []
        self.draining = False
        self.last_real = start      # global index just past its last real sample
        self.emitted = 0            # samples already sent back to the client

    @property
    def buffered(self) -> int:
        return sum(a.size for a in self.buf)

    def take(self, n: int) -> np.ndarray:
        out, got = [], 0
        while self.buf and got < n:
            a = self.buf[0]
            if a.size <= n - got:
                out.append(self.buf.pop(0))
                got += a.size
            else:
                out.append(a[: n - got])
                self.buf[0] = a[n - got :]
                got = n
        return np.concatenate(out) if out else np.zeros(0, np.float32)


class StreamServer:
    """Slot-multiplexed lockstep streaming over one `StreamingCloner`.

    Pure request->records core (no IO): the CLI main() wires it to stdin/
    stdout; tests drive it in-process. All sessions share one global sample
    clock — the cloner's lockstep feed position — and each session's output
    is its slot's emit sliced to [session start, session end)."""

    def __init__(self, pipeline, *, slots: int = 4, chunk_frames: int = 400,
                 context_frames: int = 400, lookahead_frames: int = 200,
                 margin_frames: int = 16, seed: int = 0,
                 out_scale: float = 4.0, mesh=None):
        from ..pipeline.stream import StreamingCloner

        self.s = StreamingCloner(
            pipeline, batch=slots, chunk_frames=chunk_frames,
            context_frames=context_frames, lookahead_frames=lookahead_frames,
            margin_frames=margin_frames, seed=seed, mesh=mesh)
        self.slots = slots
        self.block = chunk_frames * self.s.hop
        self.sr = pipeline.feat_cfg.sample_rate
        self.out_scale = out_scale
        self.free = list(range(slots))
        self.sessions: dict[str, _Session] = {}
        self.fed = 0       # global samples fed per slot (the lockstep clock)
        self.emitted = 0   # global samples emitted per slot

    # ---------------------------------------------------------- requests ---

    def open(self, sid: str) -> dict:
        if sid in self.sessions:
            return {"sid": sid, "error": "session already open"}
        if not self.free:
            return {"sid": sid, "error": f"no free slot (slots={self.slots})"}
        slot = self.free.pop(0)
        self.s.reset_stream(slot)
        self.sessions[sid] = _Session(sid, slot, self.fed)
        return {"opened": sid, "slot": slot,
                "latency_s": round(self.s.latency_seconds, 3)}

    def feed(self, sid: str, samples: np.ndarray) -> dict | None:
        sess = self.sessions.get(sid)
        if sess is None:
            return {"sid": sid, "error": "unknown session"}
        if sess.draining:
            return {"sid": sid, "error": "session is closing"}
        if samples.size:
            sess.buf.append(np.asarray(samples, np.float32).reshape(-1))
        return None

    def close(self, sid: str) -> dict | None:
        sess = self.sessions.get(sid)
        if sess is None:
            return {"sid": sid, "error": "unknown session"}
        sess.draining = True
        return None

    # ---------------------------------------------------------- stepping ---

    def ready(self) -> bool:
        """True when a step should fire without waiting for more input:
        every open session can fill its chunk, or a closing session still
        has output in flight."""
        if not self.sessions:
            return False
        active = [s for s in self.sessions.values() if not s.draining]
        if active:
            return all(s.buffered >= self.block for s in active)
        return True  # only draining sessions: tick them dry

    def tick(self) -> list[dict]:
        """One lockstep chunk step: feed every slot ``block`` samples (its
        session's buffer, silence-padded on shortfall; pure silence for free
        slots), push, and slice each session's share of the emit."""
        x = np.zeros((self.slots, self.block), np.float32)
        for sess in self.sessions.values():
            got = sess.take(self.block)
            x[sess.slot, : got.size] = got
            if got.size:
                sess.last_real = self.fed + got.size
        out = self.s.push(x)
        self.fed += self.block

        records: list[dict] = []
        if out.shape[1]:
            lo = self.emitted
            self.emitted += out.shape[1]
            for sess in list(self.sessions.values()):
                records.extend(self._emit_for(sess, out, lo))
        return records

    def _emit_for(self, sess: _Session, out: np.ndarray, lo: int) -> list[dict]:
        """Slice session audio out of one global emit [lo, lo+n): the
        session owns [start, last_real) — for a draining session the final
        chunk is trimmed to its last real sample and the slot is freed."""
        hi = lo + out.shape[1]
        a = max(lo, sess.start)
        b = min(hi, sess.last_real) if sess.draining and not sess.buffered else hi
        recs: list[dict] = []
        if b > a:
            seg = out[sess.slot, a - lo : b - lo]
            pcm = np.clip(seg * self.out_scale, -1.0, 1.0)
            recs.append({
                "sid": sess.sid,
                "t_s": round((a - sess.start) / self.sr, 3),
                "pcm16": base64.b64encode(
                    (pcm * 32767.0).astype("<i2").tobytes()).decode("ascii"),
            })
            sess.emitted += b - a
        if sess.draining and not sess.buffered and hi >= sess.last_real:
            recs.append({"closed": sess.sid,
                         "seconds": round(sess.emitted / self.sr, 3)})
            del self.sessions[sess.sid]
            self.s.reset_stream(sess.slot)
            self.free.append(sess.slot)
        return recs

    def drain(self) -> list[dict]:
        """Close every session and tick until all output is flushed."""
        records = []
        for sid in list(self.sessions):
            self.close(sid)
        while self.sessions:
            records.extend(self.tick())
        return records


def _decode_pcm16(b64: str) -> np.ndarray:
    raw = np.frombuffer(base64.b64decode(b64), dtype="<i2")
    return (raw.astype(np.float32) / 32768.0).astype(np.float32)


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--enc-ckpt", required=True)
    ap.add_argument("--dec-ckpt", required=True)
    ap.add_argument("--enc-cfg")
    ap.add_argument("--dec-cfg")
    ap.add_argument("--ds-cfg")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--chunk-frames", type=int, default=400)
    ap.add_argument("--context-frames", type=int, default=400)
    ap.add_argument("--lookahead-frames", type=int, default=200)
    ap.add_argument("--margin-frames", type=int, default=16)
    ap.add_argument("--n-iter", type=int, default=25)
    ap.add_argument("--gl-momentum", type=float, default=0.99,
                    help="fast-GL by default (measured better spectral error "
                         "than the reference's plain 200 at a fraction of the "
                         "per-chunk cost); --n-iter 200 --gl-momentum 0 "
                         "restores the reference algorithm")
    ap.add_argument("--realse", type=float, default=1.2)
    ap.add_argument("--gl-unroll", type=int, default=6,
                    help="GL loop-body unroll (identical math; measured "
                         "~7%% per-chunk win at streaming shapes — "
                         "tools/gl_unroll_probe.py)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--out-scale", type=float, default=4.0,
                    help="fixed gain from the pipeline's output level "
                         "convention (EMA mean |y| = mean_abs_amp_norm) to "
                         "int16 full scale — fixed, not per-chunk AGC, so it "
                         "never pumps; raise it if the capture chain expects "
                         "hotter output")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the slot axis over this many local devices "
                         "(one 'streams' mesh axis; slots %% mesh == 0): "
                         "multi-chip lockstep serving — slots/mesh streams "
                         "per chip, params replicated, no steady-state "
                         "collectives. 0 = single device")
    ap.add_argument("--warm", action="store_true",
                    help="compile the steady-state step before reading stdin")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..models import decoder as dec_m
    from ..models import encoder as enc_m
    from ..pipeline.clone import ClonePipeline
    from ..runtime.config import feature_config_from_cfg_d, load_cfg_d
    from .convert import load_decoder_weights
    from .train_decoder import load_encoder_weights
    from .train_encoder import DEFAULT_DS_CFG

    ds_cfg_d = load_cfg_d(args.ds_cfg) if args.ds_cfg else dict(DEFAULT_DS_CFG)
    feat_cfg = feature_config_from_cfg_d(ds_cfg_d)
    enc_cfg = (enc_m.config_from_cfg_d(load_cfg_d(args.enc_cfg))
               if args.enc_cfg else enc_m.EncoderConfig())
    dec_cfg = (dec_m.config_from_cfg_d(load_cfg_d(args.dec_cfg))
               if args.dec_cfg else dec_m.DecoderConfig())
    enc_params, enc_state = load_encoder_weights(args.enc_ckpt, enc_cfg)
    dec_params, dec_state = load_decoder_weights(args.dec_ckpt, dec_cfg)
    pipe = ClonePipeline(enc_cfg=enc_cfg, dec_cfg=dec_cfg, feat_cfg=feat_cfg,
                         enc_params=enc_params, enc_state=enc_state,
                         dec_params=dec_params, dec_state=dec_state,
                         n_iter=args.n_iter, realse=args.realse,
                         gl_momentum=args.gl_momentum,
                         gl_unroll=args.gl_unroll,
                         compute_dtype=jnp.bfloat16 if args.bf16 else None)
    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[: args.mesh]), ("streams",))
    srv = StreamServer(pipe, slots=args.slots, chunk_frames=args.chunk_frames,
                       context_frames=args.context_frames,
                       lookahead_frames=args.lookahead_frames,
                       margin_frames=args.margin_frames,
                       out_scale=args.out_scale, mesh=mesh)

    def emit(rec: dict):
        rec.setdefault("ts", round(time.time(), 3))
        sys.stdout.write(json.dumps(rec) + "\n")
        sys.stdout.flush()

    if args.warm:
        # run one synthetic session through open -> steady chunk -> close so
        # the per-shape programs compile before the first live session
        t0 = time.perf_counter()
        srv.open("__warm__")
        srv.feed("__warm__", np.full(srv.block * 2, 1e-4, np.float32))
        while srv.ready():
            srv.tick()
        srv.close("__warm__")
        srv.drain()
        emit({"warmed": True, "compile_s": round(time.perf_counter() - t0, 1)})

    from ..data.audio_io import load_audio

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except Exception as e:
            emit({"request": line[:200], "error": f"bad request: {e}"})
            continue
        rec = None
        try:
            if "open" in req:
                rec = srv.open(str(req["open"]))
            elif "close" in req:
                rec = srv.close(str(req["close"]))
            elif "tick" in req:
                for r in srv.tick():
                    emit(r)
            elif "sid" in req and "pcm16" in req:
                rec = srv.feed(str(req["sid"]), _decode_pcm16(req["pcm16"]))
            elif "sid" in req and "input" in req:
                rec = srv.feed(str(req["sid"]),
                               load_audio(req["input"], srv.sr))
            else:
                rec = {"request": line[:200], "error": "unrecognized request"}
        except Exception as e:  # one bad request must not kill the server
            rec = {"request": line[:200], "error": f"{type(e).__name__}: {e}"}
        if rec is not None:
            emit(rec)
        while srv.ready():
            for r in srv.tick():
                emit(r)
    for r in srv.drain():  # EOF: flush every live session's tail
        emit(r)


if __name__ == "__main__":
    main()
