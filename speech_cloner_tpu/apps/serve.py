"""Persistent conversion server: amortize compilation across requests.

The reference converts one file per process (`python test.py`, test.py:416-502)
and pays its whole setup on every run; on a TPU runtime the XLA compile is
the dominant per-process cost (minutes) while conversion itself runs at
RTF ~0.006. This app keeps one warm process per chip: models load once,
each window-count bucket compiles once (pipeline/clone._jitted_stages), and
every subsequent request in that bucket converts at full device speed —
~195× realtime per chip, scale horizontally with one process per chip.

Two request modes:

  stdin line protocol (one JSON result line per request on stdout):
    echo '{"input": "a.wav"}' | python -m speech_cloner_tpu.apps.serve \
        --enc-ckpt ... --dec-ckpt ... [--warm 10,60]
    Request lines are either a bare path or {"input": path, "output": path}.

  directory watcher:
    python -m speech_cloner_tpu.apps.serve --watch ./inbox --output-dir ./out \
        --enc-ckpt ... --dec-ckpt ...
    Converts every new audio file appearing under --watch (results named
    <stem>_pred.wav; already-converted files are skipped).

--warm S1,S2,... pre-compiles the buckets for clips of those durations at
startup so the first real request is already fast.

Backpressure/robustness (one chip is a serial resource, so the server must
not let a slow request block ingest or queue unboundedly):
  - conversions run on a single worker thread fed by a BOUNDED queue
    (--queue-depth); in stdin mode a full queue BLOCKS the reader — stdin's
    own flow control backpressures the sender and every piped request
    completes (`cat requests | serve` is lossless); the watcher never
    blocks: a full queue just means the file is retried on the next poll;
  - --timeout S emits an {"error": "timeout..."} record if a conversion
    exceeds S seconds (the device call itself cannot be cancelled, so the
    worker finishes it and reports a late record with "late": true — but the
    ingest loop and queue stay live throughout);
  - --batch-max N: when a burst queues up, the worker drains the queue,
    groups by window bucket, and converts up to N same-bucket requests in
    ONE device program (model forward over all clips' windows at once,
    vmapped Griffin-Lim, per-clip peak norm) — under load, throughput rises
    while the chip stays serial. Gated on backlog (--batch-backlog): at
    trickle load every request still converts alone at the unbatched
    latency; batching engages only when the queue shows the server falling
    behind (unconditional batching measurably traded 2.7x p50 latency for
    +4% throughput — docs/DESIGN.md serving section);
  - a malformed stdin line (bad JSON / missing "input") produces an error
    record, never a crash; undecodable audio files are likewise reported
    and skipped (watch mode marks them done so they are not retried forever).
"""

from __future__ import annotations

import argparse
import json
import os
import queue as queue_mod
import sys
import threading
import time


def _result(pipe, feat_cfg, in_path: str, out_path: str, verify_ckpt=None,
            target_spk=None, seed: int = 0) -> dict:
    """Convert one file; return a JSON-friendly result record."""
    import numpy as np

    from ..data.audio_io import load_audio, write_riff_wav

    sr = feat_cfg.sample_rate
    t_in = time.perf_counter()
    wav = load_audio(in_path, sr)
    dur = len(wav) / sr
    t0 = time.perf_counter()
    if verify_ckpt:
        wav_pred, _, _, _ = pipe.convert(wav, seed=seed)
    else:
        # serving fast path: only int16 PCM crosses the device boundary
        wav_pred = pipe.convert_pcm16(wav, seed=seed)
    wall = time.perf_counter() - t0
    write_riff_wav(out_path, wav_pred, sr, norm=True)
    rec = {"input": in_path, "output": out_path,
           "duration_s": round(dur, 3), "wall_s": round(wall, 3),
           # host-side cost around the device call (audio decode + RIFF
           # write) — the serving wall-clock gap serve_bench surfaced
           "host_s": round(time.perf_counter() - t_in - wall, 3),
           "rtf": round(wall / max(dur, 1e-9), 5)}
    if verify_ckpt:
        from ..pipeline.verify import verify_conversion

        rec["verification"] = verify_conversion(
            np.asarray(wav, np.float32), wav_pred, verify_ckpt, feat_cfg,
            target_spk_id=target_spk)
    return rec


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--enc-ckpt", required=True)
    ap.add_argument("--dec-ckpt", required=True)
    ap.add_argument("--enc-cfg")
    ap.add_argument("--dec-cfg")
    ap.add_argument("--ds-cfg")
    ap.add_argument("--output-dir", default="./served")
    ap.add_argument("--n-iter", type=int, default=200)
    ap.add_argument("--realse", type=float, default=1.2)
    ap.add_argument("--gl-momentum", type=float, default=0.0)
    ap.add_argument("--gl-unroll", type=int, default=1,
                    help="GL loop-body unroll (identical math; whole-clip GL "
                         "is compute-bound — tools/gl_unroll_probe.py)")
    ap.add_argument("--gl-dft", choices=("fft", "matmul"), default="matmul",
                    help="GL transform kernel: 'matmul' runs the DFTs as MXU "
                         "matmuls against precomputed cos/sin bases — "
                         "measured 1.7x faster end to end on v5e, exact to "
                         "~1e-5 (docs/ROUND5.md); 'fft' restores the FFT "
                         "custom call")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 model compute (f32 vocoder/softmax)")
    ap.add_argument("--warm", default="",
                    help="comma-separated clip durations (s) to pre-compile")
    ap.add_argument("--watch", help="directory to watch instead of stdin")
    ap.add_argument("--poll", type=float, default=1.0, help="watch poll seconds")
    ap.add_argument("--max-requests", type=int, default=0,
                    help="exit after N requests (0 = run forever; for tests)")
    ap.add_argument("--queue-depth", type=int, default=8,
                    help="max conversions waiting behind the in-flight one")
    ap.add_argument("--batch-max", type=int, default=1,
                    help="opportunistically convert up to N queued requests "
                         "of the same window bucket in ONE device program "
                         "(vmapped Griffin-Lim; power-of-two chunks bound "
                         "the compiled shape set). 1 = off. Ignored with "
                         "--verify-ckpt.")
    ap.add_argument("--batch-backlog", type=int, default=2,
                    help="batch only when >= N further requests are already "
                         "queued behind the one being dequeued — at trickle "
                         "load every request converts alone (unbatched p50 "
                         "latency), batching engages only when the server "
                         "is falling behind (measured: unconditional "
                         "batching cost 2.7x p50 latency for +4% throughput "
                         "at a 50-request burst). 0 = always batch "
                         "(round-4 behavior).")
    ap.add_argument("--timeout", type=float, default=0.0,
                    help="per-request seconds before an error record is "
                         "emitted (0 = no timeout)")
    ap.add_argument("--verify-ckpt")
    ap.add_argument("--target-spk")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

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
                         gl_unroll=args.gl_unroll, gl_dft=args.gl_dft,
                         compute_dtype=jnp.bfloat16 if args.bf16 else None)
    os.makedirs(args.output_dir, exist_ok=True)

    # every record goes through one locked single-write emitter: the stdin
    # reader, the worker and a watchdog Timer can all report concurrently,
    # and CPython print() writes payload and newline separately — interleaved
    # records would corrupt the JSONL stream
    emit_lock = threading.Lock()

    def emit(rec: dict):
        # "ts" stamps every record so a client can compute steady-state
        # windows (e.g. serve_bench: last-result ts minus last-warm ts)
        # without folding server boot / compile time into throughput
        rec.setdefault("ts", round(time.time(), 3))
        with emit_lock:
            sys.stdout.write(json.dumps(rec) + "\n")
            sys.stdout.flush()

    sr = feat_cfg.sample_rate
    # clips pad to window-bucket multiples (n_timesteps*hop samples = 2.0 s
    # at production geometry), and each bucket is its own pair of compiled
    # programs. Warm the bucket containing the requested duration AND the
    # next one: a nominal "60 s" clip is usually a few ms past 60.0 and
    # lands one bucket up — without this, the first real request paid the
    # runtime's erratic first-execution finalize (73.8 s measured) that
    # --warm exists to absorb at startup.
    bucket = enc_cfg.n_timesteps * feat_cfg.hop_length
    warmed_lens = set()
    for dur_s in (float(x) for x in args.warm.split(",") if x):
        n = int(dur_s * sr)
        n_padded = max(((n + bucket - 1) // bucket) * bucket, bucket)
        for n_warm in (n_padded, n_padded + bucket):
            if n_warm in warmed_lens:
                continue
            warmed_lens.add(n_warm)
            t0 = time.perf_counter()
            warm_wav = np.zeros(n_warm, np.float32) + 1e-4
            if args.verify_ckpt:
                pipe.convert(warm_wav)
            else:
                pipe.convert_pcm16(warm_wav)
            emit({"warmed_s": round(n_warm / sr, 3),
                  "compile_s": round(time.perf_counter() - t0, 1)})
            if args.batch_max > 1 and not args.verify_ckpt:
                # pre-compile the power-of-two batch variants of this bucket
                b = 2
                while b <= args.batch_max:
                    t0 = time.perf_counter()
                    pipe.convert_batch_pcm16([warm_wav] * b)
                    emit({"warmed_s": round(n_warm / sr, 3), "batch": b,
                          "compile_s": round(time.perf_counter() - t0, 1)})
                    b *= 2

    def out_path_for(in_path: str, explicit: str | None) -> str:
        if explicit:
            return explicit
        stem = os.path.splitext(os.path.basename(in_path))[0]
        return os.path.join(args.output_dir, f"{stem}_pred.wav")

    def convert_one(in_path: str, explicit_out: str | None = None) -> dict:
        try:
            return _result(pipe, feat_cfg, in_path, out_path_for(in_path, explicit_out),
                           verify_ckpt=args.verify_ckpt, target_spk=args.target_spk)
        except Exception as e:  # a bad request must not kill the server
            return {"input": in_path, "error": f"{type(e).__name__}: {e}"}

    def convert_chunk(chunk):
        """Convert 1..batch_max same-bucket loaded requests in one device
        program; emit one record per request (batched requests share the
        chunk's wall clock — their RTF reflects the amortized cost)."""
        import numpy as np

        from ..data.audio_io import write_riff_wav

        t0 = time.perf_counter()
        if len(chunk) == 1:
            pcm_v = [pipe.convert_pcm16(chunk[0][3])]
        else:
            pcm_v = pipe.convert_batch_pcm16([c[3] for c in chunk])
        wall = time.perf_counter() - t0
        for (in_path, explicit_out, _finish, wav), pcm in zip(chunk, pcm_v):
            out_path = out_path_for(in_path, explicit_out)
            write_riff_wav(out_path, pcm, sr, norm=True)
            dur = len(wav) / sr
            emit({"input": in_path, "output": out_path,
                  "duration_s": round(dur, 3), "wall_s": round(wall, 3),
                  "batch": len(chunk),
                  "rtf": round(wall / max(dur, 1e-9), 5)})

    def process_batched(items):
        """Load every drained request, group by window bucket, convert each
        group in power-of-two chunks (bounds the compiled batch shapes to
        log2(batch_max) variants per bucket)."""
        from ..data.audio_io import load_audio

        spw = pipe.enc_cfg.n_timesteps * pipe.feat_cfg.hop_length
        buckets: dict[int, list] = {}
        for in_path, explicit_out, finish in items:
            try:
                wav = load_audio(in_path, sr)
            except Exception as e:
                emit({"input": in_path, "error": f"{type(e).__name__}: {e}"})
                finish()
                continue
            b = max((len(wav) + spw - 1) // spw, 1)
            buckets.setdefault(b, []).append((in_path, explicit_out, finish, wav))
        for group in buckets.values():
            while group:
                n = 1
                while n * 2 <= min(len(group), args.batch_max):
                    n *= 2
                chunk, group = group[:n], group[n:]
                try:
                    convert_chunk(chunk)
                except Exception as e:
                    for (in_path, _, _, _) in chunk:
                        emit({"input": in_path,
                              "error": f"{type(e).__name__}: {e}"})
                finally:
                    for (_, _, finish, _) in chunk:
                        finish()

    # one conversion at a time (the chip is serial); a bounded queue in
    # front keeps ingest responsive and memory flat under a request burst
    work: queue_mod.Queue = queue_mod.Queue(maxsize=max(args.queue_depth, 1))
    done = threading.Event()
    batching = args.batch_max > 1 and not args.verify_ckpt

    def worker():
        while not done.is_set():
            try:
                first = work.get(timeout=0.2)
            except queue_mod.Empty:
                continue
            items = [first]
            if batching and work.qsize() >= args.batch_backlog:
                # backlog gate: only drain-and-batch when the queue shows
                # the server is falling behind; a trickle request converts
                # alone at the unbatched latency. When engaged, drain the
                # whole (bounded) queue, not just batch_max items:
                # process_batched groups by window bucket and chunks each
                # group to batch_max, so a mixed-length burst still batches
                # per bucket — draining only batch_max items from a
                # round-robin arrival order yields one item per bucket and
                # defeats batching entirely (measured: 50 mixed requests,
                # every chunk batch=1)
                while True:
                    try:
                        items.append(work.get_nowait())
                    except queue_mod.Empty:
                        break
            try:
                t0 = time.perf_counter()
                timed_out = threading.Event()
                if args.timeout > 0:
                    inputs = [it[0] for it in items]
                    def report_timeout():
                        timed_out.set()
                        emit({"input": inputs[0] if len(inputs) == 1 else inputs,
                              "error": f"timeout after {args.timeout}s "
                                       "(conversion still running)"})
                    watchdog = threading.Timer(args.timeout, report_timeout)
                    watchdog.start()
                if batching:
                    process_batched(items)
                else:
                    in_path, explicit_out, finish = items[0]
                    try:
                        rec = convert_one(in_path, explicit_out)
                        if args.timeout > 0 and timed_out.is_set():
                            rec["late"] = True
                            rec["wall_s"] = round(time.perf_counter() - t0, 3)
                        emit(rec)
                    finally:
                        finish()
                if args.timeout > 0:
                    watchdog.cancel()
            except Exception as e:  # the worker must never die silently
                emit({"input": [it[0] for it in items],
                      "error": f"worker: {type(e).__name__}: {e}"})
            finally:
                for _ in items:
                    work.task_done()

    worker_t = threading.Thread(target=worker, daemon=True)
    worker_t.start()

    n_done = 0
    done_lock = threading.Lock()
    finished = threading.Event()

    def make_finish():
        def finish():
            nonlocal n_done
            with done_lock:
                n_done += 1
                if args.max_requests and n_done >= args.max_requests:
                    finished.set()
        return finish

    try:
        if args.watch:
            emit({"watching": args.watch, "output_dir": args.output_dir})
            seen: set[str] = set()
            settling: dict[str, tuple] = {}  # path -> (size, mtime) at last poll
            while not finished.is_set():
                for name in sorted(os.listdir(args.watch)):
                    p = os.path.join(args.watch, name)
                    if (p in seen or not os.path.isfile(p)
                            or name.endswith("_pred.wav")):
                        continue
                    # convert only once (size, mtime) is stable across two
                    # polls — a file still being copied in would otherwise be
                    # read truncated
                    st = os.stat(p)
                    sig = (st.st_size, st.st_mtime)
                    if settling.get(p) != sig:
                        settling[p] = sig
                        continue
                    try:
                        work.put_nowait((p, None, make_finish()))
                    except queue_mod.Full:
                        continue  # retry on the next poll; queue stays bounded
                    settling.pop(p, None)
                    seen.add(p)
                finished.wait(args.poll)
        else:
            for line in sys.stdin:
                line = line.strip()
                if not line:
                    continue
                if line.startswith("{"):
                    # a malformed request line must not kill the server either
                    try:
                        req = json.loads(line)
                        in_path, explicit_out = req["input"], req.get("output")
                    except Exception as e:
                        emit({"request": line[:200],
                              "error": f"bad request: {type(e).__name__}: {e}"})
                        continue
                else:
                    in_path, explicit_out = line, None
                # blocking put: stdin's own flow control backpressures the
                # piping sender, so a batch of N requests all complete (a
                # full queue only DELAYS ingest; rejection is reserved for
                # watch mode, where retry-next-poll is free)
                work.put((in_path, explicit_out, make_finish()))
                if finished.is_set():
                    break
            # all requests read: drain the queue before exiting (work.join
            # returns once every enqueued conversion has been reported)
            work.join()
    finally:
        done.set()


if __name__ == "__main__":
    main()
