"""Measure concurrent live-stream capacity per chip (batched streaming).

For each B in --batches, runs a `StreamingCloner(batch=B)` at production
geometry (enc_14 encoder + shipped decoder config) over --seconds of audio
per stream and times the warm steady-state step (one device program
converting one chunk for all B streams). Capacity per chip = how many
realtime streams fit: B * chunk_seconds / warm_step_seconds.

The hypothesis being measured (docs/DESIGN.md "Streaming conversion"): the
per-chunk cost is dominated by Griffin-Lim's FIXED per-loop-iteration
dispatch cost, which a batched fori_loop pays once per step, not per
stream — so capacity should scale strongly sublinearly in per-step cost.

Run on the chip (compiles several programs per B; budget minutes each):
  SCL_COMPILE_CACHE=1 python tools/stream_capacity.py [--batches 1,4,8,16]
        [--seconds 20] [--n-iter 25 --gl-momentum 0.99]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--enc-ckpt", default="/root/reference/enc_14_ckpt/encoder-136512")
    ap.add_argument("--batches", default="1,4,8,16")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--chunk-frames", type=int, default=400)
    ap.add_argument("--context-frames", type=int, default=400)
    ap.add_argument("--lookahead-frames", type=int, default=200)
    ap.add_argument("--n-iter", type=int, default=25)
    ap.add_argument("--gl-momentum", type=float, default=0.99)
    ap.add_argument("--gl-unroll", type=int, default=6)
    ap.add_argument("--gl-dft", choices=("fft", "matmul"), default="matmul",
                    help="GL transform kernel; matmul (MXU DFT bases) "
                         "measured 1.7x on the offline parity vocode "
                         "(docs/ROUND5.md)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 model forward (f32 features/vocoder) — the "
                         "streaming step is model-forward-dominated at "
                         "B>=16 (docs/DESIGN.md capacity table), so this "
                         "is the remaining throughput lever; fidelity "
                         "delta measured in tools/stream_fidelity.py "
                         "--bf16")
    args = ap.parse_args(argv)

    os.environ.setdefault("SCL_COMPILE_CACHE", "1")
    from speech_cloner_tpu.apps._platform import apply_compile_cache

    apply_compile_cache()

    import jax
    import jax.numpy as jnp

    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.ops.features import FeatureConfig
    from speech_cloner_tpu.pipeline.clone import ClonePipeline
    from speech_cloner_tpu.pipeline.stream import StreamingCloner

    enc_cfg = enc_m.EncoderConfig()
    dec_cfg = dec_m.DecoderConfig()
    feat_cfg = FeatureConfig(calc_mfcc_derivate=True)
    if os.path.exists(args.enc_ckpt + ".index"):
        from speech_cloner_tpu.runtime.tf_import import load_tf_encoder

        enc_params, enc_state = load_tf_encoder(args.enc_ckpt, enc_cfg)
    else:
        enc_params, enc_state = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
    dec_params, dec_state = dec_m.init(jax.random.PRNGKey(1), dec_cfg)
    pipe = ClonePipeline(enc_cfg=enc_cfg, dec_cfg=dec_cfg, feat_cfg=feat_cfg,
                         enc_params=enc_params, enc_state=enc_state,
                         dec_params=dec_params, dec_state=dec_state,
                         n_iter=args.n_iter, gl_momentum=args.gl_momentum,
                         gl_unroll=args.gl_unroll, gl_dft=args.gl_dft,
                         compute_dtype=jnp.bfloat16 if args.bf16 else None)

    sr = feat_cfg.sample_rate
    hop = feat_cfg.hop_length
    chunk_s = args.chunk_frames * hop / sr
    n = int(args.seconds * sr)
    print(f"backend={jax.default_backend()} chunk={chunk_s:.1f}s "
          f"GL {args.n_iter}@{args.gl_momentum}", flush=True)

    rows = []
    for B in (int(b) for b in args.batches.split(",")):
        rng = np.random.default_rng(0)
        t = np.arange(n) / sr
        wavs = np.stack([
            (0.5 * np.sin(2 * np.pi * (180 + 40 * i) * t)
             + 0.1 * rng.standard_normal(n)).astype(np.float32)
            for i in range(B)])
        block = args.chunk_frames * hop  # one chunk of input per push
        # the axon remote-compile tunnel flakes transiently; retry this B
        # from scratch rather than losing the whole sweep (the compile cache
        # makes the retry cheap)
        step_ms = None
        for attempt in range(3):
            s = StreamingCloner(pipe, batch=B, chunk_frames=args.chunk_frames,
                                context_frames=args.context_frames,
                                lookahead_frames=args.lookahead_frames)
            step_ms = []
            try:
                for i in range(0, n, block):
                    t0 = time.perf_counter()
                    out = s.push(wavs[:, i:i + block])
                    dt = 1e3 * (time.perf_counter() - t0)
                    if out.shape[1]:
                        step_ms.append(dt)
                break
            except Exception as e:  # noqa: BLE001 — transient tunnel errors
                print(f"B={B}: attempt {attempt + 1} failed: {e}", flush=True)
                step_ms = None
        if not step_ms:
            rows.append({"B": B, "error": "all attempts failed"})
            continue
        med = float(np.median(step_ms))
        warm = [x for x in step_ms[1:] if x <= 3 * med] or step_ms[-1:]
        p50 = float(np.median(warm))
        cap = B * chunk_s * 1e3 / p50
        rows.append({"B": B, "steps": len(step_ms),
                     "warm_step_ms_p50": round(p50, 1),
                     "warm_step_ms_max": round(float(np.max(warm)), 1),
                     "per_stream_rtf": round(p50 / 1e3 / (B * chunk_s), 5),
                     "streams_per_chip": round(cap, 1)})
        print(f"B={B:3d}: warm step {p50:7.1f} ms "
              f"({len(step_ms) - 1 - len(warm)} compile steps excluded) -> "
              f"{cap:7.1f} realtime streams/chip", flush=True)
    print(json.dumps({"capacity": rows}))


if __name__ == "__main__":
    main()
