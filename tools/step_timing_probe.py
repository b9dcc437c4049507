"""Honest chained-dispatch timing of the three production train steps.

Times encoder / decoder / speaker-ID train steps at production geometry by
dispatching K steps back-to-back with the train state threaded through
(no host sync between steps — the way train/loop.py actually drives the
chip) and dividing the blocked wall time by K. Reports f32 and bf16.

The numbers feed tools/mfu_roofline.py (--enc-ms/--dec-ms/--spk-ms), which
relates them to XLA FLOP counts and v5e peaks; results recorded in
docs/DESIGN.md.

Run on the chip:  python tools/step_timing_probe.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true", help="f32 only, K=5")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches",
                    help="comma list: measure the batch-scaling ladder "
                         "(each step's ms + windows/s at every B) instead "
                         "of a single batch size. The reference's B=32 was "
                         "a CPU-feed_dict choice (encoder.py:256-263), not "
                         "a law; the scan-latency-bound steps amortize "
                         "their per-step floor almost linearly with B "
                         "(docs/DESIGN.md batch ladder).")
    ap.add_argument("--spk-time-fold",
                    help="comma list of time_fold values: measure ONLY the "
                         "speaker-ID step at each fold (the C_in=1 "
                         "shape-pathology A/B, VERDICT r4 #8; fold=1 is the "
                         "reference architecture, voice_identification.py:9-37)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speech_cloner_tpu.apps._platform import apply_compile_cache

    apply_compile_cache()  # opt-in via SCL_COMPILE_CACHE=1: reruns skip the
    # ~200 s of remote train-step compiles

    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.models import speaker_id as spk_m
    from speech_cloner_tpu.train import (
        DecoderLossConfig,
        OptimizerConfig,
        decoder_train_step,
        encoder_train_step,
        make_train_state,
        speaker_train_step,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    B = args.batch
    # K must amortize the final fetch's RPC round trip (tens of ms through
    # the tunnel) to sub-ms per-step error
    K = 5 if args.quick else 50
    rng = np.random.default_rng(0)
    opt_cfg = OptimizerConfig()
    opt = opt_cfg.make()
    loss_cfg = DecoderLossConfig()

    def chain_time(name, fn, ts, *batch):
        """Compile, then time K chained dispatches ending in a hard host
        fetch of a scalar metric.

        block_until_ready alone is NOT a sync point for small programs on
        the axon remote runtime: the encoder step "measured" 0.32 ms that
        way but 4.7 ms with a hard fetch (np.asarray of the Kth step's
        loss), while big programs (decoder, 52 ms) read the same both ways
        — the enqueue path itself backpressures once steps are large. A
        warmup chain absorbs a one-time post-compile stall (~50 s observed)
        before the timed rounds."""
        try:
            t0 = time.perf_counter()
            out = fn(ts, *batch)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            cur = ts
            for _ in range(5):  # warmup: absorb post-compile pipeline stalls
                cur, metrics = fn(cur, *batch)
            float(np.asarray(metrics["loss"]))
            best = float("inf")
            for _ in range(3):
                cur = ts
                t0 = time.perf_counter()
                for _ in range(K):
                    cur, metrics = fn(cur, *batch)
                float(np.asarray(metrics["loss"]))  # hard sync: K-chain done
                best = min(best, (time.perf_counter() - t0) / K)
        except Exception as e:  # e.g. HBM OOM at the top of the ladder:
            # report the cell and keep sweeping — the failing B is itself
            # a ladder datapoint (the capacity ceiling)
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})",
                  flush=True)
            return None
        print(f"{name}: compile {compile_s:6.1f}s  chained step "
              f"{best * 1e3:7.2f} ms", flush=True)
        return best

    dtypes = [None] if args.quick else [None, jnp.bfloat16]
    results = []

    spk_folds = ([int(v) for v in args.spk_time_fold.split(",")]
                 if args.spk_time_fold else [1])

    def measure(B):
        enc_cfg = enc_m.EncoderConfig()
        enc_params, enc_state = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
        x = jnp.asarray(rng.standard_normal((B, 400, 80)), jnp.float32)
        if args.spk_time_fold:
            measure_spk(B)
            return
        ts_e = make_train_state(enc_params, enc_state, opt_cfg, jax.random.PRNGKey(1))
        y = jnp.asarray(np.eye(61, dtype=np.float32)[rng.integers(0, 61, (B, 400))])
        for dt in dtypes:
            fn = jax.jit(lambda t, a, b, dt=dt: encoder_train_step(
                t, a, b, cfg=enc_cfg, opt_cfg=opt_cfg, opt=opt, compute_dtype=dt))
            s = chain_time(f"encoder B={B} {'bf16' if dt else 'f32'}", fn, ts_e, x, y)
            if s is not None:
                results.append(("encoder", B, "bf16" if dt else "f32", s))

        dec_cfg = dec_m.DecoderConfig()
        dec_params, dec_state = dec_m.init(jax.random.PRNGKey(2), dec_cfg)
        ts_d = make_train_state(dec_params, dec_state, opt_cfg, jax.random.PRNGKey(3))
        mel = jnp.asarray(rng.standard_normal((B, 400, 80)) * 0.1, jnp.float32)
        stft = jnp.asarray(rng.standard_normal((B, 400, 201)) * 0.1, jnp.float32)
        for dt in dtypes:
            fn = jax.jit(lambda t, a, b, c, dt=dt: decoder_train_step(
                t, a, b, c, enc_params=enc_params, enc_state=enc_state,
                enc_cfg=enc_cfg, cfg=dec_cfg, loss_cfg=loss_cfg,
                opt_cfg=opt_cfg, opt=opt, compute_dtype=dt))
            s = chain_time(f"decoder B={B} {'bf16' if dt else 'f32'}", fn, ts_d, x, mel, stft)
            if s is not None:
                results.append(("decoder", B, "bf16" if dt else "f32", s))

        measure_spk(B)

    def measure_spk(B):
        power = jnp.asarray(rng.standard_normal((B, 400, 201)) * 0.3, jnp.float32)
        cls = jnp.asarray(np.eye(34, dtype=np.float32)[rng.integers(0, 34, (B,))])
        for fold in spk_folds:
            spk_cfg = spk_m.SpeakerIdConfig(n_timesteps=400, n_features=201,
                                            n_output=34, time_fold=fold)
            spk_params, spk_state = spk_m.init(jax.random.PRNGKey(4), spk_cfg)
            ts_s = make_train_state(spk_params, spk_state, opt_cfg,
                                    jax.random.PRNGKey(5))
            tag = f"speaker-ID{f' fold={fold}' if fold != 1 else ''}"
            for dt in dtypes:
                fn = jax.jit(lambda t, a, b, dt=dt, spk_cfg=spk_cfg:
                             speaker_train_step(t, a, b, cfg=spk_cfg,
                                                opt_cfg=opt_cfg, opt=opt,
                                                compute_dtype=dt))
                s = chain_time(f"{tag} B={B} {'bf16' if dt else 'f32'}",
                               fn, ts_s, power, cls)
                if s is not None:
                    results.append((f"speaker tf={fold}", B,
                                    "bf16" if dt else "f32", s))

    for b in ([int(v) for v in args.batches.split(",")] if args.batches
              else [B]):
        measure(b)

    if args.batches or args.spk_time_fold:
        import json

        print("\nbatch-scaling ladder (windows/s = B / chained-step-s):")
        for name, b, dt, sec in results:
            print(f"  {name:8s} B={b:<4d} {dt}: {sec * 1e3:8.2f} ms  "
                  f"{b / sec:9.0f} windows/s")
        print(json.dumps([{"step": n, "batch": b, "dtype": d,
                           "step_ms": round(sec * 1e3, 2),
                           "windows_per_s": round(b / sec, 1)}
                          for n, b, d, sec in results]))


if __name__ == "__main__":
    main()
