"""Quantify streaming-conversion error at PRODUCTION geometry.

Measures how far `pipeline/stream.StreamingCloner`'s incremental forward
deviates from the bit-exact whole-clip forward, as a function of
(context_frames, lookahead_frames), and compares it against the reference's
own long-form strategy (two half-offset window passes stitched by center
halves, test.py:87-145) — the same methodology as tools/sp_seam_error.py.
Also measures the vocoder seam penalty: the scale-optimal relative spectral
error of the streamed waveform vs the offline (one-shot Griffin-Lim)
waveform against the same target magnitudes.

Run (CPU is fine; production-geometry forward, trained enc_14 weights):
  python tools/stream_fidelity.py [--frames 2400] [--chunk 400]
        [--settings 200:100,400:200,800:400] [--n-iter 25 --gl-momentum 0.99]

Results recorded in docs/DESIGN.md ("Streaming conversion").
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def spectral_err(wav, F_target, feat):
    """Scale-optimal relative spectral error ||s*|STFT(pre(y))| - F|| / ||F||."""
    import jax.numpy as jnp

    from speech_cloner_tpu.ops.preemphasis import preemphasis
    from speech_cloner_tpu.ops.stft import stft

    y = preemphasis(np.asarray(wav, np.float32), feat.pre_emphasis, xp=np)
    M = np.abs(np.asarray(stft(jnp.asarray(y), n_fft=feat.n_fft_,
                               hop_length=feat.hop_length,
                               win_length=feat.win_length, xp=jnp)))
    T = min(M.shape[0], F_target.shape[0])
    M, F = M[:T].ravel(), np.asarray(F_target[:T]).ravel()
    s = float(F @ M / max(M @ M, 1e-20))
    return float(np.linalg.norm(s * M - F) / max(np.linalg.norm(F), 1e-20))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--enc-ckpt", default="/root/reference/enc_14_ckpt/encoder-136512")
    ap.add_argument("--dec-ckpt")
    ap.add_argument("--frames", type=int, default=2400)
    ap.add_argument("--chunk", type=int, default=400)
    ap.add_argument("--margin", type=int, default=16)
    ap.add_argument("--settings", default="200:100,400:200,800:400")
    ap.add_argument("--n-iter", type=int, default=25)
    ap.add_argument("--gl-momentum", type=float, default=0.99)
    ap.add_argument("--calibrated-gain", action="store_true",
                    help="give the streamer the offline whole-clip gain "
                         "(isolates context-truncation error from the "
                         "gain estimate)")
    ap.add_argument("--gain-mode", choices=("running", "frozen"),
                    default="running",
                    help="uncalibrated gain handling: 'running' converges "
                         "to the offline clip-wide estimate; 'frozen' keeps "
                         "the first window's (the round-3 behavior)")
    ap.add_argument("--first-gain", choices=("window", "buffered"),
                    default="window",
                    help="scope of the first-window gain estimate: 'window' "
                         "= the first model window (push-invariant), "
                         "'buffered' = everything buffered at first-step "
                         "time (closer to offline; push-size dependent)")
    ap.add_argument("--block", type=int, default=16000,
                    help="push block size in samples (matters for "
                         "--first-gain buffered; 0 = whole clip at once)")
    ap.add_argument("--bf16", action="store_true",
                    help="run the STREAMER's model forward in bf16 while "
                         "the exact whole-clip reference stays f32 — "
                         "quantifies the fidelity cost of the bf16 "
                         "capacity lever (tools/stream_capacity.py --bf16)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from speech_cloner_tpu.data.synth_corpus import TARGET_PROFILE, synth_utterance
    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.ops import mfcc_input
    from speech_cloner_tpu.ops.db import db_to_power
    from speech_cloner_tpu.ops.features import FeatureConfig
    from speech_cloner_tpu.pipeline.clone import ClonePipeline
    from speech_cloner_tpu.pipeline.stitch import compound, shifted_window_stack, window_stack
    from speech_cloner_tpu.pipeline.stream import StreamingCloner

    enc_cfg = enc_m.EncoderConfig()
    dec_cfg = dec_m.DecoderConfig()
    feat_cfg = FeatureConfig(calc_mfcc_derivate=True)

    if os.path.exists(args.enc_ckpt + ".index"):
        from speech_cloner_tpu.runtime.tf_import import load_tf_encoder

        enc_params, enc_state = load_tf_encoder(args.enc_ckpt, enc_cfg)
        enc_src = "enc_14 (trained)"
    else:
        enc_params, enc_state = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
        enc_src = "random"
    if args.dec_ckpt:
        from speech_cloner_tpu.runtime.checkpoint import Checkpointer

        tree, step = Checkpointer(args.dec_ckpt, "decoder").restore()
        dec_params, dec_state = tree["params"], tree["model_state"]
        dec_src = f"trained (step {step})"
    else:
        dec_params, dec_state = dec_m.init(jax.random.PRNGKey(1), dec_cfg)
        dec_src = "random"

    pipe = ClonePipeline(enc_cfg=enc_cfg, dec_cfg=dec_cfg, feat_cfg=feat_cfg,
                         enc_params=enc_params, enc_state=enc_state,
                         dec_params=dec_params, dec_state=dec_state,
                         n_iter=args.n_iter, gl_momentum=args.gl_momentum)

    T = args.frames
    rng = np.random.default_rng(0)
    wavs, total = [], 0
    while total < (T + 4) * feat_cfg.hop_length:
        w, _ = synth_utterance(rng, TARGET_PROFILE, n_phones=30)
        wavs.append(w)
        total += len(w)
    wav = np.concatenate(wavs)[: T * feat_cfg.hop_length - 1]
    total_frames = wav.size // feat_cfg.hop_length + 1
    print(f"T={total_frames} frames ({wav.size / 16000:.1f}s) chunk={args.chunk} "
          f"encoder={enc_src} decoder={dec_src} "
          f"GL n_iter={args.n_iter} momentum={args.gl_momentum}", flush=True)

    # ---- ground truth: whole-clip features + single exact forward
    mfcc, _, _ = mfcc_input(jnp.asarray(wav), feat_cfg, xp=jnp)
    _, ref_stft, _ = pipe.forward_windows(mfcc[None])
    ref_stft = np.asarray(ref_stft[0])
    print("exact whole-clip forward done", flush=True)

    def stats(name, pred, ref):
        T2 = min(pred.shape[0], ref.shape[0])
        err = np.abs(pred[:T2] - ref[:T2])
        return (f"  {name:28s} max={err.max():.3e} "
                f"p99.9={np.percentile(err, 99.9):.3e} median={np.median(err):.3e}")

    # ---- baseline: the reference's own stitch on the same input
    Tw = enc_cfg.n_timesteps
    mfcc_p = np.asarray(mfcc)
    pad = (-mfcc_p.shape[0]) % Tw
    mfcc_p = np.pad(mfcc_p, ((0, pad), (0, 0)))
    y0 = window_stack(jnp.asarray(mfcc_p), Tw)
    y1 = shifted_window_stack(jnp.asarray(mfcc_p), Tw)
    _, st_a, _ = pipe.forward_windows(y0)
    _, st_b, _ = pipe.forward_windows(y1)
    stitch_stft = np.asarray(compound(st_a, st_b))
    print("reference-style two-pass stitch (its own long-form error):")
    print(stats("stitch stft", stitch_stft, ref_stft), flush=True)

    # offline vocode of the exact forward = the waveform quality ceiling
    F_target = np.asarray(jnp.sqrt(db_to_power(
        jnp.maximum(0.0, jnp.asarray(ref_stft)) / feat_cfg.P_dB_norm_factor - 80.0,
        xp=jnp)))
    wav_off = np.asarray(pipe.device_vocode(jnp.asarray(ref_stft),
                                            jax.random.PRNGKey(0)))
    e_off = spectral_err(wav_off, F_target, feat_cfg)
    print(f"offline one-shot GL spectral error: {e_off:.4f}", flush=True)

    gain = (feat_cfg.mean_abs_amp_norm / float(np.mean(np.abs(wav)))
            if args.calibrated_gain else None)
    spipe = pipe
    if args.bf16:
        import dataclasses

        spipe = dataclasses.replace(pipe, compute_dtype=jnp.bfloat16)
        print("streamer forward: bf16 (exact reference stays f32)", flush=True)
    for setting in args.settings.split(","):
        lc, rc = (int(x) for x in setting.split(":"))
        s = StreamingCloner(spipe, chunk_frames=args.chunk, context_frames=lc,
                            lookahead_frames=rc, margin_frames=args.margin,
                            input_gain=gain, gain_mode=args.gain_mode,
                            first_gain=args.first_gain, collect_debug=True)
        out = s.convert_all(wav, block=args.block or wav.size)
        streamed = np.concatenate(s.debug_stft, axis=0)
        e_stream = spectral_err(out, F_target, feat_cfg)
        gdesc = "calibrated" if gain is not None else (
            f"{args.gain_mode}/{args.first_gain}")
        print(f"streaming context={lc} lookahead={rc} gain={gdesc} "
              f"(algorithmic latency {s.latency_seconds:.2f}s):")
        print(stats("stream stft vs exact", streamed, ref_stft))
        print(f"  streamed-wav spectral error {e_stream:.4f} "
              f"(offline {e_off:.4f}, seam penalty "
              f"{100 * (e_stream - e_off) / max(e_off, 1e-9):+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
