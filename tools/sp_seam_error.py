"""Quantify sequence-parallel seam error at PRODUCTION geometry.

Measures, on an 8-virtual-device CPU mesh, how far the sequence-parallel
clone forward (parallel/halo.py: exact conv halos + warmup GRU seams)
deviates from the bit-exact single-device forward over the same frames —
as a function of the GRU warmup length — and compares it against the
reference's own long-form strategy (two half-offset 400-frame window passes
stitched by center halves, test.py:87-145) measured on the same input.

Run:
  python tools/sp_seam_error.py [--enc-ckpt <tf-prefix|dir>] [--dec-ckpt <dir>]
        [--frames-per-shard 800] [--warmups 100,200,400]

Defaults use the shipped enc_14 TF encoder weights (real, trained) and a
seed-0 random decoder at the production decoder geometry (E=256/512, K=32).
Results are recorded in docs/DESIGN.md ("SP seam error").
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--enc-ckpt", default="/root/reference/enc_14_ckpt/encoder-136512")
    ap.add_argument("--dec-ckpt")
    ap.add_argument("--frames-per-shard", type=int, default=800)
    ap.add_argument("--warmups", default="100,200,400")
    ap.add_argument("--seam-width", type=int, default=50)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from speech_cloner_tpu.data.synth_corpus import TARGET_PROFILE, synth_utterance
    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.ops import mfcc_input
    from speech_cloner_tpu.ops.features import FeatureConfig
    from speech_cloner_tpu.parallel import make_seq_mesh
    from speech_cloner_tpu.parallel.halo import clone_forward_seq_parallel

    n_dev = jax.device_count()
    enc_cfg = enc_m.EncoderConfig()            # production enc_14 geometry
    dec_cfg = dec_m.DecoderConfig()            # production: E=256/512, K=32
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

    # speech-like input spanning n_dev shards of frames_per_shard
    T = n_dev * args.frames_per_shard
    rng = np.random.default_rng(0)
    wavs = []
    total = 0
    while total < (T + 4) * feat_cfg.hop_length:
        w, _ = synth_utterance(rng, TARGET_PROFILE, n_phones=30)
        wavs.append(w)
        total += len(w)
    wav = np.concatenate(wavs)[: (T + 4) * feat_cfg.hop_length]
    mfcc, _, _ = mfcc_input(jnp.asarray(wav), feat_cfg, xp=jnp)
    mfcc = np.asarray(mfcc)[None, :T]
    print(f"devices={n_dev} T={T} frames ({T * feat_cfg.hop_length / 16000:.1f}s), "
          f"encoder={enc_src}, decoder={dec_src}", flush=True)

    # ---- ground truth: unsharded full-T forward on one device
    @jax.jit
    def full_forward(x):
        logits, _ = enc_m.apply(enc_params, enc_state, x, cfg=enc_cfg, train=False)
        ppg = enc_m.posteriors(logits)
        y_mel, y_stft, _ = dec_m.apply(dec_params, dec_state, ppg, cfg=dec_cfg,
                                       train=False)
        return y_mel, y_stft, ppg

    ref_mel, ref_stft, ref_ppg = [np.asarray(a) for a in full_forward(jnp.asarray(mfcc))]
    print("single-device reference forward done", flush=True)

    seams = np.arange(1, n_dev) * args.frames_per_shard
    seam_mask = np.zeros(T, bool)
    for s in seams:
        seam_mask[max(s - args.seam_width, 0): s + args.seam_width] = True

    def stats(name, pred, ref):
        err = np.abs(np.asarray(pred) - ref)[0]            # [T, C]
        frame_err = err.max(axis=1)
        t_worst = int(frame_err.argmax())
        return (f"  {name:18s} max={err.max():.3e}@t={t_worst} "
                f"p99.9={np.percentile(err, 99.9):.3e} median={np.median(err):.3e} "
                f"seam_max={frame_err[seam_mask].max():.3e} "
                f"interior_max={frame_err[~seam_mask].max():.3e}")

    # ---- the reference's own strategy: two half-offset window passes stitched
    from speech_cloner_tpu.ops.features import FeatureConfig as _FC  # noqa: F401
    from speech_cloner_tpu.pipeline.stitch import compound, shifted_window_stack, window_stack

    Tw = enc_cfg.n_timesteps
    K = T // Tw
    y0 = window_stack(jnp.asarray(mfcc[0]), Tw)
    y1 = shifted_window_stack(jnp.asarray(mfcc[0]), Tw)

    @jax.jit
    def windowed(y):
        logits, _ = enc_m.apply(enc_params, enc_state, y, cfg=enc_cfg, train=False)
        ppg = enc_m.posteriors(logits)
        y_mel, y_stft, _ = dec_m.apply(dec_params, dec_state, ppg, cfg=dec_cfg, train=False)
        return y_mel, y_stft

    mel_a, stft_a = windowed(y0)
    mel_b, stft_b = windowed(y1)
    mel_st = np.asarray(compound(mel_a, mel_b))[None]
    stft_st = np.asarray(compound(stft_a, stft_b))[None]
    print("reference-style window+stitch (this is the error the reference's "
          "own long-form path carries):")
    print(stats("stitch mel", mel_st, ref_mel))
    print(stats("stitch stft", stft_st, ref_stft))

    # ---- sequence-parallel forward at each warmup
    mesh = make_seq_mesh(n_dev)
    for warmup in [int(w) for w in args.warmups.split(",")]:
        fwd = clone_forward_seq_parallel(enc_params, enc_state, enc_cfg,
                                         dec_params, dec_state, dec_cfg, mesh,
                                         warmup=warmup)
        mel, stft, ppg = fwd(jnp.asarray(mfcc))
        print(f"seq-parallel warmup={warmup}:")
        print(stats("SP ppg", ppg, ref_ppg))
        print(stats("SP mel", mel, ref_mel))
        print(stats("SP stft", stft, ref_stft))
        ref_scale = float(np.abs(ref_stft).mean())
        print(f"  (ref |stft| mean {ref_scale:.3f})", flush=True)


if __name__ == "__main__":
    main()
