"""Voice conversion app: arbitrary audio file -> cloned wav.

CLI rebuild of `python test.py` TEST 4 (test.py:416-502):

  python -m speech_cloner_tpu.apps.convert \
      --input some.mp3 --output-dir ./test_4 \
      --enc-ckpt /root/reference/enc_14_ckpt/encoder-136512 \
      --dec-ckpt ./dec_ckpt [--n-iter 200 --realse 1.2 --t-s 0 --t-e 60] \
      [--save-true]

--save-true also writes the Griffin-Lim resynthesis of the *input*
spectrogram (the reference's y_wav_true A/B artifact, test.py:148-158).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..data.audio_io import load_audio, write_riff_wav
from ..models import decoder as dec_m
from ..models import encoder as enc_m
from ..ops import from_power_to_wav, mfcc_input
from ..runtime.checkpoint import Checkpointer
from ..runtime.config import feature_config_from_cfg_d, load_cfg_d
from .train_decoder import load_encoder_weights
from .train_encoder import DEFAULT_DS_CFG


def load_decoder_weights(path: str, cfg: dec_m.DecoderConfig):
    if os.path.exists(path + ".index"):
        from ..runtime.tf_import import load_tf_decoder

        return load_tf_decoder(path, cfg)
    ck = Checkpointer(path, "decoder")
    tree, step = ck.restore()
    if tree is None:
        raise SystemExit(f"error: no decoder checkpoint found under {path} "
                         f"(expected decoder-<step>.npz or a TF <prefix>.index)")
    print(f" decoder restored from step {step}")
    return tree["params"], tree["model_state"]


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output-dir", default="./output")
    ap.add_argument("--enc-ckpt", required=True)
    ap.add_argument("--dec-ckpt")
    ap.add_argument("--enc-cfg")
    ap.add_argument("--dec-cfg")
    ap.add_argument("--ds-cfg")
    ap.add_argument("--t-s", type=float, default=0.0, help="start second")
    ap.add_argument("--t-e", type=float, default=60.0, help="end second")
    ap.add_argument("--n-iter", type=int, default=200)
    ap.add_argument("--realse", type=float, default=1.2)
    ap.add_argument("--gl-momentum", type=float, default=0.0,
                    help="Fast Griffin-Lim momentum (0 = reference algorithm)")
    ap.add_argument("--gl-unroll", type=int, default=1,
                    help="GL loop-body unroll (identical math; at whole-clip "
                         "frame counts the loop is compute-bound and 1 is "
                         "right — tools/gl_unroll_probe.py)")
    ap.add_argument("--gl-dft", choices=("fft", "matmul"), default="matmul",
                    help="GL transform kernel: 'matmul' runs the DFTs as MXU "
                         "matmuls against precomputed cos/sin bases — "
                         "measured 1.7x faster end to end on v5e, exact to "
                         "~1e-5 (docs/ROUND5.md); 'fft' restores the FFT "
                         "custom call")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 model compute (f32 vocoder/softmax)")
    ap.add_argument("--save-true", action="store_true")
    ap.add_argument("--verify-ckpt",
                    help="speaker-ID model dir: classify source vs converted "
                         "audio and report the posterior shift")
    ap.add_argument("--target-spk",
                    help="target voice's class in the speaker-ID model")
    args = ap.parse_args(argv)

    ds_cfg_d = load_cfg_d(args.ds_cfg) if args.ds_cfg else dict(DEFAULT_DS_CFG)
    feat_cfg = feature_config_from_cfg_d(ds_cfg_d)
    enc_cfg = (enc_m.config_from_cfg_d(load_cfg_d(args.enc_cfg))
               if args.enc_cfg else enc_m.EncoderConfig())
    dec_cfg = (dec_m.config_from_cfg_d(load_cfg_d(args.dec_cfg))
               if args.dec_cfg else dec_m.DecoderConfig())

    enc_params, enc_state = load_encoder_weights(args.enc_ckpt, enc_cfg)
    if args.dec_ckpt:
        dec_params, dec_state = load_decoder_weights(args.dec_ckpt, dec_cfg)
    else:
        import jax

        print(" WARNING: no --dec-ckpt; using randomly initialized decoder")
        dec_params, dec_state = dec_m.init(jax.random.PRNGKey(0), dec_cfg)

    from ..pipeline.clone import ClonePipeline

    import jax.numpy as jnp

    pipe = ClonePipeline(enc_cfg=enc_cfg, dec_cfg=dec_cfg, feat_cfg=feat_cfg,
                         enc_params=enc_params, enc_state=enc_state,
                         dec_params=dec_params, dec_state=dec_state,
                         n_iter=args.n_iter, realse=args.realse,
                         gl_momentum=args.gl_momentum,
                         gl_unroll=args.gl_unroll, gl_dft=args.gl_dft,
                         compute_dtype=jnp.bfloat16 if args.bf16 else None)

    if not os.path.exists(args.input):
        raise SystemExit(f"error: input file not found: {args.input}")
    print(f" loading {args.input}")
    wav = load_audio(args.input, feat_cfg.sample_rate)
    sr = feat_cfg.sample_rate
    wav = wav[int(args.t_s * sr): int(args.t_e * sr)]
    dur = len(wav) / sr

    t0 = time.perf_counter()
    wav_pred, mel_pred, stft_pred, _ = pipe.convert(wav)
    dt = time.perf_counter() - t0
    print(f" converted {dur:.1f}s in {dt:.2f}s (RTF {dt / dur:.4f}, incl. compile)")

    os.makedirs(args.output_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.input))[0]
    out = os.path.join(args.output_dir, f"{stem}_pred.wav")
    write_riff_wav(out, wav_pred, sr, norm=True)
    print(f" wrote {out}")

    if args.verify_ckpt:
        import json

        from ..pipeline.verify import format_report, verify_conversion

        report = verify_conversion(wav, wav_pred, args.verify_ckpt, feat_cfg,
                                   target_spk_id=args.target_spk)
        print(format_report(report))
        vp = os.path.join(args.output_dir, f"{stem}_verify.json")
        with open(vp, "w") as f:
            json.dump(report, f, indent=1)
        print(f" wrote {vp}")

    if args.save_true:
        import jax

        _, _, stft_true = mfcc_input(wav, feat_cfg, xp=np)
        wav_true = np.asarray(from_power_to_wav(
            stft_true, P_dB_norm_factor=feat_cfg.P_dB_norm_factor,
            pre_emphasis=feat_cfg.pre_emphasis, hop_length=feat_cfg.hop_length,
            win_length=feat_cfg.win_length, mean_abs_amp_norm=0.045,
            n_iter=args.n_iter, n_fft=feat_cfg.n_fft_, realse=1.0,
            key=jax.random.PRNGKey(0)))
        out_t = os.path.join(args.output_dir, f"{stem}_true.wav")
        write_riff_wav(out_t, wav_true, sr, norm=True)
        print(f" wrote {out_t}")


if __name__ == "__main__":
    main()
