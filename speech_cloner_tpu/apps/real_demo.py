"""Real-voice clone demo: a decoder trained on REAL speech, verified.

The reference's proof artifact is real cloned speech: test.py:416-502 decodes
an arbitrary real recording and converts it into the voice of a decoder
trained on a real target corpus (TARGET_spk_reader.py:108-246). This app is
that scenario with the roles the container's assets allow: the shipped 60 s
real narration clip (the image's only real speech) becomes the TARGET —
chunked into a TARGET_spk corpus by apps/make_narrator_corpus, decoder
trained against the imported real enc_14 encoder — and the conversion
sources are synthetic-speaker utterances.

  TEST 1/2  self-reconstruction: the two HELD-OUT narrator chunks (never
            trained on, at any speed perturbation) through encoder+decoder;
            mel/stft losses + MCD + resynthesized audio.
  TEST 3    cross-speaker conversion: synthetic source utterances -> the
            narrator's voice, with the speaker-ID posterior-shift verdict
            (the verifier is trained WITH the narrator as a class via the
            corpus builder's TIMIT-layout injection).

  python -m speech_cloner_tpu.apps.real_demo \
      --heldout-dir ./_real/heldout --source-dir <dir with source wavs> \
      --enc-ckpt /root/reference/enc_14_ckpt/encoder-136512 \
      --dec-ckpt <dir> --spk-ckpt <dir> --target-timit-spk NARR0 \
      [--out-dir docs/real_demo]

Artifacts per test: {true,pred}.wav, spec.png, plus demo_report.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--heldout-dir", required=True,
                    help="held-out narrator chunks (make_narrator_corpus)")
    ap.add_argument("--source-dir", required=True,
                    help="directory of source-speaker wavs to convert")
    ap.add_argument("--enc-ckpt", required=True)
    ap.add_argument("--dec-ckpt", required=True)
    ap.add_argument("--spk-ckpt", help="speaker-ID model dir for verification")
    ap.add_argument("--target-timit-spk", default="NARR0",
                    help="the narrator's class name in the speaker-ID model")
    ap.add_argument("--enc-cfg")
    ap.add_argument("--dec-cfg")
    ap.add_argument("--ds-cfg")
    ap.add_argument("--out-dir", default="./real_demo")
    ap.add_argument("--n-iter", type=int, default=200)
    ap.add_argument("--realse", type=float, default=1.2)
    ap.add_argument("--verify-utts", type=int, default=4)
    args = ap.parse_args(argv)

    from ..data.audio_io import load_audio, write_riff_wav
    from ..models import decoder as dec_m
    from ..models import encoder as enc_m
    from ..ops import mfcc_input
    from ..pipeline.clone import ClonePipeline
    from ..runtime.config import feature_config_from_cfg_d, load_cfg_d
    from .clone_demo import _losses
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
                         n_iter=args.n_iter, realse=args.realse)
    sr = feat_cfg.sample_rate

    held = sorted(glob.glob(os.path.join(args.heldout_dir, "*.wav")))
    srcs = sorted(glob.glob(os.path.join(args.source_dir, "*.wav")))
    if not held:
        raise SystemExit(f"error: no held-out wavs under {args.heldout_dir}")
    if not srcs:
        raise SystemExit(f"error: no source wavs under {args.source_dir}")

    os.makedirs(args.out_dir, exist_ok=True)
    report = {"enc_ckpt": args.enc_ckpt, "dec_ckpt": args.dec_ckpt,
              "n_iter": args.n_iter, "tests": {}}

    def convert_and_record(name: str, wav_true: np.ndarray, label: str):
        wav_pred, mel_pred, stft_pred, _ = pipe.convert(wav_true)
        # frame-aligned truth on the identically padded waveform
        spw = enc_cfg.n_timesteps * feat_cfg.hop_length
        pad = (-len(wav_true)) % spw
        if len(wav_true) + pad < spw:
            pad = spw - len(wav_true)
        _, mel_true, stft_true = mfcc_input(np.pad(wav_true, (0, pad)),
                                            feat_cfg, xp=np)
        mel_true = mel_true[: mel_pred.shape[0]]
        stft_true = stft_true[: stft_pred.shape[0]]
        d = os.path.join(args.out_dir, name)
        os.makedirs(d, exist_ok=True)
        write_riff_wav(os.path.join(d, "true.wav"), wav_true, sr, norm=True)
        write_riff_wav(os.path.join(d, "pred.wav"), wav_pred, sr, norm=True)
        try:
            from ..data.viz import spec_comparison

            spec_comparison(mel_true, mel_pred, stft_true, stft_pred,
                            save_path=os.path.join(d, "spec.png"))
        except Exception as e:  # matplotlib optional
            print(f" (spec.png skipped: {e})")
        entry = {"source": label, "duration_s": round(len(wav_true) / sr, 2),
                 **_losses(mel_true, mel_pred, stft_true, stft_pred)}
        report["tests"][name] = entry
        print(f" {name}: {label} dur={entry['duration_s']}s "
              f"mel_loss={entry['mel_loss']:.3f} "
              f"stft_loss={entry['stft_loss']:.3f} "
              f"mcd={entry['mcd_db']:.2f}dB", flush=True)
        return wav_pred

    # TESTS 1-2: held-out real narrator chunks (self-reconstruction; the
    # decoder saw neither chunk at any speed)
    control_wavs = []
    for i, p in enumerate(held[:2]):
        wav_true = load_audio(p, sr)
        control_wavs.append(convert_and_record(
            f"test{i + 1}_heldout_reconstruction", wav_true,
            os.path.basename(p)))

    # TEST 3: synthetic source -> narrator voice
    wavs_true, wavs_pred = [], []
    first = True
    for p in srcs[: max(args.verify_utts, 1)]:
        wav_true = load_audio(p, sr)
        if first:
            wav_pred = convert_and_record("test3_source_conversion", wav_true,
                                          os.path.basename(p))
            first = False
        else:
            wav_pred, _, _, _ = pipe.convert(wav_true)
        wavs_true.append(wav_true)
        wavs_pred.append(wav_pred)

    if args.spk_ckpt:
        from ..pipeline.verify import format_report, verify_conversion

        v = verify_conversion(wavs_true, wavs_pred, args.spk_ckpt, feat_cfg,
                              target_spk_id=args.target_timit_spk,
                              wav_control=control_wavs)
        report["verification"] = v
        print(format_report(v))

    with open(os.path.join(args.out_dir, "demo_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f" report -> {os.path.join(args.out_dir, 'demo_report.json')}")
    return report


if __name__ == "__main__":
    main()
