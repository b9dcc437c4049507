"""Clone demo runner: the reference's TESTS 1-3 scenario checks in one command.

Rebuild of `python test.py` TESTS 1-3 (test.py:336-413) plus the verification
loop the reference left manual (voice_identification.py:202-223):

  TEST 1  self-reconstruction: a *validation* utterance of the target speaker
          through encoder+decoder; mel/stft losses + resynthesized audio.
  TEST 2  target-speaker conversion: a second target utterance, loss readout.
  TEST 3  other-speaker conversion: a source-speaker utterance -> target
          voice, plus the speaker-ID posterior-shift verdict when --spk-ckpt
          is given.

  python -m speech_cloner_tpu.apps.clone_demo \
      --target-path <arctic_root> --spk-id slt --source-spk bdl \
      --enc-ckpt <dir|tf-prefix> --dec-ckpt <dir> \
      [--spk-ckpt <dir> --target-timit-spk SLT0] [--out-dir ./clone_demo]

Artifacts per test: {true,pred}.wav, spec.png (data/viz.spec_comparison),
plus a machine-readable demo_report.json at the top level.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _losses(mel_true, mel_pred, stft_true, stft_pred, w=400.0):
    """Reference loss readout: w*MSE(mel) + w*MSE(stft) (decoder.py:185-199),
    plus mel-cepstral distortion (dB) — the objective spectral-quality number
    the reference lacked (train/metrics.mel_cepstral_distortion)."""
    from ..train.metrics import mel_cepstral_distortion

    n = min(mel_true.shape[0], mel_pred.shape[0])
    mel_l = float(w * np.mean((mel_true[:n] - mel_pred[:n]) ** 2))
    stft_l = float(w * np.mean((stft_true[:n] - stft_pred[:n]) ** 2))
    mcd = float(mel_cepstral_distortion(mel_true[:n], mel_pred[:n]))
    return {"mel_loss": mel_l, "stft_loss": stft_l, "loss": mel_l + stft_l,
            "mcd_db": mcd}


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--target-path", required=True, help="ARCTIC-layout corpus root")
    ap.add_argument("--spk-id", default="slt")
    ap.add_argument("--source-spk", default="bdl")
    ap.add_argument("--enc-ckpt", required=True)
    ap.add_argument("--dec-ckpt", required=True)
    ap.add_argument("--spk-ckpt", help="speaker-ID model dir for verification")
    ap.add_argument("--target-timit-spk",
                    help="the target voice's class name in the speaker-ID model")
    ap.add_argument("--enc-cfg")
    ap.add_argument("--dec-cfg")
    ap.add_argument("--ds-cfg")
    ap.add_argument("--out-dir", default="./clone_demo")
    ap.add_argument("--n-iter", type=int, default=200)
    ap.add_argument("--realse", type=float, default=1.2)
    ap.add_argument("--prop-val", type=float, default=0.02)
    ap.add_argument("--verify-utts", type=int, default=4,
                    help="source utterances converted for the speaker-ID "
                         "verdict (posterior averaged over all their windows; "
                         "one ~3 s clip is a single-window verdict)")
    args = ap.parse_args(argv)

    import jax

    from ..data.arctic import ARCTIC
    from ..data.audio_io import write_riff_wav
    from ..data.viz import spec_comparison
    from ..models import decoder as dec_m
    from ..models import encoder as enc_m
    from ..ops import mfcc_input
    from ..pipeline.clone import ClonePipeline
    from ..runtime.config import feature_config_from_cfg_d, load_cfg_d
    from .convert import load_decoder_weights
    from .train_encoder import DEFAULT_DS_CFG

    ds_cfg_d = load_cfg_d(args.ds_cfg) if args.ds_cfg else dict(DEFAULT_DS_CFG)
    feat_cfg = feature_config_from_cfg_d(ds_cfg_d)
    enc_cfg = (enc_m.config_from_cfg_d(load_cfg_d(args.enc_cfg))
               if args.enc_cfg else enc_m.EncoderConfig())
    dec_cfg = (dec_m.config_from_cfg_d(load_cfg_d(args.dec_cfg))
               if args.dec_cfg else dec_m.DecoderConfig())

    from .train_decoder import load_encoder_weights

    enc_params, enc_state = load_encoder_weights(args.enc_ckpt, enc_cfg)
    dec_params, dec_state = load_decoder_weights(args.dec_ckpt, dec_cfg)
    pipe = ClonePipeline(enc_cfg=enc_cfg, dec_cfg=dec_cfg, feat_cfg=feat_cfg,
                         enc_params=enc_params, enc_state=enc_state,
                         dec_params=dec_params, dec_state=dec_state,
                         n_iter=args.n_iter, realse=args.realse)

    ds = ARCTIC(args.target_path, feat_cfg, n_timesteps=dec_cfg.n_timesteps,
                verbose=True)

    # utterance selection: the fixed seed-0 val split of the target speaker
    # (sound_ds.py:268-283), so TESTS 1-2 run on data the decoder never saw.
    tgt_idx = np.flatnonzero(ds.get_ds_filter({"spk_id": args.spk_id}))
    val_idx = ds._val_split(tgt_idx, args.prop_val, sample_trn=False)
    if len(val_idx) < 2:  # tiny corpora: fall back to the last two utterances
        val_idx = tgt_idx[-2:]
    src_idx = np.flatnonzero(ds.get_ds_filter({"spk_id": args.source_spk}))
    if len(src_idx) == 0:
        raise SystemExit(f"error: no utterances for source speaker {args.source_spk!r}")

    scenarios = [
        ("test1_self_reconstruction", int(val_idx[0]), args.spk_id),
        ("test2_target_speaker", int(val_idx[1]), args.spk_id),
        ("test3_other_speaker", int(src_idx[0]), args.source_spk),
    ]

    os.makedirs(args.out_dir, exist_ok=True)
    report = {"enc_ckpt": args.enc_ckpt, "dec_ckpt": args.dec_ckpt,
              "n_iter": args.n_iter, "tests": {}}
    sr = feat_cfg.sample_rate
    test3_wavs = None
    control_wavs = []  # target self-reconstructions (TESTS 1-2 preds)

    for name, utt, spk in scenarios:
        wav_true = np.asarray(ds.ds["wav"][utt], np.float32)
        wav_pred, mel_pred, stft_pred, _ = pipe.convert(wav_true)

        # true spectra on the identically padded waveform for a frame-aligned
        # loss readout (the reference compares window stacks, test.py:336-413)
        spw = enc_cfg.n_timesteps * feat_cfg.hop_length
        pad = (-len(wav_true)) % spw
        if len(wav_true) + pad < spw:
            pad = spw - len(wav_true)
        wav_padded = np.pad(wav_true, (0, pad))
        _, mel_true, stft_true = mfcc_input(wav_padded, feat_cfg, xp=np)
        # centered STFT yields one trailing frame beyond the K*T the model
        # consumed; align the truth to the prediction's frame grid
        mel_true = mel_true[: mel_pred.shape[0]]
        stft_true = stft_true[: stft_pred.shape[0]]

        d = os.path.join(args.out_dir, name)
        os.makedirs(d, exist_ok=True)
        write_riff_wav(os.path.join(d, "true.wav"), wav_true, sr, norm=True)
        write_riff_wav(os.path.join(d, "pred.wav"), wav_pred, sr, norm=True)
        try:
            spec_comparison(mel_true, mel_pred, stft_true, stft_pred,
                            save_path=os.path.join(d, "spec.png"))
        except Exception as e:  # matplotlib optional
            print(f" (spec.png skipped: {e})")

        entry = {"utterance": int(utt), "speaker": spk,
                 "duration_s": round(len(wav_true) / sr, 2),
                 **_losses(mel_true, mel_pred, stft_true, stft_pred)}
        report["tests"][name] = entry
        print(f" {name}: spk={spk} dur={entry['duration_s']}s "
              f"mel_loss={entry['mel_loss']:.3f} stft_loss={entry['stft_loss']:.3f} "
              f"mcd={entry['mcd_db']:.2f}dB")
        if name.startswith("test3"):
            test3_wavs = (wav_true, wav_pred)
        else:
            control_wavs.append(wav_pred)

    # speaker-ID verification on the cross-speaker conversion (TEST 3),
    # averaged over --verify-utts source utterances for a multi-window verdict
    if args.spk_ckpt and test3_wavs is not None:
        from ..pipeline.verify import format_report, verify_conversion

        wavs_true, wavs_pred = [test3_wavs[0]], [test3_wavs[1]]
        for utt in src_idx[1:max(args.verify_utts, 1)]:
            w_t = np.asarray(ds.ds["wav"][int(utt)], np.float32)
            w_p, _, _, _ = pipe.convert(w_t)
            wavs_true.append(w_t)
            wavs_pred.append(w_p)
        v = verify_conversion(wavs_true, wavs_pred, args.spk_ckpt,
                              feat_cfg, target_spk_id=args.target_timit_spk,
                              wav_control=control_wavs or None)
        report["verification"] = v
        print(format_report(v))

    with open(os.path.join(args.out_dir, "demo_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f" report -> {os.path.join(args.out_dir, 'demo_report.json')}")
    return report


if __name__ == "__main__":
    main()
