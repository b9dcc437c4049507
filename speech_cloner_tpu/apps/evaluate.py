"""Evaluation app: encoder frame accuracy / decoder losses over a dataset.

Rebuilds the reference's eval entry points (encoder.eval_acc invoked at
encoder.py:495; decoder.eval_loss decoder.py:474-493) as a CLI:

  python -m speech_cloner_tpu.apps.evaluate encoder \
      --ds-path /data/TIMIT --ckpt ./enc_ckpt [--tf-ckpt .../encoder-136512]

  python -m speech_cloner_tpu.apps.evaluate decoder \
      --ds-path /data/ARCTIC/cmu_arctic --spk-id slt \
      --enc-ckpt .../encoder-136512 --ckpt ./dec_ckpt

  python -m speech_cloner_tpu.apps.evaluate speaker \
      --ds-path /data/TIMIT --ckpt ./spk_ckpt [--split val|tst|trn]
"""

from __future__ import annotations

import argparse

from ..models import decoder as dec_m
from ..models import encoder as enc_m
from ..runtime.config import feature_config_from_cfg_d, load_cfg_d
from ..train.evaluate import eval_acc, eval_loss
from .train_decoder import load_encoder_weights
from .train_encoder import DEFAULT_DS_CFG


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=("encoder", "decoder", "speaker"))
    ap.add_argument("--split", choices=("trn", "val", "tst"), default="val",
                    help="speaker mode: which per-speaker 0.8/0.1/0.1 slice "
                         "to score (voice_identification.py:169-223)")
    ap.add_argument("--ds-path", required=True)
    ap.add_argument("--ckpt", required=True, help="model to evaluate (ours or TF)")
    ap.add_argument("--enc-ckpt", help="frozen encoder for decoder eval")
    ap.add_argument("--enc-cfg")
    ap.add_argument("--dec-cfg")
    ap.add_argument("--ds-cfg")
    ap.add_argument("--spk-id", default="slt")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--n-batches", type=int, default=100)
    ap.add_argument("--vocoded", action="store_true",
                    help="speaker mode: score Griffin-Lim-resynthesized "
                         "windows instead of clean ones (the verifier's "
                         "deployment domain — it judges vocoded conversion "
                         "output, test.py:160-168)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-epochs", type=int, default=1,
                    help="speaker mode: sampler epochs — each epoch draws "
                         "fresh random window crops from the same held-out "
                         "utterances, tightening the accuracy estimate")
    args = ap.parse_args(argv)

    ds_cfg_d = load_cfg_d(args.ds_cfg) if args.ds_cfg else dict(DEFAULT_DS_CFG)
    feat_cfg = feature_config_from_cfg_d(ds_cfg_d)
    enc_cfg = (enc_m.config_from_cfg_d(load_cfg_d(args.enc_cfg))
               if args.enc_cfg else enc_m.EncoderConfig())

    if args.mode == "encoder":
        from ..data.timit import TIMIT

        params, state = load_encoder_weights(args.ckpt, enc_cfg)
        ds = TIMIT(args.ds_path, feat_cfg, n_timesteps=enc_cfg.n_timesteps, verbose=True)
        ds.build_spec_cache("phn_mfcc_cache.h5py")
        sampler = ds.window_sampler(batch_size=args.batch_size, n_epochs=1,
                                    ds_filter_d={"ds_type": "TEST"},
                                    base_name="phn_mfcc_cache.h5py")
        acc, n = eval_acc(params, state, sampler, cfg=enc_cfg, verbose=True)
        print(f" final acc over {n} frames: {acc:.4f}")

        from ..train.evaluate import eval_confusion, top_confusions

        cm = eval_confusion(params, state, ds.window_sampler(
            batch_size=args.batch_size, n_epochs=1,
            ds_filter_d={"ds_type": "TEST"}, base_name="phn_mfcc_cache.h5py"),
            cfg=enc_cfg, max_batches=args.n_batches)
        print(" top confused phone pairs (true->pred, count, rate):")
        for t, p, cnt, r in top_confusions(cm, ds.idx2phn, k=10):
            print(f"   {t:>5} -> {p:<5} {cnt:6d}  {r:.1%}")
    elif args.mode == "speaker":
        # speaker-ID verifier accuracy on a held-out per-speaker slice —
        # the classifier's honest number, with the recalibrated BN stats the
        # checkpoint carries (train/bn_recal.py), unlike the in-training
        # val_acc readout which uses lagging 0.999-decay moving averages
        import jax
        import numpy as np

        from ..data.timit import TIMIT
        from ..pipeline.verify import load_speaker_model
        from ..train import speaker_eval_step

        params, state, spk_cfg, spk_id_v = load_speaker_model(args.ckpt)
        ds = TIMIT(args.ds_path, feat_cfg, n_timesteps=spk_cfg.n_timesteps,
                   verbose=True)
        ds.build_spec_cache("phn_mfcc_cache.h5py")
        ds.prepare_speaker_dicts(None)
        split = {"split_key": "spk_id", "split_props_v": (0.8, 0.9),
                 "split_type": args.split}
        ev = jax.jit(lambda p, s, x, y: speaker_eval_step(p, s, x, y, cfg=spk_cfg))
        voc_fn = None
        if args.vocoded:
            from ..train.augment import mix_vocoded

            voc_fn = jax.jit(lambda x, k: mix_vocoded(x, feat_cfg, key=k,
                                                      frac=1.0))
        # weight each batch by its size: a smaller final batch must not be
        # over-weighted relative to full batches (acc is a per-batch mean)
        correct, n, n_batches = 0.0, 0, 0
        for _, _, power, cls in ds.speaker_spec_sampler(
                args.batch_size, n_epochs=args.n_epochs,
                ds_filter_d={"split_d": split},
                base_name="phn_mfcc_cache.h5py"):
            if voc_fn is not None:
                power = voc_fn(power, jax.random.PRNGKey(args.seed + n_batches))
            m = ev(params, state, power, cls)
            correct += float(m["acc"]) * power.shape[0]
            n += power.shape[0]
            n_batches += 1
            if n_batches >= args.n_batches:
                break
        acc = correct / n if n else float("nan")
        domain = "vocoded" if args.vocoded else "clean"
        print(f" speaker-ID {args.split} ({domain}) accuracy over {n} windows "
              f"({len(spk_id_v)} classes): {acc:.4f}")
    else:
        from ..data.arctic import ARCTIC
        from .convert import load_decoder_weights

        if not args.enc_ckpt:
            raise SystemExit("decoder eval requires --enc-ckpt")
        dec_cfg = (dec_m.config_from_cfg_d(load_cfg_d(args.dec_cfg))
                   if args.dec_cfg else dec_m.DecoderConfig())
        enc_params, enc_state = load_encoder_weights(args.enc_ckpt, enc_cfg)
        dec_params, dec_state = load_decoder_weights(args.ckpt, dec_cfg)
        ds = ARCTIC(args.ds_path, feat_cfg, n_timesteps=dec_cfg.n_timesteps, verbose=True)
        ds.build_spec_cache()
        sampler = ds.spec_window_sampler(batch_size=args.batch_size, n_epochs=1,
                                         sample_trn=False, prop_val=0.02,
                                         ds_filter_d={"spk_id": args.spk_id})
        loss, mel_l, stft_l, mcd = eval_loss(
            dec_params, dec_state, sampler, enc_params=enc_params,
            enc_state=enc_state, enc_cfg=enc_cfg, dec_cfg=dec_cfg, verbose=True)
        print(f" final: loss={loss:.3f} mel={mel_l:.3f} stft={stft_l:.3f} "
              f"mcd={mcd:.2f}dB")


if __name__ == "__main__":
    main()
