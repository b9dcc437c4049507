"""Decoder training app: frozen encoder + target-speaker dataset -> decoder.

CLI rebuild of `python decoder.py` (decoder.py:497-656), non-interactive.

  python -m speech_cloner_tpu.apps.train_decoder \
      --ds-path /data/ARCTIC/cmu_arctic --spk-id slt \
      --enc-ckpt /root/reference/enc_14_ckpt/encoder-136512 \
      [--ds-kind arctic|target --dec-cfg hp/decoder_cfg_d.json]

--enc-ckpt accepts either a reference TF checkpoint prefix or a directory of
our own encoder .npz checkpoints.
"""

from __future__ import annotations

import argparse
import os

import jax

from ..models import decoder as dec_m
from ..models import encoder as enc_m
from ..runtime.checkpoint import Checkpointer
from ..runtime.config import feature_config_from_cfg_d, load_cfg_d
from ..train import (
    DecoderLossConfig,
    OptimizerConfig,
    decoder_eval_step,
    decoder_train_step,
    make_train_state,
)
from ..train.loop import LoopConfig, run_training
from .train_encoder import DEFAULT_DS_CFG


def load_encoder_weights(path: str, cfg: enc_m.EncoderConfig):
    """TF ckpt prefix (file pair) or our Checkpointer directory."""
    if os.path.exists(path + ".index"):
        from ..runtime.tf_import import load_tf_encoder

        return load_tf_encoder(path, cfg)
    ck = Checkpointer(path, "encoder")
    tree, step = ck.restore()
    if tree is None:
        raise SystemExit(f"error: no encoder checkpoint found under {path} "
                         f"(expected encoder-<step>.npz or a TF <prefix>.index)")
    print(f" encoder restored from step {step}")
    return tree["params"], tree["model_state"]


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ds-path", required=True)
    ap.add_argument("--ds-kind", choices=("arctic", "target"), default="arctic")
    ap.add_argument("--spk-id", default="slt")
    ap.add_argument("--enc-ckpt", required=True)
    ap.add_argument("--enc-cfg", help="reference-format encoder cfg json")
    ap.add_argument("--dec-cfg", help="reference-format decoder cfg json")
    ap.add_argument("--ds-cfg", help="reference-format ds cfg json")
    ap.add_argument("--model-path", default="./dec_ckpt")
    ap.add_argument("--log-dir", default="./dec_stats_dir")
    ap.add_argument("--batch-size", type=int, default=32,
                    help="default 32 = reference parity; the decoder step is "
                         "MXU-bound at 45%% MFU so batch buys ~nothing "
                         "(ladder: 810-897 windows/s flat across 32-512 — "
                         "docs/DESIGN.md); 32-64 recommended")
    ap.add_argument("--n-epochs", type=int, default=99999)
    ap.add_argument("--save-each-n-epochs", type=int, default=10)
    ap.add_argument("--prop-val", type=float, default=0.02)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bn-recal", type=int, default=8,
                    help="recalibrate BN moving stats over k train batches "
                         "before each validation/save (0 = reference behavior)")
    ap.add_argument("--steps-per-call", type=int, default=0,
                    help="fuse k optimizer steps into one device dispatch "
                         "(lax.scan; 0 = auto, 1 = off) — amortizes "
                         "per-dispatch latency on remote runtimes")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 forward/backward on "
                         "the MXU, f32 master weights/Adam/BN stats/loss")
    ap.add_argument("--fused-gru", action="store_true",
                    help="direction-fused GRU scan: T sequential steps "
                         "instead of 2T (identical math; trades one bigger "
                         "compile for lower scan latency every step)")
    ap.add_argument("--loader", choices=("auto", "h5py", "native", "device"),
                    default="auto",
                    help="batch assembly: device = whole corpus resident in "
                         "HBM with on-device window crops (auto default when "
                         "it fits), native = C++ mmap gather, h5py = per-step "
                         "reads")
    args = ap.parse_args(argv)

    ds_cfg_d = load_cfg_d(args.ds_cfg) if args.ds_cfg else dict(DEFAULT_DS_CFG)
    feat_cfg = feature_config_from_cfg_d(ds_cfg_d)

    enc_cfg = (enc_m.config_from_cfg_d(load_cfg_d(args.enc_cfg))
               if args.enc_cfg else enc_m.EncoderConfig())
    enc_params, enc_state = load_encoder_weights(args.enc_ckpt, enc_cfg)

    if args.dec_cfg:
        dec_cfg_d = load_cfg_d(args.dec_cfg)
        cfg = dec_m.config_from_cfg_d(dec_cfg_d)
        opt_cfg = OptimizerConfig(
            learning_rate=dec_cfg_d.get("learning_rate", 1e-3),
            decay=dec_cfg_d.get("decay", 1e-3))
        loss_cfg = DecoderLossConfig(
            mel_loss_weight=dec_cfg_d.get("mel_loss_weight", 400),
            stft_loss_weight=dec_cfg_d.get("stft_loss_weight", 400),
            loss_type=dec_cfg_d.get("loss_type", "sum"))
    else:
        cfg = dec_m.DecoderConfig(n_timesteps=enc_cfg.n_timesteps,
                                  input_dim=enc_cfg.n_output)
        opt_cfg = OptimizerConfig()
        loss_cfg = DecoderLossConfig()
    if args.fused_gru:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            step1=dataclasses.replace(cfg.step1, fused_gru=True),
            step2=dataclasses.replace(cfg.step2, fused_gru=True))
        enc_cfg = dataclasses.replace(enc_cfg, fused_gru=True)

    if args.ds_kind == "arctic":
        from ..data.arctic import ARCTIC

        ds = ARCTIC(args.ds_path, feat_cfg, n_timesteps=cfg.n_timesteps, verbose=True)
        ds_filter_d = {"spk_id": args.spk_id}
    else:
        from ..data.target_spk import TargetSpeaker

        ds = TargetSpeaker(args.ds_path, feat_cfg, n_timesteps=cfg.n_timesteps, verbose=True)
        ds_filter_d = None
    ds.build_spec_cache()

    import numpy as np

    f = ds.get_ds_filter(ds_filter_d) if ds_filter_d else np.ones(
        len(ds.ds["wav"]), bool)

    if args.ds_kind == "target":
        # TARGET_spk semantics: one file per batch (batch_size crops from
        # it), so an epoch is one pass over the window-eligible files
        trn_utt = ds._val_split(np.flatnonzero(f), args.prop_val, True)
        steps_per_epoch = max(sum(
            1 for i in trn_utt
            if len(ds.ds["wav"][i]) // feat_cfg.hop_length + 1 > cfg.n_timesteps), 1)
        print(f" n_files_trn={len(trn_utt)}  steps/epoch={steps_per_epoch}")
    else:
        n_trn = ds.get_n_windows(args.prop_val, ds_filter_d)[0]
        steps_per_epoch = max(n_trn // args.batch_size, 1)
        print(f" n_windows_trn={n_trn}  steps/epoch={steps_per_epoch}")

    # a val split too small to yield a batch would hang the loop; validate
    # on train data instead (the reference's split had the same failure
    # mode silently — sound_ds.py:268-283). For target-kind corpora one
    # val FILE suffices (each batch is crops of a single file).
    n_val_utts = len(ds._val_split(np.flatnonzero(f), args.prop_val, False))
    val_needs = 1 if args.ds_kind == "target" else args.batch_size
    val_sample_trn = False
    if n_val_utts < val_needs:
        print(f" WARNING: val split has {n_val_utts} utterances "
              f"(< {val_needs} needed); validating on train data")
        val_sample_trn = True

    params, state = dec_m.init(jax.random.PRNGKey(args.seed), cfg)
    ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(args.seed + 1))
    opt = opt_cfg.make()

    T = cfg.n_timesteps

    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if args.bf16 else None

    def _train_step(t, mfcc, mel, stft):
        return decoder_train_step(
            t, mfcc, mel, stft, enc_params=enc_params, enc_state=enc_state,
            enc_cfg=enc_cfg, cfg=cfg, loss_cfg=loss_cfg, opt_cfg=opt_cfg, opt=opt,
            compute_dtype=compute_dtype)

    def _eval_step(t, mfcc, mel, stft):
        return decoder_eval_step(
            t["params"], t["model_state"], mfcc, mel, stft,
            enc_params=enc_params, enc_state=enc_state, enc_cfg=enc_cfg,
            cfg=cfg, loss_cfg=loss_cfg)

    def _bn_state(p, s, mfcc, mel, stft, bn_momentum=None):
        return dec_m.apply(
            p, s, enc_m.posteriors(
                enc_m.apply(enc_params, enc_state, mfcc, cfg=enc_cfg,
                            train=False)[0]),
            cfg=cfg, train=True, rng=jax.random.PRNGKey(0),
            bn_momentum=bn_momentum)[2]

    # ------------------------------------------------------------- loaders ---
    # device: whole filtered corpus resident in HBM, windows cropped on
    # device, per-step transfer = two int32 vectors. native: C++ mmap gather.
    use_device = use_native = False
    # DeviceWindows pads every utterance to the corpus max length, so the
    # footprint is n_utts * F_max * C — NOT the sum of actual frames (one
    # long clip among short ones inflates the real buffers many-fold)
    frames_v = [len(w) // feat_cfg.hop_length + 1 for w in ds.ds["wav"][f]]
    est_bytes = 4 * (feat_cfg.input_dim + feat_cfg.n_mels + feat_cfg.n_stft) * \
        len(frames_v) * max(frames_v, default=0)
    if args.loader == "device" or (args.loader == "auto" and est_bytes < 4e9):
        use_device = True
    elif args.loader != "h5py":
        from ..data.packed_cache import ensure_native

        use_native = ensure_native() is not None
        if args.loader == "native" and not use_native:
            raise SystemExit("error: --loader native but libscl_data.so "
                             "could not be built")

    bind = ()
    if use_device:
        from ..data.device_dataset import from_h5, gather_windows

        all_idx = np.flatnonzero(f)
        dw = from_h5(ds.spec_cache_path(), ("mfcc", "mel_dB", "power_dB"),
                     all_idx, T)
        bind = tuple(dw.streams)
        print(f" device-resident dataset: {dw.nbytes / 1e6:.0f} MB, "
              f"{len(all_idx)} utterances")
        pos_of = {int(o): p for p, o in enumerate(all_idx)}

        def positions(sample_trn):
            idx = ds._val_split(all_idx, args.prop_val, sample_trn)
            return np.asarray([pos_of[int(i)] for i in idx], np.int32)

        trn_pos = positions(True)
        val_pos = trn_pos if val_sample_trn else positions(False)

        sampler_fn = (dw.file_batch_sampler if args.ds_kind == "target"
                      else dw.index_sampler)

        def batches(sample_trn):
            p = trn_pos if sample_trn else val_pos

            def gen():
                yield from sampler_fn(p, args.batch_size, n_epochs=1,
                                      rng=ds.rng)
            return gen

        def with_gather(fn):
            return lambda t, u, st, *streams: fn(
                t, *gather_windows(streams, u, st, T))

        step = jax.jit(with_gather(_train_step))
        ev = jax.jit(with_gather(_eval_step))
        bn_stat_base = lambda p, s, u, st, *streams, bn_momentum=None: _bn_state(
            p, s, *gather_windows(streams, u, st, T), bn_momentum=bn_momentum)

        def bn_batches():
            return ((u, st, *dw.streams) for u, st in batches(True)())

        gather_jit = jax.jit(lambda u, st, *streams: gather_windows(
            streams, u, st, T))

        def fetch_batch(sample_trn):
            u, st = next(iter(batches(sample_trn)()))
            return [np.asarray(a) for a in gather_jit(u, st, *dw.streams)]
    else:
        def batches(sample_trn):
            kw = dict(batch_size=args.batch_size, n_epochs=1,
                      sample_trn=sample_trn, prop_val=args.prop_val,
                      **({"ds_filter_d": ds_filter_d}
                         if ds_filter_d is not None else {}))
            sampler = (ds.packed_spec_window_sampler if use_native
                       else ds.spec_window_sampler)

            def gen():
                yield from sampler(**kw)
            return gen

        step = jax.jit(_train_step)
        ev = jax.jit(_eval_step)
        bn_stat_base = _bn_state
        bn_batches = batches(True)

        def fetch_batch(sample_trn):
            return list(next(iter(batches(sample_trn)()))[:3])

    # jitted once — a fresh jit (or an eager forward) per save costs a full
    # remote compile / op-by-op dispatch on this runtime
    from ..train.bn_recal import collect_bn_state, make_bn_stat_fn

    bn_stat_fn = make_bn_stat_fn(bn_stat_base)

    def bn_recalibrate(ts_now):
        new_state = collect_bn_state(bn_stat_fn, ts_now["params"],
                                     ts_now["model_state"], bn_batches(),
                                     max_batches=args.bn_recal)
        return {**ts_now, "model_state": new_state}

    artifact_fwd = jax.jit(lambda p, s, mfcc: dec_m.apply(
        p, s, enc_m.posteriors(enc_m.apply(enc_params, enc_state, mfcc,
                                           cfg=enc_cfg, train=False)[0]),
        cfg=cfg, train=False)[:2])

    def spec_artifacts(ts_now, step_now):
        """Dump a val-batch true/pred spectrogram comparison png, the TB-image
        analog of decoder.py:209-221."""
        try:
            mfcc, mel, stft = fetch_batch(False)
        except StopIteration:
            return
        y_mel, y_stft = artifact_fwd(ts_now["params"], ts_now["model_state"],
                                     mfcc[:1])
        from ..data.viz import spec_comparison

        spec_comparison(mel[0], y_mel[0], stft[0], y_stft[0],
                        save_path=os.path.join(args.log_dir, f"spec_{step_now}.png"))

    run_training(
        ts,
        train_batches=batches(True),
        val_batches=batches(True) if val_sample_trn else batches(False),
        train_step=step,
        eval_step=ev,
        loop_cfg=LoopConfig(n_epochs=args.n_epochs, steps_per_epoch=steps_per_epoch,
                            save_each_n_epochs=args.save_each_n_epochs,
                            steps_per_call=args.steps_per_call,
                            max_steps=args.max_steps, bind_args=bind),
        ckpt=Checkpointer(args.model_path, "decoder"),
        log_dir=args.log_dir,
        config_snapshot={"ds": ds_cfg_d},
        artifact_fn=spec_artifacts,
        pre_eval_fn=bn_recalibrate if args.bn_recal else None,
    )


if __name__ == "__main__":
    main()
