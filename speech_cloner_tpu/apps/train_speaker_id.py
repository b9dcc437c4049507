"""Speaker-ID verifier training: TIMIT power spectrograms -> speaker classes.

CLI rebuild of `python voice_identification.py` (voice_identification.py:46-229):
trains the CNN on power_dB windows with per-speaker 0.8/0.1/0.1 splits and
tracks the best validation accuracy.

  python -m speech_cloner_tpu.apps.train_speaker_id --ds-path /data/TIMIT
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data.timit import TIMIT
from ..models import speaker_id as spk_m
from ..runtime.checkpoint import Checkpointer
from ..runtime.config import feature_config_from_cfg_d, load_cfg_d
from ..train import OptimizerConfig, make_train_state, speaker_eval_step, speaker_train_step
from .train_encoder import DEFAULT_DS_CFG


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ds-path", required=True)
    ap.add_argument("--ds-cfg")
    ap.add_argument("--model-path", default="./spk_ckpt")
    ap.add_argument("--batch-size", type=int, default=32,
                    help="default 32 = reference parity; measured knee is "
                         "128 with --bf16 (6.4k vs 2.0k windows/s: the "
                         "tiny-channel convs\' fixed overhead amortizes to "
                         "B=128 — docs/DESIGN.md batch ladder)")
    ap.add_argument("--n-epochs", type=int, default=1000)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bn-recal", type=int, default=8,
                    help="recalibrate BN moving stats over k train batches "
                         "before each checkpoint save (0 = moving-average only)")
    ap.add_argument("--vocoded-augment", type=float, default=0.5,
                    help="fraction of training windows replaced by their "
                         "on-device Griffin-Lim resynthesis (train/augment.py) "
                         "so the verifier generalizes to converted audio — its "
                         "deployment domain. Default 0.5 per the measured A/B "
                         "(docs/DESIGN.md: vocoded val acc 0.792 vs 0.377 at "
                         "augment 0, clean acc unchanged); 0 = reference "
                         "behavior (voice_identification.py trains clean-only)")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 forward/backward, "
                         "f32 master weights and BN stats (measured 1.77x "
                         "per-step on v5e — docs/DESIGN.md MFU table)")
    ap.add_argument("--vocoded-val", action="store_true",
                    help="also score fully-vocoded validation (always on when "
                         "--vocoded-augment > 0); lets an augment-0 control "
                         "report both domains for an A/B comparison")
    ap.add_argument("--time-fold", type=int, default=1,
                    help="fold k consecutive time frames into conv input "
                         "channels ([400,201,1] -> [400/k,201,k]) — a "
                         "TPU-first alternative to the reference's C_in=1 "
                         "shape pathology (26 of 29 ms is conv HBM "
                         "traffic). A different model; 1 = reference "
                         "architecture and the measured-A/B default: "
                         "fold=4 is 4.1x per step but -4.2/-5.4 pts "
                         "clean/vocoded val acc (docs/DESIGN.md).")
    ap.add_argument("--keep-ckpts", type=int, default=5,
                    help="retain only the newest N checkpoints (best-weight "
                         "saves are ~0.5 GB each at production geometry and "
                         "an improving run writes dozens); 0 = keep all "
                         "(reference Saver max_to_keep=9999 behavior)")
    args = ap.parse_args(argv)

    ds_cfg_d = load_cfg_d(args.ds_cfg) if args.ds_cfg else dict(DEFAULT_DS_CFG)
    feat_cfg = feature_config_from_cfg_d(ds_cfg_d)
    ds = TIMIT(args.ds_path, feat_cfg, n_timesteps=ds_cfg_d.get("n_timesteps", 400),
               verbose=True)
    ds.build_spec_cache("phn_mfcc_cache.h5py")

    n_spk = ds.prepare_speaker_dicts(None)
    cfg = spk_m.SpeakerIdConfig(n_timesteps=ds.n_timesteps,
                                n_features=feat_cfg.n_stft, n_output=n_spk,
                                time_fold=args.time_fold)
    print(f" n_speakers={n_spk}")

    split = {"split_key": "spk_id", "split_props_v": (0.8, 0.9)}
    filt_trn = {"split_d": {**split, "split_type": "trn"}}
    filt_val = {"split_d": {**split, "split_type": "val"}}
    # tiny corpora can leave the 0.8-0.9 val slice empty per speaker; fall
    # back to the train filter so the val stream always yields
    if int(ds.get_ds_filter(filt_val).sum()) < args.batch_size:
        print(" WARNING: val split smaller than a batch; validating on train data")
        filt_val = filt_trn

    params, state = spk_m.init(jax.random.PRNGKey(args.seed), cfg)
    opt_cfg = OptimizerConfig(learning_rate=1e-4)  # voice_identification.py:32
    opt = opt_cfg.make()
    ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(args.seed + 1))

    # bf16 compute (f32 master weights): measured 28.8 -> 16.2 ms/step on
    # v5e — the CNN's conv activations are pure HBM traffic, so halving
    # bytes nearly halves the step (docs/DESIGN.md MFU table)
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    if args.vocoded_augment > 0.0:
        from ..train.augment import mix_vocoded

        # augmentation fused into the train-step dispatch (vmapped fast-GL)
        step = jax.jit(lambda t, x, y, k: speaker_train_step(
            t, mix_vocoded(x, feat_cfg, key=k, frac=args.vocoded_augment),
            y, cfg=cfg, opt_cfg=opt_cfg, opt=opt, compute_dtype=compute_dtype))
    else:
        step = jax.jit(lambda t, x, y, k: speaker_train_step(
            t, x, y, cfg=cfg, opt_cfg=opt_cfg, opt=opt,
            compute_dtype=compute_dtype))
    ev = jax.jit(lambda p, s, x, y: speaker_eval_step(p, s, x, y, cfg=cfg))

    def val_stream():
        while True:
            yield from ds.speaker_spec_sampler(args.batch_size, n_epochs=1,
                                               ds_filter_d=filt_val,
                                               base_name="phn_mfcc_cache.h5py")

    ckpt = Checkpointer(args.model_path, "speaker_id")
    # snapshot the speaker-class mapping so verify_conversion can name classes
    cfg_snapshot = {"n_timesteps": cfg.n_timesteps, "n_features": cfg.n_features,
                    "n_output": cfg.n_output, "time_fold": cfg.time_fold,
                    "spk_id_v": list(ds.all_spk_id_v)}

    # auto-resume from the latest checkpoint (same contract as train/loop.py:
    # the reference required a manual restore(), encoder.py:238-253); the
    # sidecar carries best_val so best-weights tracking survives the restart
    ts, resumed_at = ckpt.restore_into(ts, None)
    resume_best_val = 0.0
    if resumed_at is not None:
        import os as _os

        side = _os.path.join(args.model_path, "speaker_id_cfg_d.json")
        if _os.path.exists(side):
            import json as _json

            with open(side) as f:
                resume_best_val = float(_json.load(f).get("best_val", 0.0))
        print(f" resume: speaker_id step {resumed_at} "
              f"(best_val={resume_best_val:.3f})")
        if args.max_steps is not None and resumed_at >= args.max_steps:
            print(" resume: already at max_steps; nothing to do")
            return

    from ..train.bn_recal import collect_bn_state, make_bn_stat_fn

    bn_stat_fn = make_bn_stat_fn(
        lambda p, s, x, bn_momentum=None: spk_m.apply(
            p, s, x, cfg=cfg, train=True, bn_momentum=bn_momentum)[1])

    if args.vocoded_augment > 0.0:
        from ..train.augment import mix_vocoded

        aug_fn = jax.jit(lambda x, k: mix_vocoded(x, feat_cfg, key=k,
                                                  frac=args.vocoded_augment))
        # fully-vocoded transform for validation: the verifier's deployment
        # domain IS Griffin-Lim-resynthesized audio (it scores conversion
        # output, test.py:160-168), so best-weights selection must see it —
        # a clean-only val metric rates the augmentation as a regression
        # while the deployed verdict improves (round-2 negative result)
        voc_fn = jax.jit(lambda x, k: mix_vocoded(x, feat_cfg, key=k, frac=1.0))
    elif args.vocoded_val:
        from ..train.augment import mix_vocoded

        aug_fn = None
        voc_fn = jax.jit(lambda x, k: mix_vocoded(x, feat_cfg, key=k, frac=1.0))
    else:
        aug_fn = None
        voc_fn = None

    def recal(ts_now):
        """Replace laggy 0.999-decay BN moving stats with averaged batch stats
        before checkpointing (see train/bn_recal.py). With augmentation on,
        the stats are collected over the SAME clean/vocoded mixture the
        training stream sees."""
        if not args.bn_recal:
            return ts_now
        batches = ((p if aug_fn is None
                    else aug_fn(p, jax.random.PRNGKey(910001 + i)),)
                   for i, (_, _, p, c) in enumerate(ds.speaker_spec_sampler(
                       args.batch_size, n_epochs=1, ds_filter_d=filt_trn,
                       base_name="phn_mfcc_cache.h5py")))
        return {**ts_now,
                "model_state": collect_bn_state(bn_stat_fn, ts_now["params"],
                                                ts_now["model_state"], batches,
                                                max_batches=args.bn_recal)}

    val_iter = val_stream()
    best_val, val_hist = resume_best_val, []
    i_step = 0 if resumed_at is None else int(resumed_at)
    # validate every k steps, not every step: a per-step eval + host fetch
    # serializes the dispatch pipeline (the reference evaluated per batch,
    # voice_identification.py:205-215, but also ran eagerly anyway)
    eval_every = 5
    for _ in range(args.n_epochs):
        for mfcc, mel, power, cls in ds.speaker_spec_sampler(
                args.batch_size, n_epochs=1, ds_filter_d=filt_trn,
                base_name="phn_mfcc_cache.h5py"):
            ts, m = step(ts, power, cls, jax.random.PRNGKey(args.seed * 7919 + i_step))
            if i_step % eval_every == 0:
                _, _, vp, vc = next(val_iter)
                vm = ev(ts["params"], ts["model_state"], vp, vc)
                clean_acc = float(vm["acc"])
                if voc_fn is not None:
                    # score the vocoded domain too and select best weights on
                    # the mean: the verifier must classify BOTH raw source
                    # audio and resynthesized conversion output
                    vmv = ev(ts["params"], ts["model_state"],
                             voc_fn(vp, jax.random.PRNGKey(811 + i_step)), vc)
                    voc_acc = float(vmv["acc"])
                    val_hist.append((clean_acc + voc_acc) / 2.0)
                else:
                    voc_acc = None
                    val_hist.append(clean_acc)
            if i_step % 10 == 0:
                extra = (f" val_acc_clean={clean_acc:.3f}"
                         f" val_acc_vocoded={voc_acc:.3f}"
                         if voc_acc is not None else "")
                print(f" - step={i_step} trn_loss={float(m['loss']):.3f} "
                      f"trn_acc={float(m['acc']):.3f} val_acc={val_hist[-1]:.3f}"
                      + extra, flush=True)
            # best-weights tracking over a 10-eval window (voice_identification.py:217-221)
            if (len(val_hist) > 10 and i_step % eval_every == 0
                    and float(np.mean(val_hist[-10:])) > best_val):
                best_val = float(np.mean(val_hist[-10:]))
                ckpt.save(recal(ts), step=i_step,
                          config={**cfg_snapshot, "best_val": best_val})
                if args.keep_ckpts:
                    ckpt.wait()  # the async write must land before trimming
                    import os as _os

                    for s in ckpt.steps()[:-args.keep_ckpts]:
                        _os.remove(ckpt._path(s))
            i_step += 1
            if args.max_steps is not None and i_step >= args.max_steps:
                ckpt.save(recal(ts), step=i_step,
                          config={**cfg_snapshot, "best_val": best_val},
                          sync=True)
                return
    ckpt.save(recal(ts), step=i_step,
              config={**cfg_snapshot, "best_val": best_val}, sync=True)


if __name__ == "__main__":
    main()
