"""Encoder training app: TIMIT -> phoneme-posterior encoder.

CLI rebuild of `python encoder.py` (encoder.py:392-495), non-interactive.

  python -m speech_cloner_tpu.apps.train_encoder \
      --ds-path /data/TIMIT --model-path ./enc_ckpt \
      [--enc-cfg hp/encoder_cfg_d.json --ds-cfg hp/ds_enc_cfg_d.json]

Reference-format hp/*.json configs are accepted directly; defaults mirror
the shipped production config (enc_14).
"""

from __future__ import annotations

import argparse
import json

import jax

from ..data.timit import TIMIT
from ..models import encoder as enc_m
from ..runtime.checkpoint import Checkpointer
from ..runtime.config import feature_config_from_cfg_d, load_cfg_d
from ..train import OptimizerConfig, encoder_eval_step, encoder_train_step, make_train_state
from ..train.loop import LoopConfig, run_training

DEFAULT_DS_CFG = {
    "sample_rate": 16000, "pre_emphasis": 0.97, "hop_length_ms": 5.0,
    "win_length_ms": 25.0, "n_timesteps": 400, "n_mels": 80, "n_mfcc": 40,
    "n_fft": None, "window": "hann", "mfcc_normaleze_first_mfcc": True,
    "mfcc_norm_factor": 0.01, "calc_mfcc_derivate": True,
    "M_dB_norm_factor": 0.01, "P_dB_norm_factor": 0.01,
    "mean_abs_amp_norm": 0.003, "clip_output": True, "ds_norm": (0.0, 10.0),
}


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ds-path", required=True)
    ap.add_argument("--model-path", default="./enc_ckpt")
    ap.add_argument("--log-dir", default="./enc_stats_dir")
    ap.add_argument("--enc-cfg", help="reference-format encoder cfg json")
    ap.add_argument("--ds-cfg", help="reference-format ds cfg json")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--n-epochs", type=int, default=99999)
    ap.add_argument("--save-each-n-epochs", type=int, default=3)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-data", type=int, default=0,
                    help="data-parallel mesh size (0 = single device)")
    ap.add_argument("--n-model", type=int, default=1,
                    help="tensor-parallel mesh size (conv banks)")
    args = ap.parse_args(argv)

    ds_cfg_d = load_cfg_d(args.ds_cfg) if args.ds_cfg else dict(DEFAULT_DS_CFG)
    feat_cfg = feature_config_from_cfg_d(ds_cfg_d)
    if args.enc_cfg:
        enc_cfg_d = load_cfg_d(args.enc_cfg)
        cfg = enc_m.config_from_cfg_d(enc_cfg_d)
        opt_cfg = OptimizerConfig(
            learning_rate=enc_cfg_d.get("learning_rate", 1e-3),
            decay=enc_cfg_d.get("decay", 1e-3),
            beta1=enc_cfg_d.get("beta1", 0.9), beta2=enc_cfg_d.get("beta2", 0.999),
            epsilon=enc_cfg_d.get("epsilon", 1e-8))
    else:
        cfg = enc_m.EncoderConfig(n_timesteps=ds_cfg_d["n_timesteps"],
                                  input_dim=feat_cfg.input_dim)
        opt_cfg = OptimizerConfig()

    ds = TIMIT(args.ds_path, feat_cfg, n_timesteps=cfg.n_timesteps,
               ds_norm=tuple(ds_cfg_d.get("ds_norm", (0.0, 10.0))), verbose=True)
    ds.build_spec_cache("phn_mfcc_cache.h5py")

    n_trn = int(ds.get_ds_filter({"ds_type": "TRAIN"}).sum())
    steps_per_epoch = max(n_trn // args.batch_size, 1)
    print(f" n_samples_trn={n_trn}  steps/epoch={steps_per_epoch}")

    params, state = enc_m.init(jax.random.PRNGKey(args.seed), cfg)
    ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(args.seed + 1))
    opt = opt_cfg.make()

    batch_shard = None
    if args.n_data:
        from ..parallel import batch_sharding, make_mesh, shard_params, shard_state

        mesh = make_mesh(n_data=args.n_data, n_model=args.n_model)
        mesh.__enter__()  # stays active for the run
        ts = {**ts, "params": shard_params(ts["params"], mesh),
              "model_state": shard_state(ts["model_state"], mesh)}
        batch_shard = batch_sharding(mesh)
        print(f" mesh: data={args.n_data} model={args.n_model}")

    step = jax.jit(lambda t, x, y: encoder_train_step(t, x, y, cfg=cfg,
                                                      opt_cfg=opt_cfg, opt=opt))
    ev = jax.jit(lambda t, x, y: encoder_eval_step(t["params"], t["model_state"],
                                                   x, y, cfg=cfg))

    def confusion_artifact(ts_now, step_now):
        """Validation confusion matrix at save cadence — the reference's
        TensorBoard confusion image (encoder.py:152-158) as an .npy artifact
        plus a top-confused-pairs line."""
        from ..runtime.logging import MetricsWriter
        from ..train.evaluate import eval_confusion, top_confusions

        sampler = ds.window_sampler(batch_size=args.batch_size, n_epochs=1,
                                    ds_filter_d={"ds_type": "TEST"},
                                    base_name="phn_mfcc_cache.h5py")
        cm = eval_confusion(ts_now["params"], ts_now["model_state"], sampler,
                            cfg=cfg, max_batches=8)
        MetricsWriter(args.log_dir, "val").write_array(step_now, "confusion", cm)
        pairs = top_confusions(cm, ds.idx2phn, k=5)
        if pairs:
            print("   top confusions: " + ", ".join(
                f"{t}->{p} ({n}, {r:.0%})" for t, p, n, r in pairs))

    run_training(
        ts,
        train_batches=lambda: ds.window_sampler(
            batch_size=args.batch_size, n_epochs=1,
            ds_filter_d={"ds_type": "TRAIN"}, base_name="phn_mfcc_cache.h5py"),
        val_batches=lambda: ds.window_sampler(
            batch_size=args.batch_size, n_epochs=1,
            ds_filter_d={"ds_type": "TEST"}, base_name="phn_mfcc_cache.h5py"),
        train_step=step,
        eval_step=ev,
        loop_cfg=LoopConfig(n_epochs=args.n_epochs, steps_per_epoch=steps_per_epoch,
                            save_each_n_epochs=args.save_each_n_epochs,
                            max_steps=args.max_steps, batch_sharding=batch_shard),
        ckpt=Checkpointer(args.model_path, "encoder"),
        log_dir=args.log_dir,
        config_snapshot={"ds": ds_cfg_d, "model": json.loads(json.dumps(
            cfg, default=lambda o: o.__dict__))},
        artifact_fn=confusion_artifact,
    )


if __name__ == "__main__":
    main()
