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
import os

import jax
import jax.numpy as jnp

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
    ap.add_argument("--batch-size", type=int, default=32,
                    help="default 32 = reference parity (encoder.py:256-263, "
                         "a CPU-feed_dict choice); measured throughput knee "
                         "is 128 with --bf16 (22.2k vs 6.6k windows/s — "
                         "docs/DESIGN.md batch ladder)")
    ap.add_argument("--n-epochs", type=int, default=99999)
    ap.add_argument("--save-each-n-epochs", type=int, default=3)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-data", type=int, default=0,
                    help="data-parallel mesh size (0 = single device)")
    ap.add_argument("--n-model", type=int, default=1,
                    help="tensor-parallel mesh size (conv banks)")
    ap.add_argument("--bn-recal", type=int, default=8,
                    help="recalibrate BN moving stats over k train batches "
                         "before each validation/save; 0 = reference "
                         "moving-average-only behavior (decay 0.999, which "
                         "lags eval metrics by thousands of steps)")
    ap.add_argument("--steps-per-call", type=int, default=0,
                    help="fuse k optimizer steps into one device dispatch "
                         "(lax.scan; 0 = auto, 1 = off) — amortizes "
                         "per-dispatch latency on remote runtimes")
    ap.add_argument("--loader", choices=("auto", "h5py", "native", "device"),
                    default="auto",
                    help="batch assembly: device = whole corpus resident in "
                         "HBM with on-device window crops (auto default when "
                         "it fits), native = C++ mmap gather (scl_data.cc), "
                         "h5py = per-step reads")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 forward/backward on "
                         "the MXU, f32 master weights/Adam/BN stats/loss")
    ap.add_argument("--fused-gru", action="store_true",
                    help="direction-fused GRU scan: T sequential steps "
                         "instead of 2T (identical math; trades one bigger "
                         "compile for lower scan latency every step)")
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
    if args.fused_gru:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_gru=True)

    ds = TIMIT(args.ds_path, feat_cfg, n_timesteps=cfg.n_timesteps,
               ds_norm=tuple(ds_cfg_d.get("ds_norm", (0.0, 10.0))), verbose=True)
    ds.build_spec_cache("phn_mfcc_cache.h5py")

    import numpy as np

    use_device = use_native = False
    # padded footprint: DeviceWindows pads every utterance to the corpus max
    frames_v = [len(w) // feat_cfg.hop_length + 1 for w in ds.ds["wav"]]
    est_bytes = 4 * (feat_cfg.input_dim + 61) * \
        len(frames_v) * max(frames_v, default=0)
    if args.loader == "device" or (args.loader == "auto" and est_bytes < 4e9):
        use_device = True
    elif args.loader != "h5py":
        from ..data.packed_cache import ensure_native

        use_native = ensure_native() is not None
        if args.loader == "native" and not use_native:
            raise SystemExit("error: --loader native but libscl_data.so "
                             "could not be built")
    if use_native:
        pack_path = ds.build_packed_cache("phn_mfcc_cache.h5py")
        print(f" native loader: {pack_path}")

    bind = ()
    dw = None
    if use_device:
        from ..data.device_dataset import from_h5

        all_idx = np.arange(len(ds.ds["wav"]))
        dw = from_h5(ds.spec_cache_path("phn_mfcc_cache.h5py"),
                     ("mfcc", "phn"), all_idx, cfg.n_timesteps)
        bind = tuple(dw.streams)
        print(f" device-resident dataset: {dw.nbytes / 1e6:.0f} MB")

    def window_batches(ds_filter_d):
        """(mfcc, phn) window batches — or (utt, start) index batches when the
        dataset is device-resident; native mmap gather otherwise
        (streams 0=mfcc, 3=phn in the .sclpack mirror)."""
        if use_device:
            def gen():
                samples = np.flatnonzero(ds.get_ds_filter(ds_filter_d))
                # skip_short semantics of window_sampler (TIMIT_reader.py:474)
                samples = samples[dw.n_frames[samples] > cfg.n_timesteps]
                yield from dw.index_sampler(samples, args.batch_size,
                                            n_epochs=1, rng=ds.rng)
            return gen
        if not use_native:
            return lambda: ds.window_sampler(
                batch_size=args.batch_size, n_epochs=1,
                ds_filter_d=ds_filter_d, base_name="phn_mfcc_cache.h5py")

        def gen():
            from ..data.packed_cache import PackedReader, packed_window_sampler

            reader = PackedReader(pack_path, n_threads=8)
            try:
                samples = np.flatnonzero(ds.get_ds_filter(ds_filter_d))
                samples = samples[reader.n_frames[samples] > cfg.n_timesteps]
                yield from packed_window_sampler(
                    reader, batch_size=args.batch_size,
                    n_timesteps=cfg.n_timesteps, streams=(0, 3),
                    samples=samples, n_epochs=1, rng=ds.rng)
            finally:
                reader.close()
        return gen

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

    compute_dtype = jnp.bfloat16 if args.bf16 else None

    def _train_step(t, x, y):
        return encoder_train_step(t, x, y, cfg=cfg, opt_cfg=opt_cfg, opt=opt,
                                  compute_dtype=compute_dtype)

    def _eval_step(t, x, y):
        return encoder_eval_step(t["params"], t["model_state"], x, y, cfg=cfg)

    def _bn_state(p, s, x, y, bn_momentum=None):
        return enc_m.apply(p, s, x, cfg=cfg, train=True,
                           rng=jax.random.PRNGKey(0),
                           bn_momentum=bn_momentum)[1]

    if use_device:
        from ..data.device_dataset import gather_windows

        def with_gather(fn):
            return lambda t, u, st, *streams: fn(
                t, *gather_windows(streams, u, st, cfg.n_timesteps))

        step = jax.jit(with_gather(_train_step))
        ev = jax.jit(with_gather(_eval_step))
        bn_stat_base = lambda p, s, u, st, *streams, bn_momentum=None: _bn_state(
            p, s, *gather_windows(streams, u, st, cfg.n_timesteps),
            bn_momentum=bn_momentum)
        gather_jit = jax.jit(lambda u, st, *streams: gather_windows(
            streams, u, st, cfg.n_timesteps))

        def host_batches(ds_filter_d):
            """Gathered (mfcc, phn) numpy batches for host-side evaluators."""
            for u, st in window_batches(ds_filter_d)():
                yield tuple(np.asarray(a) for a in gather_jit(u, st, *dw.streams))

        def bn_batches():
            return ((u, st, *dw.streams)
                    for u, st in window_batches({"ds_type": "TRAIN"})())
    else:
        step = jax.jit(_train_step)
        ev = jax.jit(_eval_step)
        bn_stat_base = _bn_state

        def host_batches(ds_filter_d):
            yield from window_batches(ds_filter_d)()

        def bn_batches():
            return window_batches({"ds_type": "TRAIN"})()

    # jitted once — a fresh jit per save costs a full remote compile here
    from ..train.bn_recal import collect_bn_state, make_bn_stat_fn

    bn_stat_fn = make_bn_stat_fn(bn_stat_base)

    def bn_recalibrate(ts_now):
        new_state = collect_bn_state(bn_stat_fn, ts_now["params"],
                                     ts_now["model_state"], bn_batches(),
                                     max_batches=args.bn_recal)
        return {**ts_now, "model_state": new_state}

    def confusion_artifact(ts_now, step_now):
        """Validation confusion matrix at save cadence — the reference's
        TensorBoard confusion image (encoder.py:152-158) as an .npy artifact
        plus a top-confused-pairs line."""
        from ..train.evaluate import eval_confusion, top_confusions

        sampler = host_batches({"ds_type": "TEST"})
        cm = eval_confusion(ts_now["params"], ts_now["model_state"], sampler,
                            cfg=cfg, max_batches=8)
        # plain npy dump — a MetricsWriter here would open (and leak) another
        # append handle to the val.jsonl the run_training writer already owns
        np.save(os.path.join(args.log_dir, f"confusion_{int(step_now)}.npy"),
                np.asarray(cm))
        pairs = top_confusions(cm, ds.idx2phn, k=5)
        if pairs:
            print("   top confusions: " + ", ".join(
                f"{t}->{p} ({n}, {r:.0%})" for t, p, n, r in pairs))

    run_training(
        ts,
        train_batches=window_batches({"ds_type": "TRAIN"}),
        val_batches=window_batches({"ds_type": "TEST"}),
        train_step=step,
        eval_step=ev,
        loop_cfg=LoopConfig(n_epochs=args.n_epochs, steps_per_epoch=steps_per_epoch,
                            save_each_n_epochs=args.save_each_n_epochs,
                            steps_per_call=args.steps_per_call,
                            max_steps=args.max_steps, batch_sharding=batch_shard,
                            bind_args=bind),
        ckpt=Checkpointer(args.model_path, "encoder"),
        log_dir=args.log_dir,
        config_snapshot={"ds": ds_cfg_d, "model": json.loads(json.dumps(
            cfg, default=lambda o: o.__dict__))},
        artifact_fn=confusion_artifact,
        pre_eval_fn=bn_recalibrate if args.bn_recal else None,
    )


if __name__ == "__main__":
    main()
