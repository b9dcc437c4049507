"""Joint training runner: encoder (TIMIT) -> decoder (target corpus) ->
speaker-ID verifier -> clone demo + verification, end to end in one command.

Stage 4 (--demo, arctic targets only) runs the reference's TESTS 1-3
(test.py:336-413) with the just-trained weights and the speaker-ID
posterior-shift verdict, writing audio/spectrogram artifacts under
<work-dir>/demo (see apps/clone_demo.py).

This is BASELINE.json config 5 ("joint training run: encoder on TIMIT +
decoder on TARGET_spk reader with voice_identification eval") as a single
orchestrated pipeline over the stage apps:

  python -m speech_cloner_tpu.apps.train_full \
      --timit-path /data/TIMIT \
      --target-path /data/ARCTIC/cmu_arctic --target-kind arctic --spk-id slt \
      --work-dir ./run1 [--enc-steps N --dec-steps N --spk-steps N]

Each stage checkpoints under --work-dir and auto-resumes, so the command is
restartable at any point (the reference required manually running three
scripts with interactive prompts in the right order).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ._platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--timit-path", required=True)
    ap.add_argument("--target-path", required=True)
    ap.add_argument("--target-kind", choices=("arctic", "target"), default="arctic")
    ap.add_argument("--spk-id", default="slt")
    ap.add_argument("--work-dir", default="./train_full")
    ap.add_argument("--ds-cfg")
    ap.add_argument("--enc-cfg")
    ap.add_argument("--dec-cfg")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--enc-steps", type=int, default=None)
    ap.add_argument("--dec-steps", type=int, default=None)
    ap.add_argument("--spk-steps", type=int, default=None)
    ap.add_argument("--spk-vocoded-augment", type=float, default=0.5,
                    help="stage-3 vocoded-augmentation fraction "
                         "(train_speaker_id --vocoded-augment; default 0.5 "
                         "per the measured A/B in docs/DESIGN.md)")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training for stages 1-3 "
                         "(--bf16 on the encoder/decoder/speaker trainers)")
    ap.add_argument("--enc-epochs", type=int, default=50)
    ap.add_argument("--dec-epochs", type=int, default=300)
    ap.add_argument("--dec-prop-val", type=float, default=0.02)
    ap.add_argument("--dec-save-epochs", type=int, default=10,
                    help="decoder save/validate cadence (big ckpts on a slow "
                         "link make frequent saves the dominant cost)")
    ap.add_argument("--demo", action="store_true",
                    help="stage 4: TESTS 1-3 clone demo + speaker-ID verdict")
    ap.add_argument("--demo-source-spk", default="bdl")
    ap.add_argument("--target-timit-spk",
                    help="target voice's class name in the speaker-ID model "
                         "(TIMIT spk_id, e.g. SLT0)")
    ap.add_argument("--n-iter", type=int, default=200)
    ap.add_argument("--in-process", action="store_true",
                    help="run stages in this process instead of subprocesses "
                         "(default: one subprocess per stage — device state "
                         "from a finished stage measurably slows later ones)")
    args = ap.parse_args(argv)

    def run_stage(module: str, stage_args: list[str]):
        if args.in_process:
            import importlib

            importlib.import_module(f"speech_cloner_tpu.apps.{module}").main(stage_args)
        else:
            import subprocess
            import sys

            subprocess.run([sys.executable, "-m",
                            f"speech_cloner_tpu.apps.{module}"] + stage_args,
                           check=True)

    os.makedirs(args.work_dir, exist_ok=True)
    enc_path = os.path.join(args.work_dir, "enc_ckpt")
    dec_path = os.path.join(args.work_dir, "dec_ckpt")
    spk_path = os.path.join(args.work_dir, "spk_ckpt")

    common_ds = ["--ds-cfg", args.ds_cfg] if args.ds_cfg else []

    n_stages = 4 if args.demo else 3

    # stage 1: phoneme encoder on TIMIT (encoder.py __main__ equivalent)
    print(f"=== stage 1/{n_stages}: encoder on TIMIT ===", flush=True)
    enc_args = ["--ds-path", args.timit_path, "--model-path", enc_path,
                "--log-dir", os.path.join(args.work_dir, "enc_logs"),
                "--batch-size", str(args.batch_size),
                "--n-epochs", str(args.enc_epochs)] + common_ds
    if args.enc_cfg:
        enc_args += ["--enc-cfg", args.enc_cfg]
    if args.enc_steps is not None:
        enc_args += ["--max-steps", str(args.enc_steps)]
    if args.bf16:
        enc_args += ["--bf16"]
    run_stage("train_encoder", enc_args)

    # stage 2: target-speaker decoder against the frozen stage-1 encoder
    print(f"=== stage 2/{n_stages}: decoder on target corpus ===", flush=True)
    dec_args = ["--ds-path", args.target_path, "--ds-kind", args.target_kind,
                "--spk-id", args.spk_id, "--enc-ckpt", enc_path,
                "--model-path", dec_path,
                "--log-dir", os.path.join(args.work_dir, "dec_logs"),
                "--batch-size", str(args.batch_size),
                "--prop-val", str(args.dec_prop_val),
                "--save-each-n-epochs", str(args.dec_save_epochs),
                "--n-epochs", str(args.dec_epochs)] + common_ds
    if args.enc_cfg:
        dec_args += ["--enc-cfg", args.enc_cfg]
    if args.dec_cfg:
        dec_args += ["--dec-cfg", args.dec_cfg]
    if args.dec_steps is not None:
        dec_args += ["--max-steps", str(args.dec_steps)]
    if args.bf16:
        dec_args += ["--bf16"]
    run_stage("train_decoder", dec_args)

    # stage 3: speaker-ID verifier (voice_identification.py equivalent)
    print(f"=== stage 3/{n_stages}: speaker-ID verifier on TIMIT ===", flush=True)
    spk_args = ["--ds-path", args.timit_path, "--model-path", spk_path,
                "--batch-size", str(args.batch_size)] + common_ds
    if args.spk_steps is not None:
        spk_args += ["--max-steps", str(args.spk_steps)]
    # always forward the value: the child CLI's own default is 0.5, so an
    # explicit --spk-vocoded-augment 0 must reach it to mean "off"
    spk_args += ["--vocoded-augment", str(args.spk_vocoded_augment)]
    if args.bf16:
        spk_args += ["--bf16"]
    run_stage("train_speaker_id", spk_args)

    # stage 4: clone demo (TESTS 1-3) + speaker-ID verification
    if args.demo:
        if args.target_kind != "arctic":
            raise SystemExit("--demo requires --target-kind arctic "
                             "(needs a multi-speaker labeled target corpus)")
        print(f"=== stage 4/{n_stages}: clone demo + verification ===", flush=True)
        demo_args = ["--target-path", args.target_path, "--spk-id", args.spk_id,
                     "--source-spk", args.demo_source_spk,
                     "--enc-ckpt", enc_path, "--dec-ckpt", dec_path,
                     "--spk-ckpt", spk_path,
                     "--out-dir", os.path.join(args.work_dir, "demo"),
                     "--n-iter", str(args.n_iter)] + common_ds
        if args.enc_cfg:
            demo_args += ["--enc-cfg", args.enc_cfg]
        if args.dec_cfg:
            demo_args += ["--dec-cfg", args.dec_cfg]
        if args.target_timit_spk:
            demo_args += ["--target-timit-spk", args.target_timit_spk]
        run_stage("clone_demo", demo_args)

    print(f"=== done: checkpoints under {args.work_dir} ===")
    print(f"convert with: python -m speech_cloner_tpu.apps.convert "
          f"--enc-ckpt {enc_path} --dec-ckpt {dec_path} --input <audio> "
          f"[--verify-ckpt {spk_path}]")


if __name__ == "__main__":
    main()
