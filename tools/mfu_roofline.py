"""MFU / roofline accounting for the production train steps (VERDICT item 9).

Compiles the production-geometry encoder and decoder train steps and asks XLA
for the per-step FLOP and byte counts, then relates measured step times (from
the TPU runs recorded in docs/DESIGN.md) to TPU v5e peaks to locate the
binding constraint: MXU FLOPs, HBM bandwidth, or scan latency.

Run (CPU, compile-only — no TPU needed):
  python tools/mfu_roofline.py [--enc-ms 34.2 --dec-ms 81 --spk-ms 0]

Measured step times come from tools/step_timing_probe.py on the chip
(chained dispatch, no host sync between steps).

v5e peaks used: 197 TFLOP/s bf16 MXU, ~49 TFLOP/s for f32-accumulated f32
matmuls (4 bf16 passes), 819 GB/s HBM (public chip specs).
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

V5E_BF16 = 197e12
V5E_F32 = 49e12     # MXU f32 throughput (bf16x3/x4 decomposition)
V5E_HBM = 819e9


def _analyze(name, fn, args, step_ms):
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))
    t = step_ms / 1e3
    print(f"{name}:")
    print(f"  XLA flops/step:   {flops / 1e9:8.2f} GFLOP")
    print(f"  XLA bytes/step:   {bytes_ / 1e6:8.1f} MB (CPU-lowering estimate)")
    print(f"  measured step:    {step_ms:.1f} ms")
    print(f"  achieved:         {flops / t / 1e12:6.2f} TFLOP/s")
    print(f"  MFU vs f32 peak:  {flops / t / V5E_F32 * 100:5.1f}%")
    print(f"  MFU vs bf16 peak: {flops / t / V5E_BF16 * 100:5.1f}%")
    print(f"  time at f32 peak: {flops / V5E_F32 * 1e3:6.2f} ms")
    print(f"  time at HBM BW:   {bytes_ / V5E_HBM * 1e3:6.2f} ms")
    return flops, bytes_


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--enc-ms", type=float, default=34.2)
    ap.add_argument("--dec-ms", type=float, default=81.0)
    ap.add_argument("--spk-ms", type=float, default=14.6)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args(argv)

    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.models import speaker_id as spk_m
    from speech_cloner_tpu.train import (
        DecoderLossConfig,
        OptimizerConfig,
        decoder_train_step,
        encoder_train_step,
        make_train_state,
        speaker_train_step,
    )

    B = args.batch
    enc_cfg = enc_m.EncoderConfig()
    dec_cfg = dec_m.DecoderConfig()
    opt_cfg = OptimizerConfig()
    opt = opt_cfg.make()

    enc_params, enc_state = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
    ts_e = make_train_state(enc_params, enc_state, opt_cfg, jax.random.PRNGKey(1))
    x = jnp.zeros((B, enc_cfg.n_timesteps, enc_cfg.input_dim), jnp.float32)
    y = jnp.zeros((B, enc_cfg.n_timesteps, enc_cfg.n_output), jnp.float32)
    e_flops, _ = _analyze(
        "encoder train step (B=32, T=400, enc_14 geometry)",
        lambda t, xx, yy: encoder_train_step(t, xx, yy, cfg=enc_cfg,
                                             opt_cfg=opt_cfg, opt=opt),
        (ts_e, x, y), args.enc_ms)

    dec_params, dec_state = dec_m.init(jax.random.PRNGKey(2), dec_cfg)
    ts_d = make_train_state(dec_params, dec_state, opt_cfg, jax.random.PRNGKey(3))
    mel = jnp.zeros((B, dec_cfg.n_timesteps, dec_cfg.step1.n_output), jnp.float32)
    stft = jnp.zeros((B, dec_cfg.n_timesteps, dec_cfg.step2.n_output), jnp.float32)
    loss_cfg = DecoderLossConfig()
    d_flops, _ = _analyze(
        "decoder train step (B=32, T=400, E=256/512, K=32)",
        lambda t, xx, mm, ss: decoder_train_step(
            t, xx, mm, ss, enc_params=enc_params, enc_state=enc_state,
            enc_cfg=enc_cfg, cfg=dec_cfg, loss_cfg=loss_cfg,
            opt_cfg=opt_cfg, opt=opt),
        (ts_d, x, mel, stft), args.dec_ms)

    # speaker-ID verifier CNN (no scans — pure conv/matmul, the one step
    # that should sit ON the FLOP/bandwidth roofline)
    spk_cfg = spk_m.SpeakerIdConfig(n_timesteps=400, n_features=201, n_output=34)
    spk_params, spk_state = spk_m.init(jax.random.PRNGKey(4), spk_cfg)
    ts_s = make_train_state(spk_params, spk_state, opt_cfg, jax.random.PRNGKey(5))
    power = jnp.zeros((B, 400, 201), jnp.float32)
    cls = jnp.zeros((B, 34), jnp.float32)
    _analyze(
        "speaker-ID train step (B=32, [400,201] power windows, 34 classes)",
        lambda t, xx, yy: speaker_train_step(t, xx, yy, cfg=spk_cfg,
                                             opt_cfg=opt_cfg, opt=opt),
        (ts_s, power, cls), args.spk_ms)

    # scan-latency floor: the bidirectional GRU is 2*T sequential cell steps
    # per CBHG; each sequential step costs >= one kernel dispatch
    n_cbhg_enc, n_cbhg_dec = 1, 2
    for name, n_cbhg, ms in (("encoder", n_cbhg_enc, args.enc_ms),
                             ("decoder", n_cbhg_dec + 1, args.dec_ms)):
        seq_steps = 400 * n_cbhg  # fwd+bwd run as separate scans of T each
        print(f"{name}: {seq_steps} sequential GRU scan iterations/step "
              f"-> {ms / seq_steps * 1e3:.0f} us budget per iteration at the "
              f"measured step time")


if __name__ == "__main__":
    main()
