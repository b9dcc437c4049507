"""Measure mixed-precision (compute_dtype=bf16) vs f32 decoder train steps.

The MFU study (tools/mfu_roofline.py, docs/DESIGN.md) put the f32 decoder
step at 52 ms honest on-chip time = ~42% of bf16 peak: ~22 ms of MXU work
plus a sequential GRU-scan floor. bf16 compute can at best halve the MXU
term. This probe measures the actual end-to-end step time both ways, using
the chained-dispatch timing method from the MFU study (N async dispatches,
one final fetch) so RPC latency doesn't pollute the number.

Run on the chip:  python tools/bf16_step_probe.py [n_steps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.train import (
        DecoderLossConfig,
        OptimizerConfig,
        decoder_train_step,
        make_train_state,
    )

    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    print(f"backend: {jax.default_backend()}  chain={n_chain}", flush=True)

    enc_cfg = enc_m.EncoderConfig()
    dec_cfg = dec_m.DecoderConfig()
    opt_cfg = OptimizerConfig()
    opt = opt_cfg.make()
    loss_cfg = DecoderLossConfig()
    enc_params, enc_state = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
    rng = np.random.default_rng(0)

    B = 32
    x = jnp.asarray(rng.standard_normal(
        (B, enc_cfg.n_timesteps, enc_cfg.input_dim)), jnp.float32)
    mel = jnp.asarray(rng.standard_normal(
        (B, dec_cfg.n_timesteps, dec_cfg.step1.n_output)), jnp.float32)
    stft = jnp.asarray(rng.standard_normal(
        (B, dec_cfg.n_timesteps, dec_cfg.step2.n_output)), jnp.float32)

    import dataclasses

    fused_dec = dataclasses.replace(
        dec_cfg,
        step1=dataclasses.replace(dec_cfg.step1, fused_gru=True),
        step2=dataclasses.replace(dec_cfg.step2, fused_gru=True))
    fused_enc = dataclasses.replace(enc_cfg, fused_gru=True)

    combos = (("f32", None, False), ("bf16", jnp.bfloat16, False),
              ("f32+fused", None, True), ("bf16+fused", jnp.bfloat16, True))
    for name, cd, fused in combos:
        dcfg = fused_dec if fused else dec_cfg
        ecfg = fused_enc if fused else enc_cfg
        dec_params, dec_state = dec_m.init(jax.random.PRNGKey(2), dec_cfg)
        ts = make_train_state(dec_params, dec_state, opt_cfg, jax.random.PRNGKey(3))
        fn = jax.jit(lambda t, xx, mm, ss, dcfg=dcfg, ecfg=ecfg, cd=cd:
                     decoder_train_step(
                         t, xx, mm, ss, enc_params=enc_params, enc_state=enc_state,
                         enc_cfg=ecfg, cfg=dcfg, loss_cfg=loss_cfg,
                         opt_cfg=opt_cfg, opt=opt, compute_dtype=cd))
        t0 = time.perf_counter()
        ts, m = fn(ts, x, mel, stft)
        float(m["loss"])
        print(f" {name}: compile+first {time.perf_counter() - t0:6.1f}s", flush=True)
        bests = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(n_chain):  # async chain, one fetch at the end
                ts, m = fn(ts, x, mel, stft)
            float(m["loss"])
            bests.append((time.perf_counter() - t0) / n_chain)
        print(f" {name}: per-step best {min(bests) * 1e3:7.2f} ms "
              f"(loss {float(m['loss']):.4f})", flush=True)


if __name__ == "__main__":
    main()
