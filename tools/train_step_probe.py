"""Disambiguate the decoder train step's binding constraint on the chip.

tools/mfu_roofline.py shows the decoder step's 81 ms is simultaneously close
to (a) the f32-composite MXU roofline (~88 ms for 4.3 TFLOP) and (b) the
sequential-scan latency floor (1200 GRU scan iterations x the measured
~65 us/iter step overhead). Scaling the batch separates them: FLOPs scale
with B, scan iteration count does not.

  time(B) ~ a + b*B  ->  b dominates = FLOP/bandwidth-bound,
                         a dominates = scan-latency-bound.

Also probes matmul precision: DEFAULT (TPU bf16 passes) vs HIGHEST (f32).

Run on the chip:  python tools/train_step_probe.py
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
        encoder_train_step,
        make_train_state,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    enc_cfg = enc_m.EncoderConfig()
    dec_cfg = dec_m.DecoderConfig()
    opt_cfg = OptimizerConfig()
    opt = opt_cfg.make()
    loss_cfg = DecoderLossConfig()
    enc_params, enc_state = enc_m.init(jax.random.PRNGKey(0), enc_cfg)

    rng = np.random.default_rng(0)

    def time_step(name, fn, ts, *batch):
        t0 = time.perf_counter()
        out = fn(ts, *batch)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        times = []
        new_ts = ts
        for _ in range(10):
            t0 = time.perf_counter()
            new_ts, metrics = fn(new_ts, *batch)
            # hard sync: fetch a scalar metric to host
            float(metrics["loss"])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name:44s} compile {compile_s:6.1f}s  best {best * 1e3:7.2f} ms",
              flush=True)
        return best

    for prec in ("default", "highest"):
        with jax.default_matmul_precision(prec):
            for B in (8, 16, 32, 64):
                dec_params, dec_state = dec_m.init(jax.random.PRNGKey(2), dec_cfg)
                ts = make_train_state(dec_params, dec_state, opt_cfg,
                                      jax.random.PRNGKey(3))
                x = jnp.asarray(rng.standard_normal(
                    (B, enc_cfg.n_timesteps, enc_cfg.input_dim)), jnp.float32)
                mel = jnp.asarray(rng.standard_normal(
                    (B, dec_cfg.n_timesteps, dec_cfg.step1.n_output)), jnp.float32)
                stft = jnp.asarray(rng.standard_normal(
                    (B, dec_cfg.n_timesteps, dec_cfg.step2.n_output)), jnp.float32)
                fn = jax.jit(lambda t, xx, mm, ss: decoder_train_step(
                    t, xx, mm, ss, enc_params=enc_params, enc_state=enc_state,
                    enc_cfg=enc_cfg, cfg=dec_cfg, loss_cfg=loss_cfg,
                    opt_cfg=opt_cfg, opt=opt))
                time_step(f"decoder step B={B} precision={prec}", fn, ts, x, mel, stft)


if __name__ == "__main__":
    main()
