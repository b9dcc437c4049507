"""Measure the GRU scan-iteration overhead and the effect of scan unrolling.

The decoder train step measures ~920 ms on this runtime against an ~88 ms
f32 FLOP roofline — the gap is the 2400 sequential GRU scan iterations
(6 directional scans x T=400) at a fixed per-iteration cost. lax.scan's
``unroll`` replicates the body k times per while-iteration (identical math),
dividing that fixed cost by k. This probes a single directional GRU and the
full decoder train step at several unroll factors.

Run on the chip:  python tools/gru_scan_probe.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true", help="GRU-only, skip the train step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speech_cloner_tpu.nn import modules as M

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    def bench(fn, *a, n=5):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*a))[0])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*a)
            np.asarray(jax.tree.leaves(out)[0])  # hard fetch
            ts.append(time.perf_counter() - t0)
        return compile_s, min(ts)

    B, T = 32, 400
    for C, H in ((128, 128), (256, 256)):
        params = M.gru_dir_init(jax.random.PRNGKey(0), C, H)
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        for unroll in (1, 4, 8, 16, 32):
            fn = jax.jit(lambda p, xx, u=unroll: M._gru_dir_apply(p, xx, u))
            comp, best = bench(fn, params, x)
            print(f"gru C={C} H={H} unroll={unroll:2d}: compile {comp:6.1f}s  "
                  f"best {best * 1e3:7.2f} ms ({best / T * 1e6:6.1f} us/iter)",
                  flush=True)
    if args.quick:
        return

    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.train import (
        DecoderLossConfig,
        OptimizerConfig,
        decoder_train_step,
        make_train_state,
    )

    enc_cfg = enc_m.EncoderConfig()
    dec_cfg = dec_m.DecoderConfig()
    opt_cfg = OptimizerConfig()
    opt = opt_cfg.make()
    loss_cfg = DecoderLossConfig()
    enc_params, enc_state = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
    dec_params, dec_state = dec_m.init(jax.random.PRNGKey(2), dec_cfg)
    ts = make_train_state(dec_params, dec_state, opt_cfg, jax.random.PRNGKey(3))
    x = jnp.asarray(rng.standard_normal((B, T, enc_cfg.input_dim)), jnp.float32)
    mel = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    stft = jnp.asarray(rng.standard_normal((B, T, 201)), jnp.float32)

    import dataclasses

    for unroll in (1, 8, 16):
        # scan_unroll is a CBHGConfig field now: build per-unroll configs
        e_cfg = dataclasses.replace(enc_cfg, scan_unroll=unroll)
        d_cfg = dataclasses.replace(
            dec_cfg,
            step1=dataclasses.replace(dec_cfg.step1, scan_unroll=unroll),
            step2=dataclasses.replace(dec_cfg.step2, scan_unroll=unroll))
        fn = jax.jit(lambda t, a, b, c, e_cfg=e_cfg, d_cfg=d_cfg: decoder_train_step(
            t, a, b, c, enc_params=enc_params, enc_state=enc_state,
            enc_cfg=e_cfg, cfg=d_cfg, loss_cfg=loss_cfg,
            opt_cfg=opt_cfg, opt=opt))
        comp, best = bench(fn, ts, x, mel, stft, n=3)
        print(f"decoder train step unroll={unroll:2d}: compile {comp:6.1f}s  "
              f"best {best * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
