"""Probe the axon runtime's first-execution stall on Griffin-Lim programs.

Evidence so far (docs/ROUND5.md, BENCH r4/r5): in every fresh process, the
FIRST executed Griffin-Lim program stalls for minutes (239 s / 650 s /
946 s observed) at ~0% host CPU — even on a persistent-cache hit, even at
a dynamic trip count of 2 — while every subsequent GL program (including
a different executable) finalizes in ~2 s. The predict program (rfft but
no irfft, scans but no vocoder) never stalls.

This probe times, in ONE fresh process, in order:
  1. a minimal jitted irfft          (is irfft itself the trigger?)
  2. a tiny 8-frame dynamic-GL vocode (does a toy GL program absorb it?)
  3. the bench-shaped 12000-frame dynamic-GL vocode (is it now fast?)

If (1) or (2) absorbs the stall at small cost, bench.py/apps gain a cheap
pre-warm; if the stall follows the big program regardless, that is the
documented dead end (VERDICT r4 #4).

Run on the chip:  python tools/gl_first_exec_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dft", choices=("fft", "matmul"), default="fft",
                    help="matmul = MXU matmul DFT (no FFT custom call): run "
                         "in a FRESH process to test whether the finalize "
                         "stall is tied to the FFT custom call")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from speech_cloner_tpu.apps._platform import apply_compile_cache

    apply_compile_cache()

    def t(name, fn):
        t0 = time.perf_counter()
        try:
            out = np.asarray(fn())
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:8.2f}s  (out shape {out.shape})", flush=True)
        return dt

    print(f"backend: {jax.default_backend()}", flush=True)

    # NOTE a bare jitted irfft at [4,201] (and everything after it in the
    # same process) dies with UNIMPLEMENTED on the axon TPU backend — the
    # error poisons the client, so it cannot be probed in-process
    # (/tmp/gl_probe2.log, r5). Only full GL programs are swept here.

    # 2. dynamic-GL vocode at a small frame count first: if the stall lands
    #    on the first-executed GL program regardless of shape, a small warm
    #    program may absorb it cheaply for the whole process
    from speech_cloner_tpu.ops import from_power_to_wav_dyn

    key = jax.random.PRNGKey(0)
    dft = args.dft
    for frames in (1024,):
        p = jnp.abs(jax.random.normal(key, (frames, 201))) * 0.3
        f = jax.jit(lambda pp, n, m: from_power_to_wav_dyn(
            pp, n, m, hop_length=80, win_length=400, realse=1.2, key=key,
            dft=dft))
        t(f"2. dyn GL ({dft}) [{frames:5d},201], n=2    ",
          lambda f=f, p=p: f(p, np.int32(2), np.float32(0.0)))
        t(f"2b. dyn GL ({dft}) [{frames:5d},201], n=200  ",
          lambda f=f, p=p: f(p, np.int32(200), np.float32(0.0)))

    # 3. bench-shaped dynamic vocode (same jit identity as bench.py uses:
    #    ClonePipeline.device_vocode_pcm16_dyn on a [12000, 201] power map)
    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.pipeline.clone import make_pipeline

    pipe = make_pipeline(enc_cfg=enc_m.EncoderConfig(),
                         dec_cfg=dec_m.DecoderConfig(),
                         n_iter=200, realse=1.2)
    if dft == "fft":
        f_big = jax.jit(pipe.device_vocode_pcm16_dyn)
    else:
        f_big = jax.jit(lambda pp, k, n, m: from_power_to_wav_dyn(
            pp, n, m, hop_length=80, win_length=400, realse=1.2, key=k,
            dft="matmul"))
    p_big = jnp.abs(jax.random.normal(key, (12000, 201))) * 0.3
    t(f"3. bench dyn vocode ({dft}) [12000,201], n=2  ",
      lambda: f_big(p_big, key, np.int32(2), np.float32(0.0)))
    t(f"3b. bench dyn vocode ({dft}) [12000,201], n=200",
      lambda: f_big(p_big, key, np.int32(200), np.float32(0.0)))


if __name__ == "__main__":
    main()
