"""Griffin-Lim unroll probe at the STREAMING chunk shape.

docs/DESIGN.md's GL floor probes (tools/gl_floor.py) were all taken at the
bench shape (12 000 frames, where ~1.5 ms/iter is real FFT work and
unrolling can't pay). The streaming path runs 25-iteration GL over a tiny
[B, 432, 201] chunk where the measured ~4 ms/iteration is almost entirely
the runtime's fixed per-while-iteration cost — and pipeline/stream.py never
passed ``unroll``. This measures, on the real chip, whether (a) partial
unroll and (b) the new full unroll (no while loop at all,
ops/griffin_lim.py) remove that cost at the shapes serving actually uses.

Run on the chip:  SCL_COMPILE_CACHE=1 python tools/gl_unroll_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from speech_cloner_tpu.ops.griffin_lim import griffin_lim

    print(f"backend: {jax.default_backend()}", flush=True)
    W, F, hop, win = 432, 201, 80, 400  # stream chunk: C=400 + 2*margin 16
    rng = np.random.default_rng(0)

    def run_case(B, n_iter, momentum, unroll, reps=7):
        amp = jnp.asarray(np.abs(
            rng.standard_normal((B, W, F))).astype(np.float32))
        ph = jnp.asarray((np.pi * rng.random((B, W, F))).astype(np.float32))

        def one(a, p):
            wav, S = griffin_lim(a, win, hop, num_iters=n_iter, n_fft=win,
                                 init_phase=p, momentum=momentum,
                                 unroll=unroll, return_stft=True)
            return wav, jnp.angle(S[-16:])

        fn = jax.jit(jax.vmap(one))
        t0 = time.perf_counter()
        w, _ = fn(amp, ph)
        np.asarray(w)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            w, p = fn(amp, ph)
            np.asarray(w), np.asarray(p)  # hard host fetch
            times.append(time.perf_counter() - t0)
        best = min(times)
        tag = "full" if unroll >= n_iter - 1 else str(unroll)
        print(f"B={B:2d} iters={n_iter:3d} m={momentum} unroll={tag:>4s}  "
              f"compile {compile_s:6.1f}s  best {best * 1e3:7.1f} ms "
              f"({best / n_iter * 1e3:5.2f} ms/iter)", flush=True)
        return best

    # numeric identity of unroll is locked on CPU by
    # tests/test_dsp.py::test_griffin_lim_unroll_is_identical (eager ops
    # here would each remote-compile through the axon tunnel)
    for B in (1, 16):
        base = run_case(B, 25, 0.99, 1)
        for k in (6, 24):
            b = run_case(B, 25, 0.99, k)
            print(f"    -> {base / b:.2f}x vs unroll=1", flush=True)


if __name__ == "__main__":
    main()
