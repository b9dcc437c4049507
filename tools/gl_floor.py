"""Griffin-Lim loop-floor experiment on the real TPU (VERDICT item 3).

GL dominates inference wall time (299 of 319 ms at 200 iters, docs/DESIGN.md)
and round 1 identified a fixed per-while-iteration dispatch cost (~1.5 ms/iter
floor) on the axon runtime. This measures whether unrolling the fori_loop body
(k projections per loop iteration — identical math) amortizes that cost, and
re-times Fast-GL (momentum 0.99, 25 iters — convergence-equivalent to the
reference's 200, see DESIGN.md table).

Run on the chip (no SCL_PLATFORM):  python tools/gl_floor.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from speech_cloner_tpu.ops.griffin_lim import from_power_to_wav

    print(f"backend: {jax.default_backend()}", flush=True)
    T, F = 12000, 201  # 60 s clip at hop 80 (bench.py shape)
    rng = np.random.default_rng(0)
    P = jnp.asarray(np.abs(rng.standard_normal((T, F))).astype(np.float32))

    def run_case(name, n_iter, momentum, unroll):
        fn = jax.jit(lambda p, k: from_power_to_wav(
            p, n_iter=n_iter, momentum=momentum, unroll=unroll,
            hop_length=80, win_length=400, n_fft=400, realse=1.2, key=k))
        t0 = time.perf_counter()
        np.asarray(fn(P, jax.random.PRNGKey(0)))
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            out = np.asarray(fn(P, jax.random.PRNGKey(i + 1)))  # hard fetch
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name:34s} compile {compile_s:6.1f}s  best {best * 1e3:7.1f} ms "
              f"({best / n_iter * 1e3:5.2f} ms/iter)", flush=True)
        return best

    base = run_case("parity 200 iters, unroll=1", 200, 0.0, 1)
    for k in (2, 4, 8, 16):
        b = run_case(f"parity 200 iters, unroll={k}", 200, 0.0, k)
        print(f"    -> {base / b:.2f}x vs unroll=1", flush=True)
    run_case("fast-GL 25 iters m=0.99, unroll=1", 25, 0.99, 1)
    run_case("fast-GL 25 iters m=0.99, unroll=8", 25, 0.99, 8)
    run_case("fast-GL 25 iters m=0.99, full-unroll", 25, 0.99, 24)


if __name__ == "__main__":
    main()
