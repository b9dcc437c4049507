"""Benchmark harness: end-to-end conversion RTF on the real chip.

Measures the full clone path (wav -> on-device features -> encoder PPG ->
decoder mel+linear -> 200-iteration Griffin-Lim -> wav) on a synthetic 60 s
16 kHz clip with production model shapes (enc_14 geometry + shipped decoder
config), then prints ONE JSON line:

  {"metric": "e2e_conversion_rtf", "value": <rtf>, "unit": "rtf",
   "vs_baseline": <0.05 / rtf>}

vs_baseline > 1 means faster than the BASELINE.json north-star target of
RTF < 0.05 on one v5e chip. The reference has no machine-measurable baseline
(CPU librosa + TF-1 feed_dict, no published numbers — BASELINE.md), so the
driver-defined target is the denominator.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache, default ON (SCL_COMPILE_CACHE=0 opts
    # out): the remote axon compiler is erratic (the SAME program compiled
    # in 126 s in r02 and 869 s in r03), and a warm cache turns a repeat
    # bench run's compile into seconds. Round-1 measured large-executable
    # cache writes at ~170 s through the tunnel — a one-time cost the
    # recorded compile_s fields make visible either way. Shares the CLI
    # apps' cache directory (apps/_platform.apply_compile_cache).
    os.environ.setdefault("SCL_COMPILE_CACHE", "1")
    from speech_cloner_tpu.apps._platform import apply_compile_cache

    cache_dir = apply_compile_cache()

    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.pipeline.clone import make_pipeline

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    enc_ckpt = "/root/reference/enc_14_ckpt/encoder-136512"
    enc_ckpt = enc_ckpt if os.path.exists(enc_ckpt + ".index") else None

    # gl_dft="matmul": the GL transforms run as MXU matmuls against cos/sin
    # bases instead of the FFT custom call — parity RTF 0.0034 vs
    # 0.0059-0.0063 measured (1.7x end-to-end, docs/ROUND5.md), same exact
    # DFT to ~1e-5. SCL_BENCH_DFT=fft restores the FFT kernel.
    pipe = make_pipeline(
        enc_cfg=enc_m.EncoderConfig(),
        dec_cfg=dec_m.DecoderConfig(),
        enc_ckpt=enc_ckpt,
        n_iter=200,
        realse=1.2,
        gl_dft=os.environ.get("SCL_BENCH_DFT", "matmul"),
    )

    # synthetic 60 s speech-band test clip
    sr = pipe.feat_cfg.sample_rate
    dur_s = 60.0
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * dur_s)) / sr
    wav = (
        0.4 * np.sin(2 * np.pi * 180 * t)
        + 0.3 * np.sin(2 * np.pi * 620 * t + np.sin(2 * np.pi * 3 * t))
        + 0.05 * rng.standard_normal(t.shape)
    ).astype(np.float32)

    # pad exactly like ClonePipeline.convert, then time the raw device program
    T = pipe.enc_cfg.n_timesteps
    hop = pipe.feat_cfg.hop_length
    spw = T * hop
    pad = (-len(wav)) % spw
    wav_p = jnp.asarray(np.pad(wav, (0, pad)))
    key = jax.random.PRNGKey(0)

    # Fast-GL variant: Fast Griffin-Lim (momentum 0.99) needs only 25
    # iterations to beat the reference algorithm at 200 (docs/DESIGN.md
    # convergence table) — published alongside the 200-iter parity number.
    FAST_ITERS, FAST_MOM = 25, 0.99

    # weights as runtime ARGUMENTS, not closed-over constants: the r4 bench
    # embedded ~70 MB of f32 into the predict HLO (a ~280 MB executable whose
    # persistent-cache hits were erratic — BENCH_r04 paid 832 s with
    # compile_cache=true). Parameterized, the program is small and its cache
    # entry is checkpoint-independent. See ClonePipeline.device_params.
    #
    # Likewise the Griffin-Lim iteration count/momentum are runtime ARGUMENTS
    # (device_vocode_pcm16_dyn): the r5 probes showed the axon runtime's
    # FIRST execution of the static 199-trip parity loop cost 240-650 s even
    # on a persistent-cache hit, while the 24-trip fast program finalized in
    # ~2 s. One dynamic-trip-count executable serves parity-200 AND fast-25,
    # warmed once at n=2.
    dev_params = pipe.device_params()
    predict_fn = jax.jit(lambda p, w: pipe.device_predict(w, p))
    vocode_dyn_fn = jax.jit(pipe.device_vocode_pcm16_dyn)

    def vocode(stft_pred, k, fast=False):
        n, m = (FAST_ITERS, FAST_MOM) if fast else (pipe.n_iter, 0.0)
        return vocode_dyn_fn(stft_pred, k, np.int32(n), np.float32(m))

    def run(w, k, fast=False):
        mel_pred, stft_pred, ppg = predict_fn(dev_params, w)
        wav_pcm16 = vocode(stft_pred, k, fast)
        # hard host fetch: on this remote-tunnel runtime block_until_ready
        # can return before completion, so timing must include materializing
        # the output (int16 PCM — the file/wire format — at half the bytes)
        return np.asarray(wav_pcm16), mel_pred

    # per-program compile accounting + persistent-cache hit/miss evidence:
    # the r4 driver run paid 832 s "compile" with compile_cache=true — the
    # split below says WHICH program (predict embeds ~70 MB of weights as
    # constants; its serialized executable is ~280 MB) and the cache logs
    # say whether that was a key miss or a slow deserialize through the
    # remote-tunnel runtime
    import logging

    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
    h = logging.StreamHandler(sys.stderr)
    h.setLevel(logging.DEBUG)
    for name in ("jax._src.compilation_cache", "jax._src.compiler"):
        logging.getLogger(name).addHandler(h)
    jax.config.update("jax_explain_cache_misses", True)

    log("compiling...")
    t0 = time.perf_counter()
    mel_pred, stft_pred, _ = predict_fn(dev_params, wav_p)
    jax.block_until_ready(stft_pred)
    compile_predict_s = time.perf_counter() - t0
    log(f"compile+first run (predict): {compile_predict_s:.2f}s")
    # warm the ONE dynamic vocoder executable at a 1-trip count: the compile
    # and the runtime's first-execution finalization happen here, decoupled
    # from the 199-trip parity run below
    t0 = time.perf_counter()
    np.asarray(vocode_dyn_fn(stft_pred, key, np.int32(2), np.float32(0.0)))
    compile_vocode_warm_s = time.perf_counter() - t0
    log(f"compile+first run (vocode-dyn, n=2): {compile_vocode_warm_s:.2f}s")
    t0 = time.perf_counter()
    np.asarray(vocode(stft_pred, key))
    first_parity_vocode_s = time.perf_counter() - t0
    log(f"first vocode-200 run (warm executable): {first_parity_vocode_s:.2f}s")
    compile_vocode_s = compile_vocode_warm_s + first_parity_vocode_s
    compile_parity_s = compile_predict_s + compile_vocode_s
    t0 = time.perf_counter()
    out_f = run(wav_p, key, fast=True)
    compile_fast_s = time.perf_counter() - t0
    log(f"first fast-GL-25 run (same executable): {compile_fast_s:.2f}s")

    def bench(fast):
        times = []
        for i in range(5):
            k = jax.random.PRNGKey(i + 1)  # vary inputs: defeat result caching
            t0 = time.perf_counter()
            out = run(wav_p, k, fast=fast)
            times.append(time.perf_counter() - t0)
        return min(times), out

    best, out = bench(fast=False)
    best_fast, _ = bench(fast=True)
    rtf = best / dur_s
    rtf_fast = best_fast / dur_s
    frames = out[1].shape[0]
    mel_fps = frames / best
    log(f"parity-200: best {best:.3f}s rtf {rtf:.5f}, mel frames/s {mel_fps:.0f}; "
        f"fast-GL-25: best {best_fast:.3f}s rtf {rtf_fast:.5f}")

    print(json.dumps({
        "metric": "e2e_conversion_rtf",
        "value": rtf,
        "unit": "rtf",
        "vs_baseline": 0.05 / rtf,
        "extra": {
            "mel_frames_per_sec_per_chip": mel_fps,
            "clip_seconds": dur_s,
            "griffin_lim_iters": pipe.n_iter,
            "best_wall_s": best,
            "fast_gl_rtf": rtf_fast,
            "fast_gl_iters": FAST_ITERS,
            "fast_gl_momentum": FAST_MOM,
            "fast_gl_best_wall_s": best_fast,
            "backend": jax.default_backend(),
            "gl_dft": pipe.gl_dft,
            "encoder_weights": "enc_14_ckpt" if enc_ckpt else "random",
            "compile_parity_s": round(compile_parity_s, 1),
            "compile_predict_s": round(compile_predict_s, 1),
            "compile_vocode_s": round(compile_vocode_s, 1),
            "compile_vocode_warm_s": round(compile_vocode_warm_s, 1),
            "first_parity_vocode_s": round(first_parity_vocode_s, 1),
            "compile_fast_s": round(compile_fast_s, 1),
            "compile_cache": bool(cache_dir),
        },
    }))


if __name__ == "__main__":
    main()
