"""DSP golden tests: numpy path vs scipy/analytic truths, jnp path vs numpy path.

The reference's DSP is librosa (audio_lib.py); librosa is not available in
this environment, so the numpy backend of speech_cloner_tpu.ops *is* the
golden reference — it is validated here against scipy primitives
(get_window, lfilter, dct) and analytic invariants (COLA reconstruction,
filterbank geometry, Parseval), and the device (jnp) backend is then required
to match it to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft
import scipy.signal

from speech_cloner_tpu import ops
from speech_cloner_tpu.ops.features import FeatureConfig


RNG = np.random.default_rng(0)


def _chirp(n=16000, sr=16000):
    t = np.arange(n) / sr
    y = scipy.signal.chirp(t, f0=100, f1=6000, t1=t[-1]).astype(np.float32)
    y += 0.1 * RNG.standard_normal(n).astype(np.float32)
    return y


# ---------------------------------------------------------------- windows ---

def test_hann_matches_scipy():
    for n in (400, 256, 80):
        mine = ops.hann_periodic(n)
        ref = scipy.signal.get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(mine, ref, atol=1e-12)


def test_hamming_matches_scipy():
    mine = ops.get_window("hamm", 400)
    ref = scipy.signal.get_window("hamming", 400, fftbins=True)
    np.testing.assert_allclose(mine, ref, atol=1e-12)


def test_pad_center():
    w = np.ones(4)
    out = ops.pad_center(w, 8)
    np.testing.assert_array_equal(out, [0, 0, 1, 1, 1, 1, 0, 0])


# ----------------------------------------------------------- preemphasis ---

def test_preemphasis_matches_lfilter():
    y = _chirp()
    ref = scipy.signal.lfilter([1, -0.97], [1], y)
    np.testing.assert_allclose(ops.preemphasis(y, 0.97, xp=np), ref, atol=1e-6)


def test_inv_preemphasis_roundtrip_and_scan():
    y = _chirp(4000)
    pre = ops.preemphasis(y, 0.97, xp=np)
    # numpy inverse == scipy IIR
    inv_np = ops.inv_preemphasis_np(pre, 0.97)
    np.testing.assert_allclose(inv_np, y, atol=1e-4)
    # device associative-scan inverse == numpy inverse
    inv_dev = np.asarray(ops.inv_preemphasis(jnp.asarray(pre), 0.97))
    np.testing.assert_allclose(inv_dev, inv_np, atol=2e-4)


# ------------------------------------------------------------------- stft ---

def test_stft_frame_count_and_dc():
    y = _chirp(16000)
    S = ops.stft(y, n_fft=400, hop_length=80, win_length=400, xp=np)
    assert S.shape == (16000 // 80 + 1, 201)
    # DC bin of a frame = sum(window * frame)
    win = ops.pad_center(ops.hann_periodic(400), 400)
    ypad = np.pad(y, 200, mode="reflect")
    np.testing.assert_allclose(S[0, 0].real, np.sum(win * ypad[:400]), rtol=1e-5)


def test_stft_odd_hop_gather_path():
    # hop that does not divide n_fft exercises the gather fallback
    y = _chirp(3999)
    S_np = ops.stft(y, n_fft=256, hop_length=96, win_length=256, xp=np)
    S_j = np.asarray(ops.stft(jnp.asarray(y), n_fft=256, hop_length=96, win_length=256, xp=jnp))
    np.testing.assert_allclose(S_j, S_np, atol=1e-3)


def test_stft_jnp_matches_numpy():
    y = _chirp(8000)
    S_np = ops.stft(y, n_fft=400, hop_length=80, xp=np)
    S_j = np.asarray(ops.stft(jnp.asarray(y), n_fft=400, hop_length=80, xp=jnp))
    np.testing.assert_allclose(np.abs(S_j), np.abs(S_np), atol=2e-3)


def test_istft_cola_roundtrip():
    """istft(stft(y)) == y (center region) — the classic COLA check."""
    y = _chirp(8000)
    for xp in (np, jnp):
        S = ops.stft(xp.asarray(y), n_fft=400, hop_length=80, xp=xp)
        y_rec = np.asarray(ops.istft(S, hop_length=80, win_length=400, xp=xp))
        n = min(len(y), len(y_rec))
        np.testing.assert_allclose(y_rec[400:n - 400], y[400:n - 400], atol=2e-3)


def test_window_sumsquare_matches_naive():
    wss = ops.window_sumsquare("hann", n_frames=20, hop_length=80, win_length=400, n_fft=400)
    win = ops.pad_center(ops.hann_periodic(400), 400)
    naive = np.zeros(19 * 80 + 400)
    for t in range(20):
        naive[t * 80 : t * 80 + 400] += win**2
    np.testing.assert_allclose(wss, naive, atol=1e-10)


# -------------------------------------------------------------------- mel ---

def test_mel_filterbank_geometry():
    W = ops.mel_filterbank(16000, 400, 80, norm=None)
    assert W.shape == (80, 201)
    assert (W >= 0).all()
    # un-normalized triangles peak at 1 for interior filters with enough bins
    assert W.max() <= 1.0 + 1e-9
    # each FFT bin inside the range is covered by at most 2 filters
    assert ((W > 0).sum(axis=0) <= 2).all()


def test_mel_slaney_norm():
    from speech_cloner_tpu.ops.mel import mel_frequencies

    W1 = ops.mel_filterbank(16000, 400, 80, norm=1)
    W0 = ops.mel_filterbank(16000, 400, 80, norm=None)
    mel_f = mel_frequencies(82, 0.0, 8000.0)
    enorm = 2.0 / (mel_f[2:] - mel_f[:80])
    np.testing.assert_allclose(W1, W0 * enorm[:, None], atol=1e-12)


def test_hz_mel_roundtrip():
    from speech_cloner_tpu.ops.mel import hz_to_mel, mel_to_hz

    f = np.linspace(0, 8000, 100)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, atol=1e-6)
    # slaney: linear below 1 kHz
    np.testing.assert_allclose(hz_to_mel(600.0), 600.0 / (200.0 / 3), atol=1e-9)


def test_dct_matches_scipy_ortho():
    D = ops.dct_basis(40, 80)
    # rows of D == scipy orthonormal DCT-II of the identity, transposed
    ref = scipy.fft.dct(np.eye(80), type=2, norm="ortho", axis=0)[:40]
    np.testing.assert_allclose(D, ref, atol=1e-10)


# --------------------------------------------------------------------- db ---

def test_power_to_db_clipping():
    P = np.array([1.0, 1e-12, 100.0])
    dB = ops.power_to_db(P)  # top_db=80 clips relative to global max (20 dB)
    np.testing.assert_allclose(dB, [0.0, -60.0, 20.0], atol=1e-9)
    # amin floor
    np.testing.assert_allclose(ops.power_to_db(np.array([0.0, 1.0]), top_db=None)[0], -100.0)


def test_amplitude_to_db():
    S = np.array([1.0, 10.0])
    np.testing.assert_allclose(ops.amplitude_to_db(S, top_db=None), [0.0, 20.0], atol=1e-9)


def test_db_roundtrip():
    P = np.abs(RNG.standard_normal(100)) + 0.1
    np.testing.assert_allclose(ops.db_to_power(ops.power_to_db(P, top_db=None)), P, rtol=1e-9)


# --------------------------------------------------------------- features ---

def test_mfcc_input_shapes_and_clip():
    y = _chirp(16000)
    cfg = FeatureConfig(calc_mfcc_derivate=True)
    mfcc, mel_dB, power_dB = ops.mfcc_input(y, cfg, xp=np)
    T = 16000 // 80 + 1
    assert mfcc.shape == (T, 80)
    assert mel_dB.shape == (T, 80)
    assert power_dB.shape == (T, 201)
    for a in (mfcc, mel_dB, power_dB):
        assert a.dtype == np.float32
        assert a.min() >= -1.0 and a.max() <= 1.0
    # dB maps are min-subtracted then scaled by 0.01: min is exactly 0
    assert power_dB.min() == 0.0
    assert mel_dB.min() == 0.0
    # first-MFCC normalization: first frame's c0 is 0 after the subtraction
    assert abs(mfcc[0, 0]) < 1e-6


def test_mfcc_input_jnp_matches_numpy():
    y = _chirp(8000)
    cfg = FeatureConfig(calc_mfcc_derivate=True)
    ref = ops.mfcc_input(y, cfg, xp=np)
    dev = ops.mfcc_input(jnp.asarray(y), cfg, xp=jnp)
    for a, b, tol in zip(ref, dev, (2e-3, 2e-3, 2e-3)):
        np.testing.assert_allclose(np.asarray(b), a, atol=tol)


def test_mfcc_input_jit():
    y = _chirp(8000)
    cfg = FeatureConfig(calc_mfcc_derivate=True)
    fn = jax.jit(lambda w: ops.mfcc_input(w, cfg, xp=jnp))
    out = fn(jnp.asarray(y))
    ref = ops.mfcc_input(y, cfg, xp=np)
    np.testing.assert_allclose(np.asarray(out[0]), ref[0], atol=2e-3)


def test_phn_frame_targets():
    # two phones: [0, 800) 'a', [800, 1600) 'b'; hop 80, win 400
    phn_v = [(0, 800, "a"), (800, 1600, "b")]
    idx = ops.phn_frame_targets(1600, phn_v, {"a": 0, "b": 1}, 80, 400)
    assert idx.shape == (21,)
    assert idx[0] == 0 and idx[-1] == 1
    # frame centers at i*80; window [i*80-200, i*80+200): majority flips at 800
    flip = np.argmax(idx == 1)
    assert 8 <= flip <= 12


# ------------------------------------------------------------ griffin-lim ---

def _np_griffin_lim(S_amp, phase0, num_iters, n_fft=400, hop=80, win=400):
    """Numpy mirror of the reference loop (audio_lib.py:249-274)."""
    S = S_amp * np.exp(1j * phase0)
    wav = None
    for i in range(num_iters):
        wav = ops.istft(S, hop_length=hop, win_length=win, xp=np)
        if i != num_iters - 1:
            S2 = ops.stft(wav, n_fft=n_fft, hop_length=hop, win_length=win, xp=np)
            S = S_amp * np.exp(1j * np.angle(S2))
    return wav


def test_griffin_lim_matches_numpy_reference_loop():
    """Device GL with a pinned init phase == the host mirror of the reference
    algorithm, iteration for iteration."""
    sr = 16000
    t = np.arange(4000) / sr
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    S_amp = np.abs(ops.stft(y, n_fft=400, hop_length=80, xp=np)).astype(np.float32)
    phase0 = (np.pi * np.random.default_rng(7).random(S_amp.shape)).astype(np.float32)

    ref = _np_griffin_lim(S_amp, phase0, num_iters=12)
    dev = np.asarray(
        ops.griffin_lim(jnp.asarray(S_amp), win_length=400, hop_length=80,
                        num_iters=12, init_phase=phase0)
    )
    assert dev.shape == ref.shape
    np.testing.assert_allclose(dev, ref, atol=5e-3)


def test_griffin_lim_converges():
    """Spectral distance to the target magnitude decreases with iterations."""
    sr = 16000
    t = np.arange(4000) / sr
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    S_amp = np.abs(ops.stft(y, n_fft=400, hop_length=80, xp=np)).astype(np.float32)

    def rel_err(n):
        wav = np.asarray(
            ops.griffin_lim(jnp.asarray(S_amp), win_length=400, hop_length=80, num_iters=n)
        )
        S_rec = np.abs(ops.stft(wav, n_fft=400, hop_length=80, xp=np))
        return np.linalg.norm(S_rec - S_amp) / np.linalg.norm(S_amp)

    e5, e40 = rel_err(5), rel_err(40)
    assert e40 < e5 < 1.0
    assert e40 < 0.3


def test_fast_griffin_lim_converges_better():
    """momentum>0 (Fast GL) must beat the plain reference loop at equal
    iteration count on spectral distance."""
    sr = 16000
    t = np.arange(4000) / sr
    y = (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1230 * t)).astype(np.float32)
    S_amp = np.abs(ops.stft(y, n_fft=400, hop_length=80, xp=np)).astype(np.float32)

    def rel_err(momentum):
        wav = np.asarray(ops.griffin_lim(jnp.asarray(S_amp), win_length=400,
                                         hop_length=80, num_iters=30,
                                         momentum=momentum))
        S_rec = np.abs(ops.stft(wav, n_fft=400, hop_length=80, xp=np))
        return np.linalg.norm(S_rec - S_amp) / np.linalg.norm(S_amp)

    plain, fast = rel_err(0.0), rel_err(0.99)
    assert fast < plain, (plain, fast)


def test_from_power_to_wav_runs_and_norms():
    y = _chirp(4000)
    cfg = FeatureConfig()
    _, _, P_dB = ops.mfcc_input(y, cfg, xp=np)
    wav = np.asarray(
        ops.from_power_to_wav(jnp.asarray(P_dB), hop_length=80, win_length=400,
                              mean_abs_amp_norm=0.01, n_iter=8, realse=1.2)
    )
    assert np.isfinite(wav).all()
    np.testing.assert_allclose(np.mean(np.abs(wav)), 0.01, rtol=1e-3)


def test_stft_nfft_larger_than_window():
    """n_fft > win_length: window zero-padded centered (reference supports an
    explicit n_fft, audio_lib.py:117)."""
    y = _chirp(4000)
    S_np = ops.stft(y, n_fft=512, hop_length=128, win_length=400, xp=np)
    assert S_np.shape[1] == 257
    S_j = np.asarray(ops.stft(jnp.asarray(y), n_fft=512, hop_length=128,
                              win_length=400, xp=jnp))
    np.testing.assert_allclose(np.abs(S_j), np.abs(S_np), atol=2e-3)
    # istft round-trip with the padded window
    for xp in (np, jnp):
        S = ops.stft(xp.asarray(y), n_fft=512, hop_length=128, win_length=400, xp=xp)
        y_rec = np.asarray(ops.istft(S, hop_length=128, win_length=400,
                                     n_fft=512, xp=xp))
        n = min(len(y), len(y_rec))
        np.testing.assert_allclose(y_rec[512:n-512], y[512:n-512], atol=5e-3)


def test_griffin_lim_unroll_is_identical():
    """unroll replicates the loop body only — bit-identical reconstruction
    under jit, the deployed form (ops/griffin_lim.py; the knob exists to
    amortize the runtime's fixed per-while-iteration dispatch cost,
    docs/DESIGN.md). unroll >= num_iters-1 traces straight-line with no
    while loop at all; only un-jitted eager execution may differ from the
    compiled loop (per-op rounding), which no caller uses."""
    import functools

    import jax

    from speech_cloner_tpu.ops.griffin_lim import griffin_lim

    amp = jnp.asarray(np.abs(RNG.standard_normal((60, 201))).astype(np.float32))
    key = jax.random.PRNGKey(3)
    for momentum in (0.0, 0.99):
        def run(k, momentum=momentum):
            fn = jax.jit(functools.partial(
                griffin_lim, win_length=400, hop_length=80, num_iters=9,
                n_fft=400, momentum=momentum, unroll=k))
            return np.asarray(fn(amp, key=key))

        y1 = run(1)
        for k in (3, 5, 8):  # 5 rounds down to divisor 4; 8 = full unroll
            np.testing.assert_array_equal(y1, run(k))


def test_griffin_lim_dyn_matches_static():
    """The dynamic-trip-count form (num_iters/momentum as traced runtime
    values — ONE executable for every quality setting, ops/griffin_lim.py
    griffin_lim_dyn) reconstructs identically to the static loop at momentum
    0 and 0.99. The only tolerated difference is the sign of zeros (momentum
    0.0 computes P + 0*(P-P_prev)), which |.|/normalize cannot observe."""
    import functools

    import jax

    from speech_cloner_tpu.ops.griffin_lim import griffin_lim, griffin_lim_dyn

    amp = jnp.asarray(np.abs(RNG.standard_normal((60, 201))).astype(np.float32))
    key = jax.random.PRNGKey(3)
    dyn = jax.jit(functools.partial(
        griffin_lim_dyn, win_length=400, hop_length=80, n_fft=400))
    for momentum in (0.0, 0.99):
        ref = np.asarray(jax.jit(functools.partial(
            griffin_lim, win_length=400, hop_length=80, num_iters=9,
            n_fft=400, momentum=momentum))(amp, key=key))
        got = np.asarray(dyn(amp, num_iters=np.int32(9),
                             momentum=np.float32(momentum), key=key))
        np.testing.assert_allclose(got, ref, atol=0.0, rtol=0.0)
    # num_iters really is runtime data: same executable, different counts
    y3 = np.asarray(dyn(amp, num_iters=np.int32(3), momentum=np.float32(0.0), key=key))
    y9 = np.asarray(dyn(amp, num_iters=np.int32(9), momentum=np.float32(0.0), key=key))
    assert np.abs(y3 - y9).max() > 0.0


def test_matmul_dft_matches_fft():
    """dft="matmul" (MXU matmul against cos/sin bases — no FFT custom call,
    ops/stft.py _dft_mats) must match the FFT path to float32 round-off on
    both backends, for stft, istft round-trip, and the dynamic GL."""
    y = _chirp(4000)
    for xp in (np, jnp):
        ref = np.asarray(ops.stft(xp.asarray(y), n_fft=400, hop_length=80, xp=xp))
        got = np.asarray(ops.stft(xp.asarray(y), n_fft=400, hop_length=80, xp=xp,
                                  dft="matmul"))
        np.testing.assert_allclose(got, ref, atol=2e-4)
        rec_ref = np.asarray(ops.istft(xp.asarray(ref), hop_length=80, xp=xp))
        rec_got = np.asarray(ops.istft(xp.asarray(ref), hop_length=80, xp=xp,
                                       dft="matmul"))
        np.testing.assert_allclose(rec_got, rec_ref, atol=2e-5)

    # GL end-to-end: same init phase, both paths reconstruct ~the same wav
    import functools

    from speech_cloner_tpu.ops.griffin_lim import griffin_lim_dyn

    S_amp = np.abs(ops.stft(y, n_fft=400, hop_length=80, xp=np)).astype(np.float32)
    phase0 = (np.pi * np.random.default_rng(7).random(S_amp.shape)).astype(np.float32)
    outs = {}
    for dft in ("fft", "matmul"):
        fn = jax.jit(functools.partial(
            griffin_lim_dyn, win_length=400, hop_length=80, n_fft=400, dft=dft))
        outs[dft] = np.asarray(fn(jnp.asarray(S_amp), num_iters=np.int32(8),
                                  momentum=np.float32(0.0), init_phase=phase0))
    np.testing.assert_allclose(outs["matmul"], outs["fft"], atol=5e-4)


def test_from_power_to_wav_dyn_matches_static():
    import functools

    y = _chirp(4000)
    cfg = FeatureConfig()
    _, _, P_dB = ops.mfcc_input(y, cfg, xp=np)
    ref = np.asarray(jax.jit(functools.partial(
        ops.from_power_to_wav, hop_length=80, win_length=400,
        mean_abs_amp_norm=0.01, n_iter=8, realse=1.2))(jnp.asarray(P_dB)))
    got = np.asarray(jax.jit(functools.partial(
        ops.from_power_to_wav_dyn, hop_length=80, win_length=400,
        mean_abs_amp_norm=0.01, realse=1.2))(
            jnp.asarray(P_dB), np.int32(8), np.float32(0.0)))
    np.testing.assert_allclose(got, ref, atol=0.0, rtol=0.0)
