"""Sequence-parallel Griffin-Lim: must match the single-device loop given the
same init phase (exact seams, exact edge reflections, iteration for
iteration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_cloner_tpu import ops
from speech_cloner_tpu.parallel import make_seq_mesh
from speech_cloner_tpu.parallel.gl_sp import (
    from_power_to_wav_seq_parallel,
    griffin_lim_seq_parallel,
)

RNG = np.random.default_rng(0)
NSEQ = 4


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= NSEQ
    return make_seq_mesh(NSEQ)


def _amp(T=160):
    sr = 16000
    t = np.arange(T * 80 + 400) / sr
    y = (np.sin(2 * np.pi * 330 * t) + 0.4 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    S = np.abs(ops.stft(y, n_fft=400, hop_length=80, xp=np)).astype(np.float32)
    return S[:T]


@pytest.mark.parametrize("iters", [1, 3, 12])
def test_gl_sp_matches_single_device(mesh, iters):
    S_amp = _amp()
    phase0 = (np.pi * RNG.random(S_amp.shape)).astype(np.float32)

    ref = np.asarray(ops.griffin_lim(jnp.asarray(S_amp), 400, 80,
                                     num_iters=iters, init_phase=phase0))
    got = np.asarray(griffin_lim_seq_parallel(jnp.asarray(S_amp), mesh,
                                              num_iters=iters,
                                              init_phase=phase0))
    assert got.shape == ref.shape
    # exact up to float addition order; errors must NOT grow at seams/edges
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_gl_sp_momentum_matches(mesh):
    S_amp = _amp()
    phase0 = (np.pi * RNG.random(S_amp.shape)).astype(np.float32)
    ref = np.asarray(ops.griffin_lim(jnp.asarray(S_amp), 400, 80, num_iters=8,
                                     init_phase=phase0, momentum=0.99))
    got = np.asarray(griffin_lim_seq_parallel(jnp.asarray(S_amp), mesh,
                                              num_iters=8, init_phase=phase0,
                                              momentum=0.99))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_from_power_to_wav_sp_matches(mesh):
    T = 160
    rng = np.random.default_rng(1)
    P_dB = rng.random((T, 201)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    phase0 = np.asarray(
        jnp.pi * jax.random.uniform(key, (T, 201), dtype=jnp.float32))

    ref = np.asarray(ops.from_power_to_wav(
        jnp.asarray(P_dB), hop_length=80, win_length=400,
        mean_abs_amp_norm=0.045, n_iter=6, realse=1.2, key=key))
    # seq-parallel path with the same key (same init phase)
    got = np.asarray(from_power_to_wav_seq_parallel(
        jnp.asarray(P_dB), mesh, hop_length=80, win_length=400,
        mean_abs_amp_norm=0.045, n_iter=6, realse=1.2, key=key))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)
