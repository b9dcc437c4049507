"""Pallas kernel correctness (interpret mode on CPU) vs the lax.scan path."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_cloner_tpu.nn import modules as M
from speech_cloner_tpu.ops.pallas_kernels import gru_dir_apply_pallas, use_pallas_gru

RNG = np.random.default_rng(0)


def test_pallas_gru_matches_scan():
    B, T, C, H = 4, 24, 8, 16
    params = M.gru_dir_init(jax.random.PRNGKey(0), C, H)
    x = jnp.asarray(RNG.standard_normal((B, T, C)) * 0.5, jnp.float32)
    ref = M._gru_dir_apply(params, x)
    got = gru_dir_apply_pallas(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_gru_switch_restores():
    B, T, C, H = 2, 10, 6, 8
    params = M.gru_init(jax.random.PRNGKey(1), C, H)
    x = jnp.asarray(RNG.standard_normal((B, T, C)) * 0.5, jnp.float32)
    ref = M.gru_apply(params, x)
    restore = use_pallas_gru(interpret=True)
    try:
        got = M.gru_apply(params, x)
    finally:
        restore()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # restored path is the original function again
    ref2 = M.gru_apply(params, x)
    np.testing.assert_array_equal(np.asarray(ref2), np.asarray(ref))


def test_gru_apply_fused_matches_default():
    B, T, C, H = 2, 12, 6, 8
    params = M.gru_init(jax.random.PRNGKey(2), C, H)
    x = jnp.asarray(RNG.standard_normal((B, T, C)) * 0.5, jnp.float32)
    ref = M.gru_apply(params, x)
    got = M.gru_apply_fused(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
