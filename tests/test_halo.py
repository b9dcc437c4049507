"""Sequence-parallel halo tests: sharded ops must equal their unsharded
references exactly (convs/pool) or to warmup precision (GRU/encoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from speech_cloner_tpu.models import encoder as enc_m
from speech_cloner_tpu.nn import modules as M
from speech_cloner_tpu.parallel import make_seq_mesh
from speech_cloner_tpu.parallel import halo as H

RNG = np.random.default_rng(0)
NSEQ = 4


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= NSEQ
    return make_seq_mesh(NSEQ)


def _smap(mesh, fn, n_in=1):
    return shard_map(fn, mesh=mesh,
                     in_specs=tuple([P(None, "seq", None)] * n_in),
                     out_specs=P(None, "seq", None))


def test_conv_halo_exact(mesh):
    for k in (1, 2, 3, 6, 8):
        x = jnp.asarray(RNG.standard_normal((2, 64, 8)), jnp.float32)
        params = M.conv1d_init(jax.random.PRNGKey(k), k, 8, 5)
        ref = M.conv1d(params, x)
        got = _smap(mesh, lambda xx: H.conv1d_halo(params, xx, "seq"))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_maxpool_halo_exact(mesh):
    x = jnp.asarray(RNG.standard_normal((2, 64, 8)), jnp.float32)
    ref = M.maxpool1d_same(x)
    got = _smap(mesh, lambda xx: H.maxpool1d_same_halo(xx, "seq"))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_bigru_warmup_interior_converged(mesh):
    B, T, C, Hd = 1, 128, 6, 8
    params = M.gru_init(jax.random.PRNGKey(0), C, Hd)
    x = jnp.asarray(RNG.standard_normal((B, T, C)) * 0.5, jnp.float32)
    ref = M.gru_apply(params, x)
    got = _smap(mesh, lambda xx: H.bigru_warmup(params, xx, warmup=16, axis_name="seq"))(x)
    # warmup=16 frames: GRU state converges to ~1e-2; interior of each shard
    # must be close; and larger warmup must be strictly closer
    err16 = float(jnp.max(jnp.abs(got - ref)))
    got24 = _smap(mesh, lambda xx: H.bigru_warmup(params, xx, warmup=24, axis_name="seq"))(x)
    err24 = float(jnp.max(jnp.abs(got24 - ref)))
    assert err24 <= err16 + 1e-6
    assert err24 < 0.05, (err16, err24)


def test_clone_forward_seq_parallel_matches_full(mesh):
    from speech_cloner_tpu.models import decoder as dec_m

    enc_cfg = enc_m.EncoderConfig(n_timesteps=128, input_dim=16, n_output=61,
                                  num_conv_banks=2, num_highwaynet_blocks=1)
    dec_cfg = dec_m.DecoderConfig(
        n_timesteps=128, input_dim=61,
        step1=dec_m.DecoderStepConfig(32, 2, 1, 20),
        step2=dec_m.DecoderStepConfig(48, 2, 1, 51))
    ep, es = enc_m.init(jax.random.PRNGKey(2), enc_cfg)
    dp, ds_ = dec_m.init(jax.random.PRNGKey(3), dec_cfg)
    x = jnp.asarray(RNG.standard_normal((1, 128, 16)), jnp.float32)

    logits, _ = enc_m.apply(ep, es, x, cfg=enc_cfg, train=False)
    ppg_ref = jax.nn.softmax(logits, -1)
    mel_ref, stft_ref, _ = dec_m.apply(dp, ds_, ppg_ref, cfg=dec_cfg, train=False)

    fn = H.clone_forward_seq_parallel(ep, es, enc_cfg, dp, ds_, dec_cfg, mesh,
                                      warmup=32)
    mel, stft, ppg = fn(x)
    assert float(jnp.max(jnp.abs(ppg - ppg_ref))) < 0.05
    assert float(jnp.max(jnp.abs(mel - mel_ref))) < 0.1
    assert float(jnp.median(jnp.abs(stft - stft_ref))) < 1e-3


def test_encoder_seq_parallel_matches_full(mesh):
    cfg = enc_m.EncoderConfig(n_timesteps=128, input_dim=16, n_output=61,
                              num_conv_banks=3, num_highwaynet_blocks=1)
    params, state = enc_m.init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(RNG.standard_normal((1, 128, 16)), jnp.float32)

    ref, _ = enc_m.apply(params, state, x, cfg=cfg, train=False)
    fn = H.encoder_seq_parallel(params, state, cfg, mesh, warmup=32)
    got = fn(x)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.05, err
    # and most entries are numerically identical (conv path exact, GRU interior converged)
    med = float(jnp.median(jnp.abs(got - ref)))
    assert med < 1e-4, med


def test_fused_gru_shard_map_batch_sharded(mesh):
    """gru_apply_fused must be traceable under shard_map: its h0 derives its
    type (incl. varying manual axes) from x, like _gru_dir_apply always has.
    Regression for the round-2 advisor repro ('carry input and carry output
    must have equal types ... varying manual axes do not match')."""
    B, T, C, Hd = NSEQ, 32, 6, 8
    params = M.gru_init(jax.random.PRNGKey(4), C, Hd)
    x = jnp.asarray(RNG.standard_normal((B, T, C)) * 0.5, jnp.float32)
    ref = M.gru_apply_fused(params, x)
    got = shard_map(lambda xx: M.gru_apply_fused(params, xx), mesh=mesh,
                    in_specs=(P("seq", None, None),),
                    out_specs=P("seq", None, None))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
