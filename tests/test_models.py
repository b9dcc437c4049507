"""Model shape/dtype/jit tests (encoder, decoder, speaker-id) and
checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_cloner_tpu.models import decoder, encoder, speaker_id
from speech_cloner_tpu.runtime.checkpoint import Checkpointer

KEY = jax.random.PRNGKey(0)


def _small_enc_cfg():
    return encoder.EncoderConfig(n_timesteps=40, input_dim=16, n_output=61,
                                 num_conv_banks=3, num_highwaynet_blocks=1)


def _small_dec_cfg():
    return decoder.DecoderConfig(
        n_timesteps=40, input_dim=61,
        step1=decoder.DecoderStepConfig(32, 4, 2, 20),
        step2=decoder.DecoderStepConfig(48, 4, 2, 51),
    )


def test_encoder_shapes_train_and_eval():
    cfg = _small_enc_cfg()
    params, state = encoder.init(KEY, cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 40, 16)), jnp.float32)

    logits, new_state = encoder.apply(params, state, x, cfg=cfg, train=True,
                                      rng=jax.random.PRNGKey(1))
    assert logits.shape == (2, 40, 61)
    # train mode must update BN moving stats
    assert not np.allclose(np.asarray(new_state["CBHG"]["banks"]["bn"]["mean"]),
                           np.asarray(state["CBHG"]["banks"]["bn"]["mean"]))

    logits_e, state_e = encoder.apply(params, state, x, cfg=cfg, train=False)
    assert logits_e.shape == (2, 40, 61)
    # eval mode leaves state untouched
    np.testing.assert_array_equal(np.asarray(state_e["CBHG"]["bn1"]["mean"]),
                                  np.asarray(state["CBHG"]["bn1"]["mean"]))
    probs = encoder.posteriors(logits_e)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_encoder_jit_matches_eager():
    cfg = _small_enc_cfg()
    params, state = encoder.init(KEY, cfg)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 40, 16)), jnp.float32)
    eager, _ = encoder.apply(params, state, x, cfg=cfg, train=False)
    jitted, _ = jax.jit(
        lambda p, s, xx: encoder.apply(p, s, xx, cfg=cfg, train=False)
    )(params, state, x)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), atol=1e-5)


def test_decoder_shapes_and_scheduled_mix():
    cfg = _small_dec_cfg()
    params, state = decoder.init(KEY, cfg)
    ppg = jax.nn.softmax(
        jnp.asarray(np.random.default_rng(2).standard_normal((2, 40, 61)), jnp.float32))
    y_mel, y_stft, _ = decoder.apply(params, state, ppg, cfg=cfg, train=False)
    assert y_mel.shape == (2, 40, 20)
    assert y_stft.shape == (2, 40, 51)

    # scheduled mel mix: f=0 must feed target_mel into step2 (decoder.py:152)
    cfg_mix = decoder.DecoderConfig(
        n_timesteps=40, input_dim=61, step1=cfg.step1, step2=cfg.step2,
        use_target_mel_step2=True)
    tgt = jnp.zeros((2, 40, 20))
    _, y_stft0, _ = decoder.apply(params, state, ppg, cfg=cfg_mix, train=False,
                                  target_mel=tgt, f_mel_pred=0.0)
    _, y_stft_t, _ = decoder.apply(params, state, jnp.zeros_like(ppg) + ppg,
                                   cfg=cfg_mix, train=False,
                                   target_mel=y_mel, f_mel_pred=1.0)
    # f=1.0 equals the no-mix path
    _, y_stft_plain, _ = decoder.apply(params, state, ppg, cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(y_stft_t), np.asarray(y_stft_plain), atol=1e-5)
    assert not np.allclose(np.asarray(y_stft0), np.asarray(y_stft_plain))


def test_speaker_id_shapes():
    cfg = speaker_id.SpeakerIdConfig(n_timesteps=60, n_features=41, n_output=8)
    params, state = speaker_id.init(KEY, cfg)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 60, 41)), jnp.float32)
    logits, _ = speaker_id.apply(params, state, x, cfg=cfg, train=False)
    assert logits.shape == (2, 8)
    logits_t, new_state = speaker_id.apply(params, state, x, cfg=cfg, train=True)
    assert logits_t.shape == (2, 8)
    assert not np.allclose(np.asarray(new_state["bn"]["mean"]),
                           np.asarray(state["bn"]["mean"]))


def test_checkpoint_roundtrip_and_prune(tmp_path):
    cfg = _small_enc_cfg()
    params, state = encoder.init(KEY, cfg)
    ck = Checkpointer(str(tmp_path), "encoder")
    bundle = {"params": params, "state": state, "step": 7, "epoch": 2}
    ck.save(bundle, step=7, config={"note": "test"}, sync=True)
    ck.save(bundle, step=14, sync=True)

    restored, step = ck.restore()
    assert step == 14
    ref_leaves = jax.tree.leaves(params)
    got_leaves = jax.tree.leaves(restored["params"])
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored["step"]) == 7

    # prune: floor removes step 7
    for s in (21, 28, 35):
        ck.save(bundle, step=s, sync=True)
    ck.prune(n_keep=2, step_min=14)
    assert 7 not in ck.steps()
    assert 35 in ck.steps()


def test_config_roundtrip(tmp_path):
    from speech_cloner_tpu.runtime.config import load_cfg_d, save_cfg_d

    cfg = {"a": 1, "nested": {"b": [1, 2]}}
    p = str(tmp_path / "cfg.json")
    assert save_cfg_d(cfg, p)
    assert load_cfg_d(p) == cfg
    assert not save_cfg_d(cfg, p)  # unchanged -> no write
    assert not save_cfg_d({"a": 2}, p, on_conflict="keep")
    assert load_cfg_d(p) == cfg


def test_reference_cfg_construction():
    """Models build from the shipped hp/*.json configs."""
    import json

    with open("/root/reference/hp/encoder_cfg_d.json") as f:
        enc_cfg = encoder.config_from_cfg_d(json.load(f))
    assert enc_cfg.input_dim == 80 and enc_cfg.num_conv_banks == 6
    with open("/root/reference/hp/decoder_cfg_d.json") as f:
        dec_cfg = decoder.config_from_cfg_d(json.load(f))
    assert dec_cfg.step1.n_output == 80 and dec_cfg.step2.n_output == 201
    assert dec_cfg.step2.embed_size == 512


def test_fused_gru_model_parity():
    """fused_gru=True is a pure execution-strategy switch: identical params,
    same outputs (encoder logits and decoder spectrograms) to fp tolerance."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m

    rng = np.random.default_rng(3)
    enc_cfg = enc_m.EncoderConfig(n_timesteps=24, input_dim=12, n_output=61,
                                  num_conv_banks=2, num_highwaynet_blocks=1)
    params, state = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
    x = jnp.asarray(rng.standard_normal((2, 24, 12)), jnp.float32)
    y0, _ = enc_m.apply(params, state, x, cfg=enc_cfg, train=False)
    y1, _ = enc_m.apply(params, state, x,
                        cfg=dataclasses.replace(enc_cfg, fused_gru=True),
                        train=False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)

    dec_cfg = dec_m.DecoderConfig(
        n_timesteps=24, input_dim=61,
        step1=dec_m.DecoderStepConfig(16, 2, 1, 10),
        step2=dec_m.DecoderStepConfig(24, 2, 1, 21))
    dp, ds = dec_m.init(jax.random.PRNGKey(1), dec_cfg)
    ppg = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 24, 61)), jnp.float32))
    m0, s0, _ = dec_m.apply(dp, ds, ppg, cfg=dec_cfg, train=False)
    fused = dataclasses.replace(
        dec_cfg,
        step1=dataclasses.replace(dec_cfg.step1, fused_gru=True),
        step2=dataclasses.replace(dec_cfg.step2, fused_gru=True))
    m1, s1, _ = dec_m.apply(dp, ds, ppg, cfg=fused, train=False)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5, atol=1e-5)


def test_decoder_use_lstm_forwarded_to_stacks():
    """cfg_d['use_lstm'] must reach BOTH CBHG stacks (the reference passes it
    at decoder.py:123 and :175); a GRU tree has gates/candidate kernels, an
    LSTM tree one fused [in+H, 4H] kernel."""
    import jax

    from speech_cloner_tpu.models import decoder as dec_m

    cfg_d = {"input_shape": [16, 61], "use_lstm": True,
             "steps_v": [
                 {"embed_size": 16, "num_conv_banks": 2,
                  "num_highwaynet_blocks": 1, "n_output": 10},
                 {"embed_size": 16, "num_conv_banks": 2,
                  "num_highwaynet_blocks": 1, "n_output": 21}]}
    cfg = dec_m.config_from_cfg_d(cfg_d)
    assert cfg.step1.use_lstm and cfg.step2.use_lstm
    params, state = dec_m.init(jax.random.PRNGKey(0), cfg)
    for stepname in ("step1", "step2"):
        gru = params[stepname]["CBHG"]["gru"]
        assert "kernel" in gru["fw"], f"{stepname} built a GRU, not an LSTM"
    import jax.numpy as jnp
    import numpy as np

    ppg = jax.nn.softmax(jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 61)), jnp.float32))
    y_mel, y_stft, _ = dec_m.apply(params, state, ppg, cfg=cfg, train=False)
    assert y_mel.shape == (2, 16, 10) and y_stft.shape == (2, 16, 21)


def test_speaker_id_time_fold_variant():
    """time_fold=k folds k consecutive frames into conv input channels
    ([B,T,F] -> [B,T/k,F,k]) — shapes, finiteness, and that the channel
    layout really carries consecutive frames (a constant-in-time input is
    invariant to the fold position)."""
    import jax
    import jax.numpy as jnp

    from speech_cloner_tpu.models import speaker_id as spk_m

    cfg = spk_m.SpeakerIdConfig(n_timesteps=80, n_features=41, n_output=5,
                                time_fold=4)
    # the folded geometry must survive both conv/pool stages
    assert cfg.flat_dim > 0
    h_rows = ((80 // 4 - 4) // 2 - 2) // 2
    w_cols = ((41 - 4) // 2 - 2) // 2
    assert cfg.flat_dim == h_rows * w_cols * 64
    params, state = spk_m.init(jax.random.PRNGKey(0), cfg)
    assert params["conv1"]["kernel"].shape == (5, 5, 4, 32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 80, 41)), jnp.float32)
    logits, new_state = spk_m.apply(params, state, x, cfg=cfg, train=True)
    assert logits.shape == (3, 5)
    assert bool(jnp.isfinite(logits).all())
    assert not bool(jnp.allclose(logits, logits[0]))  # not collapsed
