"""Tests for the completeness-surface extras: embed, attention decoder,
streaming evaluators, viz, determinism, TIMIT aux samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_cloner_tpu.models import decoder as dec_m
from speech_cloner_tpu.models import encoder as enc_m
from speech_cloner_tpu.nn.attention import (
    attention_decoder_apply,
    attention_decoder_init,
    embed_apply,
    embed_init,
)
from speech_cloner_tpu.train.evaluate import encoder_predict, eval_acc, eval_loss

RNG = np.random.default_rng(0)


def test_embed_zero_pad():
    params = embed_init(jax.random.PRNGKey(0), vocab_size=10, num_units=6)
    out = embed_apply(params, jnp.asarray([[0, 1, 2]]))
    assert out.shape == (1, 3, 6)
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.zeros(6))  # row 0 zeroed
    assert np.abs(np.asarray(out[0, 1])).sum() > 0


def test_attention_decoder_shapes_and_alignment():
    B, Tq, Tm = 2, 5, 9
    params = attention_decoder_init(jax.random.PRNGKey(1), in_dim=4, memory_dim=7,
                                    num_units=8)
    inputs = jnp.asarray(RNG.standard_normal((B, Tq, 4)), jnp.float32)
    memory = jnp.asarray(RNG.standard_normal((B, Tm, 7)), jnp.float32)
    out, align = attention_decoder_apply(params, inputs, memory)
    assert out.shape == (B, Tq, 8)
    assert align.shape == (B, Tq, Tm)
    np.testing.assert_allclose(np.asarray(align.sum(-1)), 1.0, atol=1e-5)


def _tiny_models():
    enc_cfg = enc_m.EncoderConfig(n_timesteps=24, input_dim=8, n_output=61,
                                  num_conv_banks=2, num_highwaynet_blocks=1)
    dec_cfg = dec_m.DecoderConfig(
        n_timesteps=24, input_dim=61,
        step1=dec_m.DecoderStepConfig(16, 2, 1, 10),
        step2=dec_m.DecoderStepConfig(16, 2, 1, 13))
    ep, es = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
    dp, ds = dec_m.init(jax.random.PRNGKey(1), dec_cfg)
    return enc_cfg, ep, es, dec_cfg, dp, ds


def test_encoder_predict_and_eval_acc():
    enc_cfg, ep, es, *_ = _tiny_models()
    x = RNG.standard_normal((5, 24, 8)).astype(np.float32)
    probs = encoder_predict(ep, es, x, cfg=enc_cfg, batch_size=2)
    assert probs.shape == (5, 24, 61)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)

    phn = np.eye(61, dtype=np.float32)[RNG.integers(0, 61, (5, 24))]
    acc, n = eval_acc(ep, es, [(x, phn)], cfg=enc_cfg)
    assert 0.0 <= acc <= 1.0 and n == 5 * 24


def test_eval_loss():
    enc_cfg, ep, es, dec_cfg, dp, ds = _tiny_models()
    x = RNG.standard_normal((3, 24, 8)).astype(np.float32)
    mel = RNG.standard_normal((3, 24, 10)).astype(np.float32) * 0.1
    stft = RNG.standard_normal((3, 24, 13)).astype(np.float32) * 0.1
    loss, mel_l, stft_l, mcd = eval_loss(dp, ds, [(x, mel, stft)], enc_params=ep,
                                         enc_state=es, enc_cfg=enc_cfg, dec_cfg=dec_cfg)
    assert np.isfinite([loss, mel_l, stft_l, mcd]).all()
    assert abs(loss - (mel_l + stft_l)) < 1e-3
    assert mcd > 0.0


def test_mel_cepstral_distortion():
    """MCD metric: zero on identical inputs, positive and scale-correct on a
    known perturbation (c_0-only shifts — the excluded energy coefficient —
    contribute nothing)."""
    from speech_cloner_tpu.train.metrics import mel_cepstral_distortion

    mel = RNG.standard_normal((2, 24, 80)).astype(np.float32) * 0.1
    assert float(mel_cepstral_distortion(mel, mel)) == 0.0
    # a uniform offset moves only c_0 (flat vector is orthogonal to every
    # DCT basis row k>=1) -> MCD stays zero
    np.testing.assert_allclose(
        float(mel_cepstral_distortion(mel, mel + 0.3)), 0.0, atol=1e-4)
    # a non-flat perturbation yields a positive distortion that grows with
    # the perturbation scale
    bump = (RNG.standard_normal((2, 24, 80)) * 0.01).astype(np.float32)
    d1 = float(mel_cepstral_distortion(mel, mel + bump))
    d2 = float(mel_cepstral_distortion(mel, mel + 2 * bump))
    assert d1 > 0.0
    np.testing.assert_allclose(d2, 2 * d1, rtol=1e-4)


def test_training_determinism():
    """Same seeds -> bitwise-identical params after several train steps
    (SURVEY.md §5: determinism instead of race detection)."""
    from speech_cloner_tpu.train import OptimizerConfig, encoder_train_step, make_train_state

    enc_cfg, *_ = _tiny_models()
    x = jnp.asarray(RNG.standard_normal((2, 24, 8)), jnp.float32)
    y = jnp.asarray(np.eye(61, dtype=np.float32)[RNG.integers(0, 61, (2, 24))])

    def run():
        params, state = enc_m.init(jax.random.PRNGKey(7), enc_cfg)
        opt_cfg = OptimizerConfig()
        opt = opt_cfg.make()
        ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(8))
        step = jax.jit(lambda t: encoder_train_step(t, x, y, cfg=enc_cfg,
                                                    opt_cfg=opt_cfg, opt=opt))
        for _ in range(5):
            ts, _ = step(ts)
        return ts

    a, b = run(), run()
    for la, lb in zip(jax.tree.leaves(a["params"]), jax.tree.leaves(b["params"])):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_viz_saves_files(tmp_path):
    from speech_cloner_tpu.data.viz import spec_comparison, spec_show

    spec = RNG.standard_normal((60, 20)).astype(np.float32)
    phn = np.eye(61, dtype=np.float32)[np.repeat([3, 9], 30)]
    p1 = str(tmp_path / "spec.png")
    spec_show(spec, phn_v=phn, idx2phn={i: str(i) for i in range(61)}, save_path=p1)
    p2 = str(tmp_path / "cmp.png")
    spec_comparison(spec, spec, spec, spec, save_path=p2)
    import os

    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_timit_aux_samplers(tmp_path_factory):
    from tests.test_data import _feat_cfg, _make_timit_tree
    from speech_cloner_tpu.data.timit import TIMIT

    root = str(tmp_path_factory.mktemp("timit_aux"))
    _make_timit_tree(root)
    ds = TIMIT(root, _feat_cfg(), n_timesteps=40, seed=0)
    ds.build_spec_cache()

    x, y = next(iter(ds.frame_sampler(batch_size=8)))
    assert x.shape == (8, ds.feat_cfg.input_dim) and y.shape == (8, 61)

    xw, yw = next(iter(ds.phoneme_sampler(batch_size=4, n_padd=2000)))
    assert xw.shape == (4, 2000)
    assert set(yw) <= {"sh", "iy"}


def test_profiler_helpers(tmp_path):
    from speech_cloner_tpu.runtime.profiler import annotate, device_memory_stats, trace

    with trace(str(tmp_path / "trace")):
        with annotate("test_region"):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    import os

    assert os.path.isdir(str(tmp_path / "trace"))
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1


def test_metrics_writer(tmp_path):
    import json

    from speech_cloner_tpu.runtime.logging import MetricsWriter, StepTimer

    w = MetricsWriter(str(tmp_path), "trn")
    w.write(1, {"loss": jnp.asarray(1.5), "acc": 0.25})
    w.write_array(1, "confusion", np.eye(3))
    w.close()
    rec = json.loads(open(str(tmp_path / "trn.jsonl")).readline())
    assert rec["loss"] == 1.5 and rec["step"] == 1
    assert np.load(str(tmp_path / "confusion_1.npy")).shape == (3, 3)

    t = StepTimer()
    t.tick(); t.tick()
    assert t.steps_per_sec > 0
