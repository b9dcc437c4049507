"""Synthetic corpus generator + conversion-verification loop tests."""

import os

import numpy as np
import pytest

from speech_cloner_tpu.data.synth_corpus import (
    SOURCE_PROFILE,
    TARGET_PROFILE,
    make_arctic_tree,
    make_timit_tree,
    synth_utterance,
)
from speech_cloner_tpu.ops.features import FeatureConfig


def _feat_cfg():
    return FeatureConfig(hop_length=80, win_length=400, n_mels=20, n_mfcc=10)


def test_synth_utterance_deterministic():
    w1, s1 = synth_utterance(np.random.default_rng(7), TARGET_PROFILE, n_phones=8)
    w2, s2 = synth_utterance(np.random.default_rng(7), TARGET_PROFILE, n_phones=8)
    np.testing.assert_array_equal(w1, w2)
    assert s1 == s2
    assert s1[0][2] == "h#" and s1[-1][2] == "h#"
    assert s1[-1][1] == len(w1)  # labels cover the waveform exactly


def test_speaker_profiles_differ_spectrally():
    """Same phone content, different speaker -> measurably different spectrum
    (this is what the speaker-ID CNN and the decoder train on)."""
    rng = np.random.default_rng(3)
    wav_f, _ = synth_utterance(rng, TARGET_PROFILE, n_phones=10)
    wav_m, _ = synth_utterance(np.random.default_rng(3), SOURCE_PROFILE, n_phones=10)
    # pitch: autocorrelation peak should sit at clearly different lags
    def f0_est(w):
        seg = w[8000:8000 + 4096]
        ac = np.correlate(seg, seg, "full")[4096:]
        lo, hi = int(16000 / 300), int(16000 / 70)
        return 16000 / (lo + np.argmax(ac[lo:hi]))
    assert f0_est(wav_f) > 1.4 * f0_est(wav_m)


@pytest.fixture(scope="module")
def synth_roots(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    timit_root = os.path.join(root, "timit")
    arctic_root = os.path.join(root, "arctic")
    make_timit_tree(timit_root, n_train_spk=2, n_test_spk=1, n_utts=2,
                    n_phones=8, seed=0)
    make_arctic_tree(arctic_root, n_utts=3, n_phones=8, seed=1)
    return timit_root, arctic_root


def test_synth_timit_tree_readable(synth_roots):
    from speech_cloner_tpu.data.timit import TIMIT

    ds = TIMIT(synth_roots[0], _feat_cfg(), n_timesteps=40, seed=0)
    # 2 train + 1 test + FSLT0 + MBDL0, 2 utts each
    assert len(ds.ds["wav"]) == 10
    assert "SLT0" in ds.ds["spk_id"] and "BDL0" in ds.ds["spk_id"]
    assert set(ds.ds["ds_type"]) == {"TRAIN", "TEST"}
    # all phone labels are valid TIMIT-61 phones
    for phn_v in ds.ds["phn_v"]:
        for _, _, p in phn_v:
            assert p in ds.phn2idx, p
    ds.build_spec_cache()
    rec = ds.get_spec(0)
    assert rec["mfcc"].shape[0] == rec["phn"].shape[0]
    assert rec["phn"].sum(axis=1).min() > 0  # every frame labeled


def test_synth_arctic_tree_readable(synth_roots):
    from speech_cloner_tpu.data.arctic import ARCTIC

    ds = ARCTIC(synth_roots[1], _feat_cfg(), n_timesteps=40, seed=0)
    assert sorted(set(ds.ds["spk_id"])) == ["bdl", "slt"]
    for phn_v in ds.ds["phn_v"]:
        for _, _, p in phn_v:
            assert p in ds.phn2idx, p
    ds.build_spec_cache()


def test_verify_conversion_report(tmp_path):
    """Speaker-ID verification loop: a tiny CNN trained to separate the two
    demo profiles must report identity change for a real cross-profile pair."""
    import jax

    from speech_cloner_tpu.models import speaker_id as spk_m
    from speech_cloner_tpu.pipeline.verify import (
        format_report,
        power_windows,
        verify_conversion,
    )
    from speech_cloner_tpu.runtime.checkpoint import Checkpointer
    from speech_cloner_tpu.train import OptimizerConfig, make_train_state, speaker_train_step

    feat_cfg = _feat_cfg()
    T = 40
    cfg = spk_m.SpeakerIdConfig(n_timesteps=T, n_features=feat_cfg.n_stft, n_output=2)

    # training windows from both profiles
    def windows(profile, seed):
        wav, _ = synth_utterance(np.random.default_rng(seed), profile, n_phones=10)
        return power_windows(wav, feat_cfg, T)

    xs, ys = [], []
    for seed in range(3):
        for cls, prof in enumerate((SOURCE_PROFILE, TARGET_PROFILE)):
            w = windows(prof, seed)
            xs.append(w)
            ys.append(np.tile(np.eye(2, dtype=np.float32)[cls], (w.shape[0], 1)))
    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys)

    params, state = spk_m.init(jax.random.PRNGKey(0), cfg)
    opt_cfg = OptimizerConfig(learning_rate=3e-4)
    opt = opt_cfg.make()
    ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(1))
    step = jax.jit(lambda t, xx, yy: speaker_train_step(t, xx, yy, cfg=cfg,
                                                        opt_cfg=opt_cfg, opt=opt))
    for _ in range(30):
        ts, m = step(ts, x, y)
    assert float(m["acc"]) > 0.9, float(m["acc"])

    model_path = str(tmp_path / "spk")
    ck = Checkpointer(model_path, "speaker_id")
    ck.save(ts, step=30, sync=True,
            config={"n_timesteps": T, "n_features": cfg.n_features,
                    "n_output": 2, "spk_id_v": ["BDL0", "SLT0"]})

    wav_src, _ = synth_utterance(np.random.default_rng(99), SOURCE_PROFILE, n_phones=10)
    wav_tgt, _ = synth_utterance(np.random.default_rng(98), TARGET_PROFILE, n_phones=10)
    report = verify_conversion(wav_src, wav_tgt, model_path, feat_cfg,
                               target_spk_id="SLT0")
    assert report["identity_changed"]
    assert report["target_hit"]
    assert report["target_p_pred"] > report["target_p_true"]
    assert "SLT0" in format_report(report)

    # multi-utterance + reconstruction-control verdict: lists of waveforms,
    # posterior averaged over all windows, control similarity reported
    wav_tgt2, _ = synth_utterance(np.random.default_rng(97), TARGET_PROFILE,
                                  n_phones=10)
    report2 = verify_conversion([wav_src], [wav_tgt], model_path, feat_cfg,
                                target_spk_id="SLT0", wav_control=[wav_tgt2])
    assert report2["n_windows_pred"] >= 1
    assert report2["control_match"]
    assert report2["cos_pred_control"] > report2["cos_pred_true"]
    assert "control" in format_report(report2)


def test_restore_into_structural_mismatch(tmp_path):
    """restore_into matches by path, not position: same leaf count but a
    renamed key must raise with the offending path."""
    from speech_cloner_tpu.runtime.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path), "m")
    ck.save({"a": np.zeros(3), "b": {"c": np.ones(2)}}, step=1, sync=True)

    # exact template restores
    tpl = {"a": np.zeros(3, np.float32), "b": {"c": np.zeros(2, np.float32)}}
    tree, step = ck.restore_into(tpl)
    assert step == 1 and tree["b"]["c"].dtype == np.float32

    # renamed key (same leaf count) -> loud failure naming the path
    bad = {"a": np.zeros(3), "b": {"WRONG": np.zeros(2)}}
    with pytest.raises(ValueError, match="WRONG|missing"):
        ck.restore_into(bad)

    # shape mismatch -> loud failure
    bad2 = {"a": np.zeros(4), "b": {"c": np.zeros(2)}}
    with pytest.raises(ValueError, match="shape"):
        ck.restore_into(bad2)
