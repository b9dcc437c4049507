"""Data-layer tests against synthetic on-disk fixtures that mimic the TIMIT /
ARCTIC / target-corpus directory layouts (the real corpora aren't shipped;
the readers' contracts are directory structure + file formats)."""

import os
import wave

import numpy as np
import pytest

from speech_cloner_tpu.data import audio_io
from speech_cloner_tpu.data.arctic import ARCTIC
from speech_cloner_tpu.data.dataset import feature_cache_key
from speech_cloner_tpu.data.timit import TIMIT, PHONEMES_61, conv_matrix_61_to_39
from speech_cloner_tpu.ops.features import FeatureConfig

SR = 16000
RNG = np.random.default_rng(0)


def _write_wav(path, y, sr=SR):
    audio_io.write_riff_wav(path, y, sr, norm=False)


def _tone(n, f=300.0):
    return (0.4 * np.sin(2 * np.pi * f * np.arange(n) / SR)).astype(np.float32)


def _feat_cfg():
    # small hop to keep fixtures tiny
    return FeatureConfig(hop_length=80, win_length=400, n_mels=20, n_mfcc=10)


# -------------------------------------------------------------- audio io ---

def test_riff_roundtrip(tmp_path):
    y = _tone(4000)
    p = str(tmp_path / "a.wav")
    _write_wav(p, y)
    y2 = audio_io.load_audio(p, SR)
    np.testing.assert_allclose(y2, y, atol=2e-4)


def test_nist_sphere_read(tmp_path):
    y = _tone(2000)
    pcm = (y * 32767).astype("<i2").tobytes()
    header = (
        "NIST_1A\n   1024\n"
        "sample_rate -i 16000\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    ).encode("ascii")
    p = str(tmp_path / "s.WAV")
    with open(p, "wb") as f:
        f.write(header + b" " * (1024 - len(header)) + pcm)
    y2 = audio_io.load_audio(p, SR)
    np.testing.assert_allclose(y2, y, atol=2e-4)


def test_resample(tmp_path):
    y = _tone(8000)
    p = str(tmp_path / "a8k.wav")
    _write_wav(p, y, sr=8000)
    y2 = audio_io.load_audio(p, SR)
    assert abs(len(y2) - 16000) <= 2


# ------------------------------------------------------- fixture datasets ---

def _make_timit_tree(root):
    """2 dialects x 2 speakers x 2 utterances with PHN/TXT/WRD files."""
    utts = 0
    for ds_type in ("TRAIN", "TEST"):
        for dr in ("DR1", "DR2"):
            for spk in ("MABC0", "FDEF0"):
                d = os.path.join(root, ds_type, dr, spk)
                os.makedirs(d, exist_ok=True)
                for utt in ("SA1", "SX9"):
                    n = int(SR * (0.5 + 0.25 * (utts % 3)))
                    y = _tone(n, 200 + 60 * utts)
                    _write_wav(os.path.join(d, utt + ".WAV"), y)
                    half = n // 2
                    with open(os.path.join(d, utt + ".PHN"), "w") as f:
                        f.write(f"0 {half} sh\n{half} {n} iy\n")
                    with open(os.path.join(d, utt + ".TXT"), "w") as f:
                        f.write(f"0 {n} she is\n")
                    with open(os.path.join(d, utt + ".WRD"), "w") as f:
                        f.write(f"0 {half} she\n{half} {n} is\n")
                    utts += 1
    return utts


def _make_arctic_tree(root):
    for spk in ("slt", "bdl"):
        d = os.path.join(root, f"cmu_us_{spk}_arctic")
        os.makedirs(os.path.join(d, "wav"), exist_ok=True)
        os.makedirs(os.path.join(d, "lab"), exist_ok=True)
        for i in range(3):
            n = int(SR * (0.45 + 0.2 * i))
            y = _tone(n, 250 + 50 * i)
            _write_wav(os.path.join(d, "wav", f"arctic_a{i:04d}.wav"), y)
            t_mid = n / 2 / SR
            t_end = n / SR
            with open(os.path.join(d, "lab", f"arctic_a{i:04d}.lab"), "w") as f:
                f.write("#\n")
                f.write(f"{t_mid:.4f} 125 pau\n{t_end:.4f} 125 ae\n")


@pytest.fixture(scope="module")
def timit(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("timit"))
    _make_timit_tree(root)
    ds = TIMIT(root, _feat_cfg(), n_timesteps=40, seed=0)
    ds.build_spec_cache()
    return ds


@pytest.fixture(scope="module")
def arctic(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("arctic"))
    _make_arctic_tree(root)
    ds = ARCTIC(root, _feat_cfg(), n_timesteps=40, seed=0)
    ds.build_spec_cache()
    return ds


# ------------------------------------------------------------------ TIMIT ---

def test_timit_ingest(timit):
    assert len(timit.ds["wav"]) == 16
    assert set(timit.ds["ds_type"]) == {"TRAIN", "TEST"}
    assert timit.n_phn == 61
    # ds_norm (0, 10) scales waves by 10 like the reference encoder config
    assert np.abs(timit.ds["wav"][0]).max() > 1.0


def test_timit_filter_and_split(timit):
    f_trn = timit.get_ds_filter({"ds_type": "TRAIN"})
    assert f_trn.sum() == 8
    f_spk = timit.get_ds_filter({"spk_id": "ABC0"})
    assert f_spk.sum() == 8  # both dialects/types
    f_and = timit.get_ds_filter({"ds_type": "TRAIN", "spk_id": ["ABC0"]})
    assert f_and.sum() == 4
    # deterministic split: trn/val/tst partition the filtered set
    parts = []
    for st in ("trn", "val", "tst"):
        fd = {"split_d": {"split_key": "spk_id", "split_type": st,
                          "split_props_v": (0.5, 0.75)}}
        parts.append(timit.get_ds_filter(fd))
    total = parts[0] | parts[1] | parts[2]
    assert total.all()
    assert not (parts[0] & parts[1]).any()
    # same call twice -> identical masks
    fd = {"split_d": {"split_key": "spk_id", "split_type": "trn",
                      "split_props_v": (0.5, 0.75)}}
    np.testing.assert_array_equal(timit.get_ds_filter(fd), timit.get_ds_filter(fd))


def test_timit_window_sampler(timit):
    batches = list(timit.window_sampler(batch_size=4, n_epochs=2,
                                        ds_filter_d={"ds_type": "TRAIN"}))
    assert len(batches) >= 2
    mfcc, phn = batches[0]
    assert mfcc.shape == (4, 40, timit.feat_cfg.input_dim)
    assert phn.shape == (4, 40, 61)
    np.testing.assert_allclose(phn.sum(-1), 1.0)


def test_timit_spec_window_sampler_and_splits(timit):
    got_trn = next(iter(timit.spec_window_sampler(batch_size=4, prop_val=0.25,
                                                  sample_trn=True)))
    assert got_trn[0].shape[0] == 4 and got_trn[2].shape[2] == timit.feat_cfg.n_stft
    got_val = next(iter(timit.spec_window_sampler(batch_size=4, prop_val=0.25,
                                                  sample_trn=False, n_epochs=3)))
    assert got_val[0].shape[0] == 4


def test_timit_speaker_sampler(timit):
    mfcc, mel, power, cls = next(iter(timit.speaker_spec_sampler(batch_size=4)))
    assert cls.shape[1] == len(timit.all_spk_id_v)
    np.testing.assert_allclose(cls.sum(-1), 1.0)


def test_timit_class_weights(timit):
    cw, n = timit.calc_class_weights(ds_filter_d={"ds_type": "TRAIN"})
    assert len(cw) == 61 and n > 0
    # unseen classes get weight 1.0; seen classes weighted by majority/count
    seen = [timit.phn2idx["sh"], timit.phn2idx["iy"]]
    assert all(0 <= cw[c] <= 10 for c in cw)
    assert all(cw[c] > 0 for c in seen)


def test_conv_61_to_39(timit):
    M = conv_matrix_61_to_39()
    assert M.shape == (61, 39)
    # every phoneme except q maps somewhere
    q = int(np.flatnonzero(PHONEMES_61 == "q")[0])
    assert M.sum(axis=1)[q] == 0
    assert (np.delete(M.sum(axis=1), q) == 1).all()
    # one-hot q frames get repaired from neighbors
    oh = np.zeros((3, 61), np.float32)
    oh[0, timit.phn2idx["sh"]] = 1
    oh[1, q] = 1
    oh[2, timit.phn2idx["iy"]] = 1
    out = timit.conv_61phn_to_39phn(oh)
    np.testing.assert_allclose(out.sum(-1), 1.0)
    np.testing.assert_array_equal(out[1], out[0])


def test_cache_key_changes_with_config():
    a = feature_cache_key(_feat_cfg())
    b = feature_cache_key(FeatureConfig(hop_length=80, win_length=400, n_mels=20,
                                        n_mfcc=10, pre_emphasis=0.5))
    assert a != b


# ----------------------------------------------------------------- ARCTIC ---

def test_arctic_ingest_and_sampler(arctic):
    assert len(arctic.ds["wav"]) == 6
    assert set(arctic.ds["spk_id"]) == {"slt", "bdl"}
    assert arctic.n_phn == 43
    mfcc, phn = next(iter(arctic.window_sampler(
        batch_size=2, n_epochs=4, prop_val=0.0, ds_filter_d={"spk_id": "slt"})))
    assert mfcc.shape == (2, 40, arctic.feat_cfg.input_dim)
    assert phn.shape == (2, 40, 43)
    np.testing.assert_allclose(phn.sum(-1), 1.0)


def test_arctic_spec_sampler_slt_filter(arctic):
    got = next(iter(arctic.spec_window_sampler(
        batch_size=2, prop_val=0.0, ds_filter_d={"spk_id": "slt"}, yield_idxs=True)))
    mfcc, mel, power, idxs = got
    assert set(arctic.ds["spk_id"][idxs[:, -1]]) == {"slt"}


# -------------------------------------------------------------- prefetch ---

def test_device_prefetch(timit):
    import jax

    from speech_cloner_tpu.data import device_prefetch

    it = timit.window_sampler(batch_size=2, n_epochs=1, ds_filter_d={"ds_type": "TRAIN"})
    out = list(device_prefetch(it, size=2))
    assert len(out) >= 1
    assert isinstance(out[0][0], jax.Array)


def test_packed_spec_window_sampler(timit):
    got = next(iter(timit.packed_spec_window_sampler(batch_size=4, prop_val=0.0)))
    mfcc, mel, power = got
    assert mfcc.shape == (4, 40, timit.feat_cfg.input_dim)
    assert power.shape[2] == timit.feat_cfg.n_stft
    # windows come from the same utterances/stats as the h5 cache
    assert np.isfinite(mfcc).all()


def test_host_shard_single_process():
    from speech_cloner_tpu.parallel.distributed import host_shard, per_host_batch

    s = np.arange(10)
    np.testing.assert_array_equal(host_shard(s), s)  # 1 process -> identity
    assert per_host_batch(32) == 32


def test_target_speaker_reader(tmp_path):
    """TARGET_spk reader (C8, TARGET_spk_reader.py): extension filter,
    exclude list, spec cache without phones, sequential head/tail split and
    the one-file-per-batch window sampler."""
    import numpy as np

    from speech_cloner_tpu.data.audio_io import write_riff_wav
    from speech_cloner_tpu.data.target_spk import TargetSpeaker

    cfg = _feat_cfg()
    sr = cfg.sample_rate
    root = str(tmp_path / "book")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    T = 20
    # 4 usable clips (> T frames), one excluded by substring, one wrong ext
    for i in range(4):
        dur = (T + 40 + 10 * i) * cfg.hop_length
        write_riff_wav(os.path.join(root, f"chap{i}.wav"),
                       rng.standard_normal(dur).astype(np.float32), sr)
    write_riff_wav(os.path.join(root, "intro_SKIP.wav"),
                   rng.standard_normal(sr).astype(np.float32), sr)
    with open(os.path.join(root, "notes.txt"), "w") as f:
        f.write("not audio")

    ds = TargetSpeaker(root, cfg, n_timesteps=T, exclude_files_with=("SKIP",))
    assert len(ds.ds["wav"]) == 4
    assert all("SKIP" not in n for n in ds.ds["name"])
    ds.build_spec_cache()

    # sequential (non-seeded) split: train = head files, val = tail files
    got_trn = list(ds.spec_window_sampler(batch_size=3, n_epochs=1,
                                          sample_trn=True, prop_val=0.3,
                                          yield_idxs=True))
    got_val = list(ds.spec_window_sampler(batch_size=3, n_epochs=1,
                                          sample_trn=False, prop_val=0.3,
                                          yield_idxs=True))
    assert got_trn and got_val
    trn_files = {int(idx[2]) for b in got_trn for idx in b[3]}
    val_files = {int(idx[2]) for b in got_val for idx in b[3]}
    assert trn_files.isdisjoint(val_files)
    assert max(trn_files) < min(val_files)  # head/tail, not interleaved
    for mfcc, mel, power, idxs in got_trn:
        assert mfcc.shape == (3, T, cfg.input_dim)
        assert mel.shape == (3, T, cfg.n_mels)
        assert power.shape == (3, T, cfg.n_stft)
        # one file per batch (TARGET_spk_reader.py:206-246)
        assert len({int(i[2]) for i in idxs}) == 1


def test_mpg123_decode_demo_mp3():
    """In-process mp3 decode via the system libmpg123 (data/audio_io.py):
    the reference's librosa->audioread->ffmpeg decode path
    (TARGET_spk_reader.py:108) without any subprocess. Pinned on the shipped
    demo clip: 16 kHz mono, ~60 s, speech-like energy."""
    import os

    import pytest

    mp3 = ("/root/reference/slt_test_chptr16/"
           "16 The Magic Art of the Great Humbug_true.mp3")
    if not os.path.exists(mp3):
        pytest.skip("reference demo mp3 absent")
    if audio_io._load_mpg123() is None:
        pytest.skip("libmpg123 absent")

    y, sr = audio_io.read_via_mpg123(mp3)
    assert sr == 16000 and y.dtype == np.float32 and y.ndim == 1
    assert 55.0 < len(y) / sr < 65.0
    rms = float(np.sqrt(np.mean(y ** 2)))
    assert 0.01 < rms < 0.5 and float(np.abs(y).max()) <= 1.0

    # load_audio routes .mp3 through mpg123 and resamples on request
    y8 = audio_io.load_audio(mp3, 8000)
    assert abs(len(y8) / 8000 - len(y) / sr) < 0.01
