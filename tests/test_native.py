"""Native loader tests: .sclpack round-trip, native-vs-python gather parity,
threaded batch assembly, PCM decode parity with the Python readers."""

import numpy as np
import pytest

from speech_cloner_tpu.data import audio_io
from speech_cloner_tpu.data.packed_cache import (
    PackedReader,
    ensure_native,
    native_decode_pcm,
    packed_window_sampler,
    write_pack,
)

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def pack_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pack") / "feat.sclpack")
    utts = []
    for i in range(7):
        T = 30 + 17 * i
        utts.append({
            "mfcc": RNG.standard_normal((T, 10)).astype(np.float32),
            "mel": RNG.standard_normal((T, 20)).astype(np.float32),
        })
    write_pack(path, utts, ["mfcc", "mel"])
    return path, utts


def test_python_reader_roundtrip(pack_path):
    path, utts = pack_path
    r = PackedReader(path, use_native=False)
    assert not r.native
    assert r.n_utts == 7 and r.dims == [10, 20]
    got = r.gather(np.asarray([2]), np.asarray([5]), 8, 0)
    np.testing.assert_array_equal(got[0], utts[2]["mfcc"][5:13])
    # zero pad past end
    T2 = utts[1]["mel"].shape[0]
    got = r.gather(np.asarray([1]), np.asarray([T2 - 3]), 8, 1)
    np.testing.assert_array_equal(got[0, :3], utts[1]["mel"][-3:])
    np.testing.assert_array_equal(got[0, 3:], 0.0)


def test_native_matches_python(pack_path):
    if ensure_native() is None:
        pytest.skip("native lib unavailable")
    path, utts = pack_path
    rn = PackedReader(path, use_native=True, n_threads=4)
    rp = PackedReader(path, use_native=False)
    assert rn.native
    utts_idx = np.asarray(RNG.integers(0, 7, 64), np.int32)
    starts = np.asarray(RNG.integers(0, 40, 64), np.int32)
    for stream in (0, 1):
        a = rn.gather(utts_idx, starts, 16, stream)
        b = rp.gather(utts_idx, starts, 16, stream)
        np.testing.assert_array_equal(a, b)
    rn.close()


def test_packed_window_sampler(pack_path):
    path, _ = pack_path
    r = PackedReader(path)
    batches = list(packed_window_sampler(r, batch_size=3, n_timesteps=16,
                                         streams=(0, 1), n_epochs=2))
    assert len(batches) == 4  # 7 utts -> 2 batches of 3 per epoch
    mfcc, mel = batches[0]
    assert mfcc.shape == (3, 16, 10) and mel.shape == (3, 16, 20)


def test_native_pcm_decode_riff(tmp_path):
    if ensure_native() is None:
        pytest.skip("native lib unavailable")
    y = (0.3 * np.sin(2 * np.pi * 440 * np.arange(5000) / 16000)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio_io.write_riff_wav(p, y, 16000, norm=False)
    out = native_decode_pcm(p)
    assert out is not None
    wav, sr = out
    assert sr == 16000
    ref = audio_io.load_audio(p, 16000)
    np.testing.assert_allclose(wav, ref, atol=1e-6)


def test_native_pcm_decode_sphere(tmp_path):
    if ensure_native() is None:
        pytest.skip("native lib unavailable")
    y = (0.2 * np.sin(2 * np.pi * 300 * np.arange(3000) / 16000)).astype(np.float32)
    pcm = (y * 32767).astype("<i2").tobytes()
    header = ("NIST_1A\n   1024\nsample_rate -i 16000\nchannel_count -i 1\n"
              "sample_n_bytes -i 2\nsample_byte_format -s2 01\n"
              "sample_coding -s3 pcm\nend_head\n").encode()
    p = str(tmp_path / "t.WAV")
    with open(p, "wb") as f:
        f.write(header + b" " * (1024 - len(header)) + pcm)
    out = native_decode_pcm(p)
    assert out is not None
    wav, sr = out
    ref = audio_io.load_audio(p, 16000)
    np.testing.assert_allclose(wav, ref, atol=1e-6)


def test_pack_from_h5(tmp_path):
    import h5py

    from speech_cloner_tpu.data.packed_cache import pack_from_h5

    h5p = str(tmp_path / "cache.h5py")
    with h5py.File(h5p, "w") as h5:
        g1, g2 = h5.create_group("mfcc"), h5.create_group("mel_dB")
        for i in range(3):
            T = 20 + i
            g1.create_dataset(str(i), data=RNG.standard_normal((T, 5)).astype(np.float32))
            g2.create_dataset(str(i), data=RNG.standard_normal((T, 7)).astype(np.float32))
    out = pack_from_h5(h5p, str(tmp_path / "o.sclpack"), streams=("mfcc", "mel_dB"))
    r = PackedReader(out, use_native=False)
    assert r.n_utts == 3 and r.dims == [5, 7]


def test_load_audio_native_path_matches_python(tmp_path):
    """load_audio's native fast path must be byte-equivalent to the Python
    readers for both RIFF and SPHERE."""
    y = (0.25 * np.sin(2 * np.pi * 500 * np.arange(4000) / 16000)).astype(np.float32)
    p = str(tmp_path / "n.wav")
    audio_io.write_riff_wav(p, y, 16000, norm=False)
    a = audio_io.load_audio(p, 16000, use_native=True)
    b = audio_io.load_audio(p, 16000, use_native=False)
    np.testing.assert_array_equal(a, b)
