"""Device-resident dataset tests: on-device window gather parity + sampler."""

import numpy as np

from speech_cloner_tpu.data.device_dataset import DeviceWindows, gather_windows

RNG = np.random.default_rng(0)


def _make(T=16):
    lens = [40, 23, T - 4, 31]  # includes one shorter than T
    s0 = [RNG.standard_normal((l, 5)).astype(np.float32) for l in lens]
    s1 = [RNG.standard_normal((l, 3)).astype(np.float32) for l in lens]
    return DeviceWindows([s0, s1], T), s0, s1


def test_gather_matches_numpy_slices():
    dw, s0, s1 = _make()
    utts = np.asarray([0, 1, 3], np.int32)
    starts = np.asarray([5, 2, 0], np.int32)
    w0, w1 = dw.gather(utts, starts)
    assert w0.shape == (3, 16, 5) and w1.shape == (3, 16, 3)
    for b, (i, s) in enumerate(zip(utts, starts)):
        exp = s0[i][s : s + 16]
        np.testing.assert_array_equal(np.asarray(w0)[b, : exp.shape[0]], exp)
        np.testing.assert_array_equal(np.asarray(w1)[b, : s1[i][s:s + 16].shape[0]],
                                      s1[i][s : s + 16])


def test_gather_zero_pads_past_end():
    """Short utterance (len < T): tail frames are zeros, matching _pad_rows /
    the native scl_gather_batch semantics."""
    dw, s0, _ = _make(T=16)
    w0, _ = dw.gather(np.asarray([2], np.int32), np.asarray([0], np.int32))
    np.testing.assert_array_equal(np.asarray(w0)[0, :12], s0[2])
    assert np.all(np.asarray(w0)[0, 12:] == 0.0)


def test_index_sampler_matches_streaming_semantics():
    """One crop per utterance per epoch, starts within [0, len-T), same-rng
    determinism."""
    dw, s0, _ = _make()
    samples = np.asarray([0, 1, 3])
    batches = list(dw.index_sampler(samples, batch_size=3, n_epochs=4,
                                    rng=np.random.default_rng(7)))
    assert len(batches) == 4
    for u, st in batches:
        assert sorted(u.tolist()) == [0, 1, 3]
        for i, s in zip(u, st):
            assert 0 <= s < max(dw.n_frames[i] - dw.T, 1)
    again = list(dw.index_sampler(samples, batch_size=3, n_epochs=4,
                                  rng=np.random.default_rng(7)))
    for (u1, s1_), (u2, s2) in zip(batches, again):
        np.testing.assert_array_equal(u1, u2)
        np.testing.assert_array_equal(s1_, s2)


def test_gather_windows_as_jit_args():
    """gather_windows composes under jit with streams as explicit args."""
    import jax

    dw, s0, _ = _make()
    fn = jax.jit(lambda u, s, *streams: gather_windows(streams, u, s, dw.T))
    w0, w1 = fn(np.asarray([1, 0], np.int32), np.asarray([0, 3], np.int32),
                *dw.streams)
    np.testing.assert_array_equal(np.asarray(w0)[1], s0[0][3:19])
