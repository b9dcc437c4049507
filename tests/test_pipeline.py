"""Pipeline tests: stitching parity with the reference compound(), and the
end-to-end clone smoke on a synthetic 2.5-second wav."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_cloner_tpu.models import decoder as dec_m
from speech_cloner_tpu.models import encoder as enc_m
from speech_cloner_tpu.ops.features import FeatureConfig
from speech_cloner_tpu.pipeline import clone, stitch


def _ref_compound(y0, y1):
    """Verbatim re-expression of test.py:46-84 in numpy for parity checking."""
    n_quarter = y0.shape[1] // 4
    i_0, i_1 = 1, 0
    y_v = [y0[0, :-n_quarter, :]]
    while True:
        do_break = True
        if i_1 < y1.shape[0]:
            y_v.append(y1[i_1, n_quarter:-n_quarter, :])
            i_1 += 1
            do_break = False
        if i_0 < y0.shape[0] - 1:
            y_v.append(y0[i_0, n_quarter:-n_quarter, :])
            i_0 += 1
            do_break = False
        if do_break:
            break
    y_v.append(y0[-1, n_quarter:, :])
    return np.concatenate(y_v, axis=0)


def test_compound_matches_reference():
    rng = np.random.default_rng(0)
    for K, T in ((2, 8), (3, 8), (5, 10), (8, 8)):
        y0 = rng.standard_normal((K, T, 3)).astype(np.float32)
        y1 = rng.standard_normal((K - 1, T, 3)).astype(np.float32)
        ref = _ref_compound(y0, y1)
        mine = np.asarray(stitch.compound(jnp.asarray(y0), jnp.asarray(y1)))
        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, atol=0)


def test_window_stacks():
    x = np.arange(40, dtype=np.float32).reshape(20, 2)
    w = stitch.window_stack(jnp.asarray(x), 5)
    assert w.shape == (4, 5, 2)
    s = stitch.shifted_window_stack(jnp.asarray(x), 5)
    assert s.shape == (3, 5, 2)
    np.testing.assert_array_equal(np.asarray(s[0, 0]), x[2])  # offset T/2 rows


def _tiny_pipeline(n_iter=4):
    enc_cfg = enc_m.EncoderConfig(n_timesteps=48, input_dim=80, n_output=61,
                                  num_conv_banks=2, num_highwaynet_blocks=1)
    dec_cfg = dec_m.DecoderConfig(
        n_timesteps=48, input_dim=61,
        step1=dec_m.DecoderStepConfig(32, 2, 1, 80),
        step2=dec_m.DecoderStepConfig(48, 2, 1, 201),
    )
    feat_cfg = FeatureConfig(calc_mfcc_derivate=True)
    return clone.make_pipeline(enc_cfg, dec_cfg, feat_cfg, n_iter=n_iter)


def test_end_to_end_clone_smoke():
    """wav in -> wav out with finite values and the right length scaling."""
    sr = 16000
    t = np.arange(2 * sr + 1234) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)

    p = _tiny_pipeline()
    wav_pred, mel_pred, stft_pred, ppg = p.convert(wav)

    T = p.enc_cfg.n_timesteps
    hop = p.feat_cfg.hop_length
    assert mel_pred.shape[1] == 80 and stft_pred.shape[1] == 201
    assert mel_pred.shape[0] % T == 0
    assert np.isfinite(wav_pred).all()
    # PPG rows are probability distributions
    np.testing.assert_allclose(ppg.sum(-1), 1.0, atol=1e-4)
    # output wav duration ~ stitched frames * hop
    assert abs(wav_pred.shape[0] - mel_pred.shape[0] * hop) <= p.feat_cfg.win_length


def test_single_window_path():
    sr = 16000
    wav = np.sin(2 * np.pi * 330 * np.arange(sr // 8) / sr).astype(np.float32)
    p = _tiny_pipeline()
    wav_pred, mel_pred, _, _ = p.convert(wav)
    assert mel_pred.shape[0] == p.enc_cfg.n_timesteps
    assert np.isfinite(wav_pred).all()


def test_convert_batch():
    """Batched serving path: per-clip outputs match the single-clip path."""
    sr = 16000
    t = np.arange(sr) / sr
    wav_a = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    wav_b = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = _tiny_pipeline()

    wavs_pred, mels, stfts = p.convert_batch([wav_a, wav_b])
    assert wavs_pred.shape[0] == 2 and mels.shape[0] == 2
    assert np.isfinite(wavs_pred).all()

    # batched result equals the single-clip path for the same input
    wav_single, mel_single, stft_single, _ = p.convert(wav_a)
    np.testing.assert_allclose(mels[0], mel_single, atol=1e-4)
    np.testing.assert_allclose(stfts[0], stft_single, atol=1e-4)


def test_device_vocode_pcm16():
    """int16 PCM export: peak-normalized, matches the f32 path's waveform."""
    import jax

    p = _tiny_pipeline()
    rng = np.random.default_rng(0)
    stft_pred = jnp.asarray(rng.random((96, 201)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    wav_f32 = np.asarray(p.device_vocode(stft_pred, key))
    pcm = np.asarray(p.device_vocode_pcm16(stft_pred, key))
    assert pcm.dtype == np.int16
    ref = np.clip(wav_f32 / np.abs(wav_f32).max() * 32767, -32768, 32767).astype(np.int16)
    assert np.mean(np.abs(pcm.astype(np.int32) - ref.astype(np.int32))) < 2


def test_convert_seq_parallel():
    """SP conversion on the 8-virtual-device mesh ~= the stitched path's
    spectrogram (exact convs, warmup GRU seams, no window boundaries)."""
    import jax

    assert jax.device_count() >= 4
    sr = 16000
    t = np.arange(2 * sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 250 * t)).astype(np.float32)
    p = _tiny_pipeline()

    wav_sp, mel_sp, stft_sp = p.convert_seq_parallel(wav, n_devices=4, warmup=48)
    assert np.isfinite(wav_sp).all()
    import jax.numpy as jnp

    from speech_cloner_tpu.ops import mfcc_input

    mfcc, _, _ = mfcc_input(jnp.asarray(wav), p.feat_cfg, xp=jnp)
    frames = mfcc.shape[0]
    # no tail truncation: 2 s at hop 80 gives 401 frames (NOT divisible by
    # n=4) and SP must still cover every real frame — the old floor-to-n
    # dropped up to n-1 trailing frames silently
    assert frames % 4 != 0, "fixture must exercise the non-divisible tail"
    assert mel_sp.shape[0] == frames and stft_sp.shape[0] == frames
    assert wav_sp.shape[0] == frames * p.feat_cfg.hop_length
    # compare against an unsharded full-sequence forward on the same frames
    pad_f = (-frames) % 4
    mel_ref, stft_ref, _ = p.forward_windows(
        jnp.pad(mfcc, ((0, pad_f), (0, 0)))[None])
    err = np.median(np.abs(mel_sp - np.asarray(mel_ref[0, :frames])))
    assert err < 1e-3, err


def test_bf16_compute_mode_close_to_f32():
    """Opt-in bf16 inference stays close to the f32 path (outputs in [-1,1]
    normalized spectrogram space)."""
    import dataclasses

    p32 = _tiny_pipeline()
    p16 = dataclasses.replace(p32, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mfcc = jnp.asarray(rng.standard_normal((2, 48, 80)).astype(np.float32) * 0.2)
    mel32, stft32, ppg32 = p32.forward_windows(mfcc)
    mel16, stft16, ppg16 = p16.forward_windows(mfcc)
    assert mel16.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(mel16 - mel32))) < 0.08
    assert float(jnp.max(jnp.abs(ppg16 - ppg32))) < 0.08


def test_convert_pcm16_matches_convert():
    """The serving fast path returns exactly the int16 PCM that
    write_riff_wav(norm=True) would produce from convert()'s float wav."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_cloner_tpu.models import decoder as dec_m
    from speech_cloner_tpu.models import encoder as enc_m
    from speech_cloner_tpu.ops import FeatureConfig
    from speech_cloner_tpu.pipeline.clone import ClonePipeline

    feat_cfg = FeatureConfig(calc_mfcc_derivate=True)
    enc_cfg = enc_m.EncoderConfig(n_timesteps=40, input_dim=80, n_output=61,
                                  num_conv_banks=2, num_highwaynet_blocks=1)
    dec_cfg = dec_m.DecoderConfig(
        n_timesteps=40, input_dim=61,
        step1=dec_m.DecoderStepConfig(16, 2, 1, 20),
        step2=dec_m.DecoderStepConfig(24, 2, 1, 201))
    ep, es = enc_m.init(jax.random.PRNGKey(0), enc_cfg)
    dp, ds = dec_m.init(jax.random.PRNGKey(1), dec_cfg)
    pipe = ClonePipeline(enc_cfg=enc_cfg, dec_cfg=dec_cfg, feat_cfg=feat_cfg,
                         enc_params=ep, enc_state=es, dec_params=dp,
                         dec_state=ds, n_iter=4)

    rng = np.random.default_rng(7)
    wav = rng.standard_normal(40 * feat_cfg.hop_length).astype(np.float32)

    wav_f, _, _, _ = pipe.convert(wav, seed=3)
    pcm = pipe.convert_pcm16(wav, seed=3)
    assert pcm.dtype == np.int16 and pcm.shape == wav_f.shape
    peak = max(np.abs(wav_f).max(), 1e-9)
    expect = np.clip(wav_f / peak * 32767.0, -32768, 32767).astype(np.int16)
    # identical device math; allow 1 LSB for the separate round/clip path
    assert np.abs(pcm.astype(np.int32) - expect.astype(np.int32)).max() <= 1


def test_jit_cache_is_per_instance_and_bounded():
    """Compiled-fn caching is tied to the pipeline instance (a new pipeline —
    e.g. rebuilt with new weights — can never alias a stale compiled fn, the
    round-2 id()-reuse hazard) and is LRU-bounded so a long-lived server
    seeing many length buckets cannot grow without bound."""
    import dataclasses

    p = _tiny_pipeline()
    sr = 16000
    wav = np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr).astype(np.float32)
    p.convert(wav)
    assert ("stages", len(_padded(p, wav))) in p._jit_cache or len(p._jit_cache) == 1

    # same length bucket -> cache hit (no new entry)
    n = len(p._jit_cache)
    p.convert(wav)
    assert len(p._jit_cache) == n

    # a replaced pipeline (fresh instance) starts with an empty cache
    p2 = dataclasses.replace(p, n_iter=3)
    assert len(p2._jit_cache) == 0

    # the cache is LRU-bounded
    assert p._jit_cache_max == 32
    for i in range(p._jit_cache_max + 4):
        p._jitted("probe", i, lambda: object())
    assert len(p._jit_cache) <= p._jit_cache_max


def _padded(p, wav):
    spw = p.enc_cfg.n_timesteps * p.feat_cfg.hop_length
    pad = (-len(wav)) % spw
    if len(wav) + pad < spw:
        pad = spw - len(wav)
    return np.pad(wav, (0, pad))
