"""Multi-session streaming server tests: slot lifecycle (open/feed/close/
reuse), lockstep isolation (a slot reset must not perturb its neighbors by
a single bit), exact per-session output accounting, and protocol errors."""

import numpy as np
import pytest

from speech_cloner_tpu.apps.serve_stream import StreamServer
from speech_cloner_tpu.models import decoder as dec_m
from speech_cloner_tpu.models import encoder as enc_m
from speech_cloner_tpu.ops.features import FeatureConfig
from speech_cloner_tpu.pipeline import clone
from speech_cloner_tpu.pipeline.stream import StreamingCloner


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


def _speechy_wav(seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t)
    wav = env * (np.sin(2 * np.pi * 220 * t)
                 + 0.5 * np.sin(2 * np.pi * 660 * t + 1.0)
                 + 0.15 * rng.standard_normal(t.size))
    return wav.astype(np.float32)


KW = dict(chunk_frames=64, context_frames=64, lookahead_frames=48,
          margin_frames=8)


def test_reset_stream_isolates_neighbor_slots():
    """Resetting slot 1 mid-run (new occupant, new audio) must leave slot
    0's output byte-identical to the run where slot 1 was never touched —
    the property that makes serving slot churn safe."""
    p = _tiny_pipeline()
    block = 64 * p.feat_cfg.hop_length
    wav0 = _speechy_wav(2.0, seed=21)
    wav1 = _speechy_wav(2.0, seed=22)
    wav2 = 0.4 * _speechy_wav(2.0, seed=23)
    n_ticks = wav0.size // block

    def run(churn: bool):
        s = StreamingCloner(p, batch=2, seed=7, **KW)
        outs, gains = [], []
        for i in range(n_ticks):
            row1_src = wav2 if (churn and i >= n_ticks // 2) else wav1
            if churn and i == n_ticks // 2:
                s.reset_stream(1)
            x = np.stack([wav0[i * block:(i + 1) * block],
                          row1_src[i * block:(i + 1) * block]])
            out = s.push(x)
            if out.shape[1]:
                outs.append(out)
                gains.append(s._gain.copy())
        return np.concatenate(outs, axis=1), gains

    base, _ = run(False)
    churned, gains = run(True)
    np.testing.assert_array_equal(base[0], churned[0])
    # and the reset slot really did re-freeze its stats for the new stream
    # (wav2 is 2.5x quieter, so its frozen gain must come out larger)
    assert gains[-1][1] > 2.0 * gains[0][1]
    assert np.isfinite(churned).all()


def test_stream_server_session_lifecycle():
    """open -> feed -> lockstep output -> close -> slot reuse, with exact
    output-length accounting and protocol errors."""
    p = _tiny_pipeline()
    srv = StreamServer(p, slots=2, **KW)
    sr = srv.sr
    block = srv.block

    assert srv.open("alice")["slot"] == 0
    assert "error" in srv.open("alice")          # double open
    assert srv.open("bob")["slot"] == 1
    assert "error" in srv.open("carol")          # no free slot
    assert "error" in srv.feed("nobody", np.zeros(10, np.float32))
    assert "error" in srv.close("nobody")

    wav_a = _speechy_wav(1.5, seed=31)
    wav_b = 0.5 * _speechy_wav(2.5, seed=32)
    srv.feed("alice", wav_a)
    srv.feed("bob", wav_b)

    records = []
    while srv.ready():                           # alice underflows first
        records.extend(srv.tick())
    assert srv.close("alice") is None
    while srv.ready():                           # drains alice dry
        records.extend(srv.tick())

    closed = [r for r in records if r.get("closed") == "alice"]
    assert len(closed) == 1
    # exact accounting: alice gets back precisely the samples she pushed
    assert closed[0]["seconds"] == pytest.approx(wav_a.size / sr)
    a_recs = [r for r in records if r.get("sid") == "alice"]
    n_out = sum(len(__import__("base64").b64decode(r["pcm16"])) // 2
                for r in a_recs)
    assert n_out == wav_a.size
    assert a_recs[0]["t_s"] == 0.0
    assert "error" in srv.feed("alice", wav_a)   # closed session is gone

    # slot 0 is free again; carol takes it while bob is still live
    assert srv.open("carol")["slot"] == 0
    srv.feed("carol", _speechy_wav(1.0, seed=33))
    tail = srv.drain()                           # EOF semantics
    assert {r["closed"] for r in tail if "closed" in r} == {"bob", "carol"}
    assert not srv.sessions and sorted(srv.free) == [0, 1]

    # every emitted chunk decodes to finite int16 PCM
    import base64 as b64mod
    for r in records + tail:
        if "pcm16" in r:
            pcm = np.frombuffer(b64mod.b64decode(r["pcm16"]), dtype="<i2")
            assert pcm.size % 1 == 0 and np.isfinite(pcm).all()

    # a session fed exactly k blocks then closed: k*block samples back
    assert srv.open("dave")["slot"] in (0, 1)
    srv.feed("dave", np.tile(_speechy_wav(0.5, seed=34), 2)[: 2 * block])
    srv.close("dave")
    recs = srv.drain()
    n_out = sum(len(b64mod.b64decode(r["pcm16"])) // 2
                for r in recs if r.get("sid") == "dave")
    assert n_out == 2 * block
