"""Train-step tests: loss decreases, schedules match the reference formulas,
frozen encoder stays frozen, and the full distributed step runs on an
8-virtual-device ('data','model') mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from speech_cloner_tpu.models import decoder as dec_m
from speech_cloner_tpu.models import encoder as enc_m
from speech_cloner_tpu.models import speaker_id as spk_m
from speech_cloner_tpu.parallel import batch_sharding, make_mesh, shard_params, shard_state
from speech_cloner_tpu.train import (
    DecoderLossConfig,
    OptimizerConfig,
    decoder_train_step,
    encoder_eval_step,
    encoder_train_step,
    f_mel_schedule,
    make_train_state,
    next_epoch,
    speaker_train_step,
)

RNG = np.random.default_rng(0)


def _enc_setup(B=4, T=32, E=16, O=61):
    cfg = enc_m.EncoderConfig(n_timesteps=T, input_dim=E, n_output=O,
                              num_conv_banks=3, num_highwaynet_blocks=1)
    params, state = enc_m.init(jax.random.PRNGKey(0), cfg)
    opt_cfg = OptimizerConfig()
    ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(1))
    mfcc = jnp.asarray(RNG.standard_normal((B, T, E)), jnp.float32)
    lbl = RNG.integers(0, O, (B, T))
    phn = jnp.asarray(np.eye(O, dtype=np.float32)[lbl])
    return cfg, opt_cfg, ts, mfcc, phn


def test_encoder_train_loss_decreases():
    cfg, _, ts, mfcc, phn = _enc_setup()
    opt_cfg = OptimizerConfig(learning_rate=5e-3)
    ts = make_train_state(ts["params"], ts["model_state"], opt_cfg, jax.random.PRNGKey(1))
    opt = opt_cfg.make()
    step = jax.jit(lambda t: encoder_train_step(t, mfcc, phn, cfg=cfg,
                                                opt_cfg=opt_cfg, opt=opt))
    losses = []
    for _ in range(150):
        ts, m = step(ts)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::30]
    assert int(ts["step"]) == 150
    ev = encoder_eval_step(ts["params"], ts["model_state"], mfcc, phn, cfg=cfg)
    assert float(ev["acc"]) > 0.1


def test_lr_schedule_matches_reference():
    opt_cfg = OptimizerConfig(learning_rate=1e-3, decay=1e-3)
    # lr = lr0 / (1 + decay*epoch) (encoder.py:183)
    for epoch in (0, 1, 10, 500):
        np.testing.assert_allclose(float(opt_cfg.lr_at(jnp.asarray(float(epoch)))),
                                   1e-3 / (1 + 1e-3 * epoch), rtol=1e-6)


def test_f_mel_schedule_matches_reference():
    # f = min(1, 1.02*tanh(epoch/500)) (decoder.py:259)
    for epoch in (0, 100, 500, 5000):
        got = float(f_mel_schedule(jnp.asarray(epoch, jnp.int32), 500.0))
        ref = min(1.0, 1.02 * np.tanh(epoch / 500.0))
        np.testing.assert_allclose(got, ref, rtol=1e-6)


def _dec_setup(B=4, T=32):
    enc_cfg = enc_m.EncoderConfig(n_timesteps=T, input_dim=16, n_output=61,
                                  num_conv_banks=2, num_highwaynet_blocks=1)
    enc_params, enc_state = enc_m.init(jax.random.PRNGKey(2), enc_cfg)
    dec_cfg = dec_m.DecoderConfig(
        n_timesteps=T, input_dim=61,
        step1=dec_m.DecoderStepConfig(32, 3, 1, 20),
        step2=dec_m.DecoderStepConfig(48, 3, 1, 51),
        use_target_mel_step2=True,
    )
    params, state = dec_m.init(jax.random.PRNGKey(3), dec_cfg)
    opt_cfg = OptimizerConfig()
    ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(4))
    mfcc = jnp.asarray(RNG.standard_normal((B, T, 16)), jnp.float32)
    mel = jnp.asarray(RNG.standard_normal((B, T, 20)) * 0.1, jnp.float32)
    stft = jnp.asarray(RNG.standard_normal((B, T, 51)) * 0.1, jnp.float32)
    return enc_cfg, enc_params, enc_state, dec_cfg, opt_cfg, ts, mfcc, mel, stft


def test_decoder_train_loss_decreases_and_encoder_frozen():
    enc_cfg, enc_params, enc_state, dec_cfg, opt_cfg, ts, mfcc, mel, stft = _dec_setup()
    opt = opt_cfg.make()
    loss_cfg = DecoderLossConfig()
    step = jax.jit(lambda t: decoder_train_step(
        t, mfcc, mel, stft, enc_params=enc_params, enc_state=enc_state,
        enc_cfg=enc_cfg, cfg=dec_cfg, loss_cfg=loss_cfg, opt_cfg=opt_cfg, opt=opt))
    enc_before = jax.tree.map(np.asarray, enc_params)
    losses = []
    for _ in range(20):
        ts, m = step(ts)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[::5]
    # frozen encoder params untouched (they're inputs, not TrainState)
    for a, b in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # f_mel schedule at epoch 0 is 0 -> step2 consumed target_mel
    assert float(m["f_mel_pred"]) == 0.0
    ts2 = next_epoch(ts)
    assert int(ts2["epoch"]) == 1


def test_speaker_train_step_runs():
    cfg = spk_m.SpeakerIdConfig(n_timesteps=36, n_features=41, n_output=4)
    params, state = spk_m.init(jax.random.PRNGKey(5), cfg)
    opt_cfg = OptimizerConfig(learning_rate=1e-4)
    opt = opt_cfg.make()
    ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(6))
    x = jnp.asarray(RNG.standard_normal((4, 36, 41)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[RNG.integers(0, 4, 4)])
    step = jax.jit(lambda t: speaker_train_step(t, x, y, cfg=cfg, opt_cfg=opt_cfg, opt=opt))
    losses = []
    for _ in range(10):
        ts, m = step(ts)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_distributed_decoder_train_step_8dev():
    """Full decoder train step over a (data=4, model=2) mesh: DP-sharded batch,
    TP-sharded bank kernels, one real step — the multichip dry-run path."""
    assert jax.device_count() >= 8, "conftest must force 8 virtual CPU devices"
    mesh = make_mesh(n_data=4, n_model=2)
    enc_cfg, enc_params, enc_state, dec_cfg, opt_cfg, ts, mfcc, mel, stft = _dec_setup(B=8)
    opt = opt_cfg.make()
    loss_cfg = DecoderLossConfig()

    with mesh:
        ts = {**ts,
              "params": shard_params(ts["params"], mesh),
              "model_state": shard_state(ts["model_state"], mesh)}
        enc_params = shard_params(enc_params, mesh)
        enc_state = shard_state(enc_state, mesh)
        bsh = batch_sharding(mesh)
        mfcc, mel, stft = (jax.device_put(a, bsh) for a in (mfcc, mel, stft))

        step = jax.jit(lambda t, a, b, c: decoder_train_step(
            t, a, b, c, enc_params=enc_params, enc_state=enc_state,
            enc_cfg=enc_cfg, cfg=dec_cfg, loss_cfg=loss_cfg,
            opt_cfg=opt_cfg, opt=opt))
        ts2, metrics = step(ts, mfcc, mel, stft)
        assert np.isfinite(float(metrics["loss"]))
        # TP sharding actually applied to the bank kernels
        k0 = ts2["params"]["step2"]["CBHG"]["banks"]["kernels"][0]
        assert "model" in str(k0.sharding.spec)

        # a second step reuses the compiled program and matches single-device math
        ts3, m3 = step(ts2, mfcc, mel, stft)
        assert np.isfinite(float(m3["loss"]))


def test_distributed_matches_single_device():
    """One DP+TP step == one single-device step (same inputs/params)."""
    enc_cfg, enc_params, enc_state, dec_cfg, opt_cfg, ts, mfcc, mel, stft = _dec_setup(B=8)
    opt = opt_cfg.make()
    loss_cfg = DecoderLossConfig()

    def run(t, a, b, c):
        return decoder_train_step(
            t, a, b, c, enc_params=enc_params, enc_state=enc_state,
            enc_cfg=enc_cfg, cfg=dec_cfg, loss_cfg=loss_cfg, opt_cfg=opt_cfg, opt=opt)

    _, m_single = jax.jit(run)(ts, mfcc, mel, stft)

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        ts_d = {**ts, "params": shard_params(ts["params"], mesh),
                "model_state": shard_state(ts["model_state"], mesh)}
        bsh = batch_sharding(mesh)
        args = [jax.device_put(a, bsh) for a in (mfcc, mel, stft)]
        _, m_dist = jax.jit(run)(ts_d, *args)

    np.testing.assert_allclose(float(m_dist["loss"]), float(m_single["loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m_dist["mel_loss"]), float(m_single["mel_loss"]), rtol=1e-4)


def test_bn_recalibration_collects_true_batch_stats():
    """collect_bn_state must replace the 0.999-decay moving stats with the
    average of the TRUE batch statistics (train/bn_recal.py). At production
    geometry the moving average lags eval metrics by thousands of steps
    (demo run: eval acc 0.02 with moving stats vs 0.91 with batch stats at
    step 780 — docs/DESIGN.md 'BN recalibration'); this pins the mechanism.
    """
    from speech_cloner_tpu.nn import modules as M
    from speech_cloner_tpu.train.bn_recal import collect_bn_state, make_bn_stat_fn

    C = 8
    bn_params, bn_state = M.bn_init(C)
    bn_state = {"mean": jnp.full((C,), 7.0), "var": jnp.full((C,), 9.0)}  # stale

    stat_fn = make_bn_stat_fn(
        lambda p, s, x, bn_momentum=None: M.bn_apply(
            p, s, x, train=True, momentum=bn_momentum)[1])

    batches = [(jnp.asarray(RNG.standard_normal((4, 10, C)) * (i + 1) + i,
                            jnp.float32),) for i in range(3)]
    new_state = collect_bn_state(stat_fn, bn_params, bn_state, iter(batches),
                                 max_batches=3)

    # expected: plain average of each batch's true mean/var — no trace of the
    # stale moving stats or the 0.999 momentum
    exp_mean = np.mean([np.asarray(b[0]).mean(axis=(0, 1)) for b in batches], axis=0)
    exp_var = np.mean([np.asarray(b[0]).var(axis=(0, 1)) for b in batches], axis=0)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), exp_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]), exp_var, rtol=1e-5)

    # eval with recalibrated stats normalizes a matching batch correctly
    y, _ = M.bn_apply(bn_params, new_state, batches[1][0], train=False)
    assert abs(float(jnp.mean(y))) < 1.5  # vs wildly off with the stale stats
    y_stale, _ = M.bn_apply(bn_params, bn_state, batches[1][0], train=False)
    assert abs(float(jnp.mean(y_stale))) > abs(float(jnp.mean(y)))

    # the momentum constant is restored after recalibration
    assert M.BN_MOMENTUM == 0.999


def test_vocoded_augmentation():
    """train/augment.py: a GL-resynthesized power window stays in the input
    domain ([-1,1], same shape), differs from the original (the domain shift
    it exists to span), but remains correlated with it (same content); and
    frac=0 / frac=1 / bernoulli selection behave as specified."""
    import jax

    from speech_cloner_tpu.ops import FeatureConfig, mfcc_input
    from speech_cloner_tpu.train.augment import mix_vocoded, vocoded_power_window

    cfg = FeatureConfig()
    rng = np.random.default_rng(0)
    t = np.arange(40 * cfg.hop_length + cfg.win_length) / cfg.sample_rate
    wav = (np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
           + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
    _, _, p_dB = mfcc_input(wav, cfg, xp=np)
    p = jnp.asarray(p_dB[:40][None])  # [1, 40, n_stft]

    voc = np.asarray(mix_vocoded(p, cfg, key=jax.random.PRNGKey(0), frac=1.0,
                                 n_iter=8))
    assert voc.shape == p.shape and voc.dtype == np.float32
    assert voc.min() >= -1.0 and voc.max() <= 1.0
    d = np.abs(voc - np.asarray(p)).mean()
    assert d > 1e-3, f"vocoding changed nothing ({d})"
    c = np.corrcoef(voc.ravel(), np.asarray(p).ravel())[0, 1]
    assert c > 0.7, f"vocoded window lost the content (corr {c})"

    # frac=0 is the identity
    same = mix_vocoded(p, cfg, key=jax.random.PRNGKey(0), frac=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(p))

    # bernoulli selection: with B=6 and frac=0.5, some rows swap, some stay
    pb = jnp.tile(p, (6, 1, 1))
    mixed = np.asarray(mix_vocoded(pb, cfg, key=jax.random.PRNGKey(1),
                                   frac=0.5, n_iter=8))
    row_changed = np.abs(mixed - np.asarray(pb)).mean(axis=(1, 2)) > 1e-6
    assert 0 < row_changed.sum() < 6

    # single-window helper agrees with the batch path
    one = np.asarray(vocoded_power_window(p[0], cfg,
                                          key=jax.random.PRNGKey(2), n_iter=8))
    assert one.shape == p[0].shape


def test_mixed_precision_train_steps():
    """compute_dtype=bfloat16: master params/opt-state/BN stats stay f32,
    loss decreases comparably to the f32 run, grads flow (cast-transpose)."""
    cfg, _, ts0, mfcc, phn = _enc_setup()
    opt_cfg = OptimizerConfig(learning_rate=5e-3)
    opt = opt_cfg.make()

    def run(compute_dtype, n=120):
        ts = make_train_state(ts0["params"], ts0["model_state"], opt_cfg,
                              jax.random.PRNGKey(1))
        step = jax.jit(lambda t: encoder_train_step(
            t, mfcc, phn, cfg=cfg, opt_cfg=opt_cfg, opt=opt,
            compute_dtype=compute_dtype))
        losses = []
        for _ in range(n):
            ts, m = step(ts)
            losses.append(float(m["loss"]))
        return ts, losses

    ts_bf, l_bf = run(jnp.bfloat16)
    ts_f32, l_f32 = run(None)

    # every floating leaf of the train state stays f32 (master weights)
    for leaf in jax.tree.leaves(ts_bf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype
    assert l_bf[-1] < l_bf[0] * 0.8, l_bf[::30]
    # bf16 tracks the f32 trajectory to within a loose factor
    assert l_bf[-1] < l_f32[-1] * 1.5 + 0.1, (l_bf[-1], l_f32[-1])

    # decoder step runs under bf16 and decreases too
    enc_cfg, enc_p, enc_s, dec_cfg, d_opt_cfg, dts, dmfcc, dmel, dstft = _dec_setup()
    d_opt = d_opt_cfg.make()
    dstep = jax.jit(lambda t: decoder_train_step(
        t, dmfcc, dmel, dstft, enc_params=enc_p, enc_state=enc_s,
        enc_cfg=enc_cfg, cfg=dec_cfg, loss_cfg=DecoderLossConfig(),
        opt_cfg=d_opt_cfg, opt=d_opt, compute_dtype=jnp.bfloat16))
    dl = []
    for _ in range(40):
        dts, dm = dstep(dts)
        dl.append(float(dm["loss"]))
    assert dl[-1] < dl[0] * 0.8, dl[::10]
    for leaf in jax.tree.leaves(dts):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_distributed_bf16_fused_train_step_8dev():
    """The recommended production config (--bf16 --fused-gru) under the
    (data=4, model=2) mesh: compiles, runs, TP sharding intact."""
    import dataclasses

    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_model=2)
    enc_cfg, enc_params, enc_state, dec_cfg, opt_cfg, ts, mfcc, mel, stft = _dec_setup(B=8)
    dec_cfg = dataclasses.replace(
        dec_cfg,
        step1=dataclasses.replace(dec_cfg.step1, fused_gru=True),
        step2=dataclasses.replace(dec_cfg.step2, fused_gru=True))
    enc_cfg = dataclasses.replace(enc_cfg, fused_gru=True)
    opt = opt_cfg.make()
    with mesh:
        ts = {**ts, "params": shard_params(ts["params"], mesh),
              "model_state": shard_state(ts["model_state"], mesh)}
        enc_params = shard_params(enc_params, mesh)
        enc_state = shard_state(enc_state, mesh)
        bsh = batch_sharding(mesh)
        mfcc, mel, stft = (jax.device_put(a, bsh) for a in (mfcc, mel, stft))
        step = jax.jit(lambda t, a, b, c: decoder_train_step(
            t, a, b, c, enc_params=enc_params, enc_state=enc_state,
            enc_cfg=enc_cfg, cfg=dec_cfg, loss_cfg=DecoderLossConfig(),
            opt_cfg=opt_cfg, opt=opt, compute_dtype=jnp.bfloat16))
        ts2, m = step(ts, mfcc, mel, stft)
        assert np.isfinite(float(m["loss"]))
        k0 = ts2["params"]["step2"]["CBHG"]["banks"]["kernels"][0]
        assert "model" in str(k0.sharding.spec)
        assert k0.dtype == jnp.float32  # master weights stay f32


def test_fused_loop_resumes_from_misaligned_step(tmp_path):
    """Resume from a checkpoint step that is NOT on the fused k-grid: epoch
    boundaries must still fire (boundary-crossing check, not step % spe),
    so schedules/saves/termination keep working after resume."""
    from speech_cloner_tpu.runtime.checkpoint import Checkpointer
    from speech_cloner_tpu.train.loop import LoopConfig, run_training

    ck = Checkpointer(str(tmp_path), "m")
    # a prior run saved at step 5 (e.g. an exact-stop max_steps tail)
    ck.save({"step": np.int64(5), "epoch": np.int64(0),
             "w": np.zeros(3, np.float32)}, step=5, sync=True)

    def train_step(ts, x):
        return {**ts, "step": ts["step"] + 1,
                "w": ts["w"] + jnp.mean(x)}, {"loss": jnp.mean(x)}

    def batches():
        for _ in range(100):
            yield (np.ones(4, np.float32),)

    ts0 = {"step": jnp.asarray(0, jnp.int64), "epoch": jnp.asarray(0, jnp.int64),
           "w": jnp.zeros(3)}
    cfg = LoopConfig(n_epochs=99, steps_per_epoch=6, save_each_n_epochs=1,
                     steps_per_call=3, max_steps=17, prefetch=0)
    ts = run_training(ts0, batches, None, train_step, None, cfg, ckpt=ck)
    # resumed 5 -> fused calls land on 8, 11, 14, 17; boundaries at 6 and 12
    # fire (late but fire) -> epoch reaches 2, and cadence saves happened
    assert int(ts["epoch"]) == 2, int(ts["epoch"])
    assert 8 in ck.steps() and 14 in ck.steps(), ck.steps()
    assert ck.latest_step() == 17


def test_speaker_train_step_bf16_close_to_f32():
    """speaker_train_step(compute_dtype=bf16): finite metrics, f32 master
    params, and a loss close to the f32 step's (the same mixed-precision
    contract the encoder/decoder steps honor)."""
    import dataclasses

    from speech_cloner_tpu.models import speaker_id as spk_m
    from speech_cloner_tpu.train import (
        OptimizerConfig, make_train_state, speaker_train_step)

    cfg = spk_m.SpeakerIdConfig(n_timesteps=32, n_features=33, n_output=5)
    params, state = spk_m.init(jax.random.PRNGKey(0), cfg)
    opt_cfg = OptimizerConfig()
    opt = opt_cfg.make()
    ts = make_train_state(params, state, opt_cfg, jax.random.PRNGKey(1))
    x = jnp.asarray(RNG.standard_normal((4, 32, 33)) * 0.3, jnp.float32)
    y = jnp.asarray(np.eye(5, dtype=np.float32)[RNG.integers(0, 5, 4)])

    ts32, m32 = jax.jit(lambda t, a, b: speaker_train_step(
        t, a, b, cfg=cfg, opt_cfg=opt_cfg, opt=opt))(ts, x, y)
    ts16, m16 = jax.jit(lambda t, a, b: speaker_train_step(
        t, a, b, cfg=cfg, opt_cfg=opt_cfg, opt=opt,
        compute_dtype=jnp.bfloat16))(ts, x, y)
    assert np.isfinite(float(m16["loss"]))
    assert abs(float(m16["loss"]) - float(m32["loss"])) < 0.05
    leaf = jax.tree.leaves(ts16["params"])[0]
    assert leaf.dtype == jnp.float32  # master weights stay f32


def test_resume_of_finished_run_is_a_noop(tmp_path):
    """Restarting a stage that already hit max_steps must not re-run
    pre_eval_fn (BN recalibration costs a full remote compile) or rewrite
    the checkpoint — the saved state was already recalibrated when written."""
    from speech_cloner_tpu.runtime.checkpoint import Checkpointer
    from speech_cloner_tpu.train.loop import LoopConfig, run_training

    ck = Checkpointer(str(tmp_path), "m")

    def train_step(ts, x):
        return {**ts, "step": ts["step"] + 1,
                "w": ts["w"] + jnp.mean(x)}, {"loss": jnp.mean(x)}

    def batches():
        for _ in range(50):
            yield (np.ones(4, np.float32),)

    calls = {"pre_eval": 0}

    def pre_eval(ts):
        calls["pre_eval"] += 1
        return ts

    ts0 = {"step": jnp.asarray(0, jnp.int64), "epoch": jnp.asarray(0, jnp.int64),
           "w": jnp.zeros(3)}
    cfg = LoopConfig(n_epochs=99, steps_per_epoch=4, save_each_n_epochs=10,
                     steps_per_call=1, max_steps=8, prefetch=0)
    run_training(ts0, batches, None, train_step, None, cfg, ckpt=ck,
                 pre_eval_fn=pre_eval)
    assert ck.latest_step() == 8
    n_pre = calls["pre_eval"]
    assert n_pre >= 1  # the final save recalibrated
    mtime = max(os.path.getmtime(os.path.join(str(tmp_path), f))
                for f in os.listdir(str(tmp_path)))

    # second invocation: resumes at 8 == max_steps -> zero steps, no recal,
    # no rewrite
    run_training(ts0, batches, None, train_step, None, cfg, ckpt=ck,
                 pre_eval_fn=pre_eval)
    assert calls["pre_eval"] == n_pre
    mtime2 = max(os.path.getmtime(os.path.join(str(tmp_path), f))
                 for f in os.listdir(str(tmp_path)))
    assert mtime2 == mtime


def test_resume_of_epoch_finished_run_is_a_noop(tmp_path):
    """Same guard for the epoch-terminated path (ADVICE r03): a run that
    stopped via n_epochs and is restarted must not train an extra epoch,
    re-run pre_eval_fn, or rewrite the checkpoint."""
    from speech_cloner_tpu.runtime.checkpoint import Checkpointer
    from speech_cloner_tpu.train.loop import LoopConfig, run_training

    ck = Checkpointer(str(tmp_path), "m")
    n_steps = {"n": 0}

    def train_step(ts, x):
        n_steps["n"] += 1
        return {**ts, "step": ts["step"] + 1,
                "w": ts["w"] + jnp.mean(x)}, {"loss": jnp.mean(x)}

    def batches():
        for _ in range(50):
            yield (np.ones(4, np.float32),)

    calls = {"pre_eval": 0}

    def pre_eval(ts):
        calls["pre_eval"] += 1
        return ts

    ts0 = {"step": jnp.asarray(0, jnp.int64), "epoch": jnp.asarray(0, jnp.int64),
           "w": jnp.zeros(3)}
    cfg = LoopConfig(n_epochs=2, steps_per_epoch=4, save_each_n_epochs=1,
                     steps_per_call=1, max_steps=None, prefetch=0)
    run_training(ts0, batches, None, train_step, None, cfg, ckpt=ck,
                 pre_eval_fn=pre_eval)
    assert ck.latest_step() == 8 and n_steps["n"] == 8
    n_pre = calls["pre_eval"]
    mtime = max(os.path.getmtime(os.path.join(str(tmp_path), f))
                for f in os.listdir(str(tmp_path)))

    # restart: resumes at epoch 2 == n_epochs -> zero steps, no recal,
    # no checkpoint rewrite (previously trained a whole extra epoch)
    run_training(ts0, batches, None, train_step, None, cfg, ckpt=ck,
                 pre_eval_fn=pre_eval)
    assert n_steps["n"] == 8
    assert calls["pre_eval"] == n_pre
    mtime2 = max(os.path.getmtime(os.path.join(str(tmp_path), f))
                 for f in os.listdir(str(tmp_path)))
    assert mtime2 == mtime
