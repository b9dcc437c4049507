"""Semantic parity of nn/ modules against genuine TensorFlow/Keras ops, and
end-to-end logits parity of the imported enc_14 encoder against a TF-op
mirror of the reference graph (encoder.py:78-123, modules.py).

These tests pin the TF-1.x conventions our modules must reproduce for the
shipped checkpoints to be usable: asymmetric 'SAME' conv padding, fused-BN
epsilon, GRU gate equations (keras GRU(reset_after=False) is mathematically
tf.contrib.rnn.GRUCell up to gate relabeling), maxpool 'same' alignment, and
the conv-bank packing trick.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax
import jax.numpy as jnp

from speech_cloner_tpu.nn import modules as M

RNG = np.random.default_rng(1)
ENC14 = "/root/reference/enc_14_ckpt/encoder-136512"


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


# ----------------------------------------------------------------- conv1d ---

@pytest.mark.parametrize("width", [1, 2, 3, 4, 6, 32])
def test_conv1d_same_matches_tf(width):
    x = _rand(2, 50, 8)
    k = _rand(width, 8, 16)
    ref = tf.nn.conv1d(tf.constant(x), tf.constant(k), stride=1, padding="SAME").numpy()
    mine = np.asarray(M.conv1d({"kernel": jnp.asarray(k)}, jnp.asarray(x)))
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_maxpool1d_same_matches_tf():
    x = _rand(2, 50, 8)
    ref = tf.nn.max_pool1d(tf.constant(x), ksize=2, strides=1, padding="SAME").numpy()
    mine = np.asarray(M.maxpool1d_same(jnp.asarray(x)))
    np.testing.assert_allclose(mine, ref, atol=1e-6)


# --------------------------------------------------------------------- bn ---

def test_bn_inference_matches_fused_batch_norm():
    C = 16
    x = _rand(2, 50, C)
    gamma, beta = _rand(C) * 0.1 + 1.0, _rand(C) * 0.1
    mean, var = _rand(C) * 0.1, np.abs(_rand(C)) + 0.5
    ref, _, _ = tf.compat.v1.nn.fused_batch_norm(
        tf.constant(x[:, None]), tf.constant(gamma), tf.constant(beta),
        tf.constant(mean), tf.constant(var), epsilon=1e-3, is_training=False,
        data_format="NHWC",
    )
    ref = ref.numpy()[:, 0]
    params = {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)}
    state = {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}
    mine, _ = M.bn_apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(mine), ref, atol=1e-5)


# -------------------------------------------------------------------- gru ---

def _keras_gru_from_tf1(params, units, go_backwards=False):
    """Build a keras GRU(reset_after=False) carrying TF1-GRUCell weights.

    TF1 layout: gates_kernel [(C+H), 2H] ordered [r, u]; candidate_kernel
    [(C+H), H]. Keras layout: kernel [C, 3H] + recurrent [H, 3H] ordered
    [z, r, h], where keras z == TF1 u and h' = z*h + (1-z)*htilde — the same
    update equation.
    """
    import keras

    C = params["gates_kernel"].shape[0] - units
    H = units
    Wg, bg = np.asarray(params["gates_kernel"]), np.asarray(params["gates_bias"])
    Wc, bc = np.asarray(params["candidate_kernel"]), np.asarray(params["candidate_bias"])
    kernel = np.concatenate([Wg[:C, H:], Wg[:C, :H], Wc[:C]], axis=1)
    recurrent = np.concatenate([Wg[C:, H:], Wg[C:, :H], Wc[C:]], axis=1)
    bias = np.concatenate([bg[H:], bg[:H], bc])
    gru = keras.layers.GRU(units, reset_after=False, return_sequences=True,
                           go_backwards=go_backwards)
    gru.build((None, None, C))
    gru.set_weights([kernel, recurrent, bias])
    return gru


def test_gru_dir_matches_keras_tf1_semantics():
    C, H, B, T = 6, 8, 2, 20
    key = jax.random.PRNGKey(0)
    params = M.gru_dir_init(key, C, H)
    x = _rand(B, T, C)
    mine = np.asarray(M._gru_dir_apply(params, jnp.asarray(x)))
    ref = _keras_gru_from_tf1(params, H)(tf.constant(x)).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_bidirectional_gru_matches_keras():
    C, H, B, T = 6, 8, 2, 20
    key = jax.random.PRNGKey(1)
    params = M.gru_init(key, C, H, bidirectional=True)
    x = _rand(B, T, C)
    mine = np.asarray(M.gru_apply(params, jnp.asarray(x)))
    fw = _keras_gru_from_tf1(params["fw"], H)(tf.constant(x)).numpy()
    bw = _keras_gru_from_tf1(params["bw"], H)(tf.constant(x[:, ::-1])).numpy()[:, ::-1]
    ref = np.concatenate([fw, bw], axis=2)
    np.testing.assert_allclose(mine, ref, atol=1e-5)


# ------------------------------------------------------------- bank fusion ---

def test_packed_banks_equal_separate_convs():
    """The single fused width-K conv must equal K separate TF 'SAME' convs of
    widths 1..K concatenated on channels (modules.py:159-165)."""
    K, C, B, T, CH = 6, 8, 2, 30, 4
    kernels = [jnp.asarray(_rand(k, C, CH)) for k in range(1, K + 1)]
    x = _rand(B, T, C)
    big = M.pack_bank_kernels(kernels, K)
    mine = np.asarray(M.conv1d({"kernel": big}, jnp.asarray(x)))
    refs = [
        tf.nn.conv1d(tf.constant(x), tf.constant(np.asarray(kern)), stride=1,
                     padding="SAME").numpy()
        for kern in kernels
    ]
    ref = np.concatenate(refs, axis=2)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


# ----------------------------------------------- enc_14 end-to-end parity ---

def _tf_stack_forward(r, scope, x, num_banks, num_highway):
    """Mirror of one reference prenet+CBHG+dense stack built from raw TF ops +
    keras GRU, reading TF1-named weights from checkpoint reader ``r``
    (encoder.py:94-111 and decoder.py:97-180 share this exact structure)."""
    g = lambda n: tf.constant(r.get_tensor(n))
    x = tf.constant(np.asarray(x))

    def dense(prefix, h, act=None):
        h = tf.matmul(h, g(f"{prefix}/kernel")) + g(f"{prefix}/bias")
        return act(h) if act else h

    def bn(prefix, h):
        y, _, _ = tf.compat.v1.nn.fused_batch_norm(
            h[:, None], g(f"{prefix}/gamma"), g(f"{prefix}/beta"),
            g(f"{prefix}/moving_mean"), g(f"{prefix}/moving_variance"),
            epsilon=1e-3, is_training=False, data_format="NHWC")
        return y[:, 0]

    # prenet (dropout inactive at inference)
    h = dense(f"{scope}/prenet/dense1", x, tf.nn.relu)
    h = dense(f"{scope}/prenet/dense2", h, tf.nn.relu)
    prenet_out = h

    # conv banks: K separate convs, concat, shared BN + relu
    outs = [tf.nn.conv1d(h, g(f"{scope}/CBHG/conv1d_banks/conv1d/conv1d/kernel"),
                         stride=1, padding="SAME")]
    for k in range(2, num_banks + 1):
        outs.append(tf.nn.conv1d(
            h, g(f"{scope}/CBHG/conv1d_banks/num_{k}/conv1d/conv1d/kernel"),
            stride=1, padding="SAME"))
    h = tf.concat(outs, axis=2)
    h = tf.nn.relu(bn(f"{scope}/CBHG/conv1d_banks/bn", h))

    h = tf.nn.max_pool1d(h, ksize=2, strides=1, padding="SAME")
    h = tf.nn.conv1d(h, g(f"{scope}/CBHG/conv1d_1/conv1d/kernel"), stride=1, padding="SAME")
    h = tf.nn.relu(bn(f"{scope}/CBHG/conv1d_1", h))
    h = tf.nn.conv1d(h, g(f"{scope}/CBHG/conv1d_2/conv1d/kernel"), stride=1, padding="SAME")
    h = bn(f"{scope}/CBHG/conv1d_2", h)
    h = h + prenet_out

    for i in range(num_highway):
        H_ = dense(f"{scope}/CBHG/highwaynet_{i}/dense1", h, tf.nn.relu)
        T_ = dense(f"{scope}/CBHG/highwaynet_{i}/dense2", h, tf.nn.sigmoid)
        h = H_ * T_ + h * (1.0 - T_)

    # bidirectional GRU with TF1-layout weights
    units = r.get_tensor(f"{scope}/CBHG/gru/bidirectional_rnn/fw/gru_cell/candidate/bias").shape[0]

    def gru_params(d):
        p = f"{scope}/CBHG/gru/bidirectional_rnn/{d}/gru_cell"
        return {
            "gates_kernel": r.get_tensor(f"{p}/gates/kernel"),
            "gates_bias": r.get_tensor(f"{p}/gates/bias"),
            "candidate_kernel": r.get_tensor(f"{p}/candidate/kernel"),
            "candidate_bias": r.get_tensor(f"{p}/candidate/bias"),
        }

    fw = _keras_gru_from_tf1(gru_params("fw"), units)(h).numpy()
    bw = _keras_gru_from_tf1(gru_params("bw"), units)(h.numpy()[:, ::-1]).numpy()[:, ::-1]
    h = tf.constant(np.concatenate([fw, bw], axis=2))

    return dense(f"{scope}/y_logits", h).numpy()


def _tf_encoder_forward(ckpt, x, num_banks=6, num_highway=1):
    return _tf_stack_forward(tf.train.load_checkpoint(ckpt), "encoder", x,
                             num_banks, num_highway)


@pytest.mark.skipif(not os.path.exists(ENC14 + ".index"), reason="enc_14 ckpt absent")
def test_enc14_import_logits_parity():
    from speech_cloner_tpu.models import encoder as enc
    from speech_cloner_tpu.runtime.tf_import import load_tf_encoder

    cfg = enc.EncoderConfig()  # production config: E=80, K=6, hwy=1
    params, state = load_tf_encoder(ENC14, cfg)
    x = (_rand(2, 400, 80) * 0.1).astype(np.float32)

    logits, _ = enc.apply(params, state, jnp.asarray(x), cfg=cfg, train=False)
    ref = _tf_encoder_forward(ENC14, x)

    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4)
    # posteriors: tighter in probability space
    mine_p = np.asarray(enc.posteriors(jnp.asarray(np.asarray(logits))))
    ref_p = np.exp(ref) / np.exp(ref).sum(-1, keepdims=True)
    np.testing.assert_allclose(mine_p, ref_p, atol=1e-5)


ENC6 = "/root/reference/enc_6_ckpt/encoder-184032"


@pytest.mark.skipif(not os.path.exists(ENC6 + ".index"), reason="enc_6 ckpt absent")
def test_enc6_import_different_geometry():
    """The importer must handle the alternate shipped geometry (E=64, K=4,
    hwy=2, 40-dim input, per enc_6_ckpt/encoder_6_cfg_d.json)."""
    import json

    from speech_cloner_tpu.models import encoder as enc
    from speech_cloner_tpu.runtime.tf_import import load_tf_encoder

    with open("/root/reference/enc_6_ckpt/encoder_6_cfg_d.json") as f:
        cfg = enc.config_from_cfg_d(json.load(f))
    assert cfg.embed == 64 and cfg.num_conv_banks == 4
    params, state = load_tf_encoder(ENC6, cfg)
    assert params["prenet"]["dense1"]["kernel"].shape == (40, 64)
    assert len(params["CBHG"]["banks"]["kernels"]) == 4
    assert len(params["CBHG"]["highway"]) == 2

    x = jnp.asarray(_rand(1, 400, 40) * 0.1)
    logits, _ = enc.apply(params, state, x, cfg=cfg, train=False)
    assert logits.shape == (1, 400, 61)
    probs = np.asarray(enc.posteriors(logits))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # a trained model on in-range input should not be uniform
    assert probs.max() > 0.2


@pytest.mark.skipif(not os.path.exists(ENC14 + ".index"), reason="enc_14 ckpt absent")
def test_pure_python_bundle_reader_matches_tf():
    """runtime/tf_bundle.BundleReader must be byte-identical to
    tf.train.load_checkpoint on the shipped checkpoint."""
    from speech_cloner_tpu.runtime.tf_bundle import BundleReader

    mine = BundleReader(ENC14)
    ref = tf.train.load_checkpoint(ENC14)
    ref_map = ref.get_variable_to_shape_map()
    assert set(ref_map) == set(mine.get_variable_to_shape_map())
    for k in sorted(ref_map):
        a, b = ref.get_tensor(k), mine.get_tensor(k)
        assert a.dtype == b.dtype and list(a.shape) == list(b.shape)
        np.testing.assert_array_equal(a, b)


def _keras_lstm_from_tf1(params, units):
    """keras LSTM carrying TF1-LSTMCell weights. TF1 layout: kernel
    [(C+H),4H] gate order [i, j(candidate), f, o], forget_bias added in-cell;
    keras order [i, f, c, o] with the forget bias folded into the bias."""
    import keras

    W = np.asarray(params["kernel"])
    b = np.asarray(params["bias"])
    fb = params["forget_bias"]
    C = W.shape[0] - units
    i_, j_, f_, o_ = np.split(W, 4, axis=1)
    bi, bj, bf, bo = np.split(b, 4)
    lstm = keras.layers.LSTM(units, return_sequences=True, unit_forget_bias=False)
    lstm.build((None, None, C))
    lstm.set_weights([
        np.concatenate([i_[:C], f_[:C], j_[:C], o_[:C]], 1),
        np.concatenate([i_[C:], f_[C:], j_[C:], o_[C:]], 1),
        np.concatenate([bi, bf + fb, bj, bo]),
    ])
    return lstm


def test_lstm_dir_matches_keras_tf1_semantics():
    C, H, B, T = 5, 7, 2, 16
    params = M.lstm_dir_init(jax.random.PRNGKey(3), C, H)
    x = _rand(B, T, C)
    mine = np.asarray(M._lstm_dir_apply(params, jnp.asarray(x)))
    ref = _keras_lstm_from_tf1(params, H)(tf.constant(x)).numpy()
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_bidirectional_lstm_matches_keras():
    C, H, B, T = 5, 7, 2, 16
    params = M.lstm_init(jax.random.PRNGKey(4), C, H, bidirectional=True)
    x = _rand(B, T, C)
    mine = np.asarray(M.lstm_apply(params, jnp.asarray(x)))
    fw = _keras_lstm_from_tf1(params["fw"], H)(tf.constant(x)).numpy()
    bw = _keras_lstm_from_tf1(params["bw"], H)(tf.constant(x[:, ::-1])).numpy()[:, ::-1]
    np.testing.assert_allclose(mine, np.concatenate([fw, bw], 2), atol=1e-5)


# ------------------------------------------- decoder TF-ckpt import parity ---
#
# The reference ships no decoder checkpoint, so load_tf_decoder's name mapping
# (decoder.py:78-180 scopes) is pinned here by *constructing* a TF1 decoder
# checkpoint with the reference's exact variable names, saving it with the TF1
# Saver, importing it, and asserting y_mel/y_stft parity against a TF-op
# mirror — the same recipe test_enc14_import_logits_parity uses for the
# shipped encoder.

BANK_FILTERS = 128  # conv1d_banks' un-forwarded embed_size default (modules.py:144)


def _stack_var_values(rng, scope, in_dim, E, K, H, n_out):
    """Numpy values for one prenet+CBHG+y_logits stack, keyed by the TF1
    variable names the reference decoder graph creates."""
    E2 = E // 2

    def rand(*s, scale=0.3):
        return (rng.standard_normal(s) * scale).astype(np.float32)

    def bn_vars(prefix, c):
        return {
            f"{prefix}/gamma": (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32),
            f"{prefix}/beta": rand(c, scale=0.1),
            f"{prefix}/moving_mean": rand(c, scale=0.1),
            f"{prefix}/moving_variance": (np.abs(rng.standard_normal(c)) + 0.5).astype(np.float32),
        }

    v = {
        f"{scope}/prenet/dense1/kernel": rand(in_dim, E),
        f"{scope}/prenet/dense1/bias": rand(E, scale=0.05),
        f"{scope}/prenet/dense2/kernel": rand(E, E2),
        f"{scope}/prenet/dense2/bias": rand(E2, scale=0.05),
        f"{scope}/CBHG/conv1d_banks/conv1d/conv1d/kernel": rand(1, E2, BANK_FILTERS),
        f"{scope}/CBHG/conv1d_1/conv1d/kernel": rand(3, BANK_FILTERS * K, E2, scale=0.05),
        f"{scope}/CBHG/conv1d_2/conv1d/kernel": rand(3, E2, E2),
        f"{scope}/y_logits/kernel": rand(E, n_out),
        f"{scope}/y_logits/bias": rand(n_out, scale=0.05),
    }
    for k in range(2, K + 1):
        v[f"{scope}/CBHG/conv1d_banks/num_{k}/conv1d/conv1d/kernel"] = \
            rand(k, E2, BANK_FILTERS)
    v.update(bn_vars(f"{scope}/CBHG/conv1d_banks/bn", BANK_FILTERS * K))
    v.update(bn_vars(f"{scope}/CBHG/conv1d_1", E2))
    v.update(bn_vars(f"{scope}/CBHG/conv1d_2", E2))
    for i in range(H):
        v[f"{scope}/CBHG/highwaynet_{i}/dense1/kernel"] = rand(E2, E2)
        v[f"{scope}/CBHG/highwaynet_{i}/dense1/bias"] = rand(E2, scale=0.05)
        v[f"{scope}/CBHG/highwaynet_{i}/dense2/kernel"] = rand(E2, E2)
        v[f"{scope}/CBHG/highwaynet_{i}/dense2/bias"] = np.full(E2, -1.0, np.float32)
    for d in ("fw", "bw"):
        p = f"{scope}/CBHG/gru/bidirectional_rnn/{d}/gru_cell"
        v[f"{p}/gates/kernel"] = rand(2 * E2, 2 * E2)
        v[f"{p}/gates/bias"] = np.ones(2 * E2, np.float32)  # TF1 GRUCell default
        v[f"{p}/candidate/kernel"] = rand(2 * E2, E2)
        v[f"{p}/candidate/bias"] = rand(E2, scale=0.05)
    return v


def _save_tf1_ckpt(values: dict, prefix: str):
    """Write values as a genuine TF1 Saver checkpoint (.index + .data)."""
    g = tf.Graph()
    with g.as_default():
        tf1 = tf.compat.v1
        var_map = {name: tf1.get_variable(name, initializer=tf.constant(val))
                   for name, val in values.items()}
        saver = tf1.train.Saver(var_list=var_map)
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, prefix, write_meta_graph=False)


def test_decoder_tf_import_parity(tmp_path):
    """load_tf_decoder's scope mapping, exercised against a real TF1-Saver
    checkpoint of the full two-step decoder graph (decoder.py:97-180)."""
    from speech_cloner_tpu.models import decoder as dec
    from speech_cloner_tpu.runtime.tf_import import load_tf_decoder

    T, IN = 30, 13
    E1, K1, H1, OUT1 = 32, 3, 2, 10
    E2, K2, H2, OUT2 = 48, 2, 1, 17
    rng = np.random.default_rng(5)
    values = {}
    values.update(_stack_var_values(rng, "decoder/step1", IN, E1, K1, H1, OUT1))
    values.update(_stack_var_values(rng, "decoder/step2", OUT1, E2, K2, H2, OUT2))

    prefix = str(tmp_path / "decoder-123")
    _save_tf1_ckpt(values, prefix)
    assert os.path.exists(prefix + ".index")

    cfg = dec.DecoderConfig(
        n_timesteps=T, input_dim=IN,
        step1=dec.DecoderStepConfig(E1, K1, H1, OUT1),
        step2=dec.DecoderStepConfig(E2, K2, H2, OUT2))
    params, state = load_tf_decoder(prefix, cfg)

    ppg = (np.abs(RNG.standard_normal((2, T, IN))) * 0.2).astype(np.float32)
    y_mel, y_stft, _ = dec.apply(params, state, jnp.asarray(ppg), cfg=cfg, train=False)

    r = tf.train.load_checkpoint(prefix)
    ref_mel = _tf_stack_forward(r, "decoder/step1", ppg, K1, H1)
    ref_stft = _tf_stack_forward(r, "decoder/step2", ref_mel, K2, H2)

    np.testing.assert_allclose(np.asarray(y_mel), ref_mel, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y_stft), ref_stft, atol=2e-3)


# ------------------------------------- composed golden parity (demo clip) ---

TRUE_MP3 = ("/root/reference/slt_test_chptr16/"
            "16 The Magic Art of the Great Humbug_true.mp3")


@pytest.mark.skipif(
    not (os.path.exists(ENC14 + ".index") and os.path.exists(TRUE_MP3)),
    reason="enc_14 ckpt or demo mp3 absent")
def test_composed_golden_parity_on_demo_clip():
    """The strongest verifiable slice of BASELINE.md's fidelity claim: the
    REAL shipped demo clip (slt_test_chptr16_true.mp3) through our feature
    front-end -> imported enc_14 -> PPG, pinned against the TF-op mirror of
    the reference encoder graph on the SAME features (test.py:472-491 is the
    path being mirrored; the reference ships no decoder ckpt, so the
    encoder half is the verifiable half of the chain).

    Measured (recorded in README parity matrix): logits max-abs 2.05e-05,
    PPG max-abs 3.52e-06 over 8 windows of real speech (libmpg123 decode).
    """
    from speech_cloner_tpu import ops
    from speech_cloner_tpu.data.audio_io import can_decode_mp3, load_audio

    if not can_decode_mp3():
        pytest.skip("no mp3 decoder (libmpg123/ffmpeg) available")
    from speech_cloner_tpu.models import encoder as enc
    from speech_cloner_tpu.ops.features import FeatureConfig
    from speech_cloner_tpu.runtime.tf_import import load_tf_encoder

    wav = load_audio(TRUE_MP3, 16000)[: 16 * 16000]  # 16 s = 8 full windows
    feat_cfg = FeatureConfig(calc_mfcc_derivate=True)  # 40 MFCC + delta = 80
    mfcc, _, _ = ops.mfcc_input(wav, feat_cfg, xp=np)
    T = 400
    K = mfcc.shape[0] // T
    assert K >= 8
    x = mfcc[: K * T].reshape(K, T, mfcc.shape[1]).astype(np.float32)

    cfg = enc.EncoderConfig()
    params, state = load_tf_encoder(ENC14, cfg)
    logits, _ = enc.apply(params, state, jnp.asarray(x), cfg=cfg, train=False)
    ppg = np.asarray(enc.posteriors(logits))

    ref_logits = _tf_encoder_forward(ENC14, x)
    ref_ppg = np.exp(ref_logits) / np.exp(ref_logits).sum(-1, keepdims=True)

    logit_err = float(np.max(np.abs(np.asarray(logits) - ref_logits)))
    ppg_err = float(np.max(np.abs(ppg - ref_ppg)))
    print(f"composed golden parity: logits max-abs {logit_err:.2e}, "
          f"PPG max-abs {ppg_err:.2e} over {K} windows")
    assert logit_err < 5e-4, logit_err
    assert ppg_err < 1e-4, ppg_err
    # and the PPG is doing its job on real speech: confident, non-uniform
    assert ppg.max() > 0.9
