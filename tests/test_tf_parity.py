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

def _tf_encoder_forward(ckpt, x, num_banks=6, num_highway=1):
    """Mirror of the reference encoder graph built from raw TF ops + keras GRU,
    with the shipped enc_14 weights (encoder.py:94-111, modules.py)."""
    r = tf.train.load_checkpoint(ckpt)
    g = lambda n: tf.constant(r.get_tensor(n))
    x = tf.constant(x)

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
    h = dense("encoder/prenet/dense1", x, tf.nn.relu)
    h = dense("encoder/prenet/dense2", h, tf.nn.relu)
    prenet_out = h

    # conv banks: K separate convs, concat, shared BN + relu
    outs = [tf.nn.conv1d(h, g("encoder/CBHG/conv1d_banks/conv1d/conv1d/kernel"),
                         stride=1, padding="SAME")]
    for k in range(2, num_banks + 1):
        outs.append(tf.nn.conv1d(
            h, g(f"encoder/CBHG/conv1d_banks/num_{k}/conv1d/conv1d/kernel"),
            stride=1, padding="SAME"))
    h = tf.concat(outs, axis=2)
    h = tf.nn.relu(bn("encoder/CBHG/conv1d_banks/bn", h))

    h = tf.nn.max_pool1d(h, ksize=2, strides=1, padding="SAME")
    h = tf.nn.conv1d(h, g("encoder/CBHG/conv1d_1/conv1d/kernel"), stride=1, padding="SAME")
    h = tf.nn.relu(bn("encoder/CBHG/conv1d_1", h))
    h = tf.nn.conv1d(h, g("encoder/CBHG/conv1d_2/conv1d/kernel"), stride=1, padding="SAME")
    h = bn("encoder/CBHG/conv1d_2", h)
    h = h + prenet_out

    for i in range(num_highway):
        H_ = dense(f"encoder/CBHG/highwaynet_{i}/dense1", h, tf.nn.relu)
        T_ = dense(f"encoder/CBHG/highwaynet_{i}/dense2", h, tf.nn.sigmoid)
        h = H_ * T_ + h * (1.0 - T_)

    # bidirectional GRU with TF1-layout weights
    units = r.get_tensor("encoder/CBHG/gru/bidirectional_rnn/fw/gru_cell/candidate/bias").shape[0]

    def gru_params(d):
        p = f"encoder/CBHG/gru/bidirectional_rnn/{d}/gru_cell"
        return {
            "gates_kernel": r.get_tensor(f"{p}/gates/kernel"),
            "gates_bias": r.get_tensor(f"{p}/gates/bias"),
            "candidate_kernel": r.get_tensor(f"{p}/candidate/kernel"),
            "candidate_bias": r.get_tensor(f"{p}/candidate/bias"),
        }

    fw = _keras_gru_from_tf1(gru_params("fw"), units)(h).numpy()
    bw = _keras_gru_from_tf1(gru_params("bw"), units)(h.numpy()[:, ::-1]).numpy()[:, ::-1]
    h = tf.constant(np.concatenate([fw, bw], axis=2))

    return dense("encoder/y_logits", h).numpy()


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
