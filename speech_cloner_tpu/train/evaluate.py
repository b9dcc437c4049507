"""Streaming evaluators (reference: encoder.eval_acc encoder.py:374-388,
decoder.eval_loss decoder.py:474-493, batched predict encoder.py:359-367)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec_m
from ..models import encoder as enc_m
from .steps import DecoderLossConfig


def encoder_predict(params, state, x, *, cfg, batch_size: int = 32):
    """Batched PPG prediction over [N, T, E] host windows -> [N, T, n_out]."""
    fn = jax.jit(lambda xx: enc_m.posteriors(
        enc_m.apply(params, state, xx, cfg=cfg, train=False)[0]))
    outs = []
    for i in range(0, x.shape[0], batch_size):
        outs.append(np.asarray(fn(jnp.asarray(x[i : i + batch_size]))))
    return np.concatenate(outs, axis=0)


def decoder_predict(dec_params, dec_state, x, *, enc_params, enc_state,
                    enc_cfg, dec_cfg, batch_size: int = 32):
    """Batched decoder prediction over [N, T, E] MFCC windows; returns
    (y_mel, y_stft, y_phn) like the reference's decoder.predict namedtuple
    (decoder.py:447-465; y_phn is the PPG fed to step1)."""

    @jax.jit
    def fn(xx):
        logits, _ = enc_m.apply(enc_params, enc_state, xx, cfg=enc_cfg, train=False)
        ppg = enc_m.posteriors(logits)
        y_mel, y_stft, _ = dec_m.apply(dec_params, dec_state, ppg, cfg=dec_cfg,
                                       train=False)
        return y_mel, y_stft, ppg

    mels, stfts, phns = [], [], []
    for i in range(0, x.shape[0], batch_size):
        m, s, p = fn(jnp.asarray(x[i : i + batch_size]))
        mels.append(np.asarray(m))
        stfts.append(np.asarray(s))
        phns.append(np.asarray(p))
    return (np.concatenate(mels), np.concatenate(stfts), np.concatenate(phns))


def eval_acc(params, state, sampler, *, cfg, verbose: bool = False):
    """Streaming frame accuracy over a (mfcc, phn_onehot) batch iterator."""
    fn = jax.jit(lambda xx: jnp.argmax(
        enc_m.apply(params, state, xx, cfg=cfg, train=False)[0], axis=-1))
    n_c = n_t = 0
    for mfcc, phn, *_ in sampler:
        pred = np.asarray(fn(jnp.asarray(mfcc)))
        true = np.argmax(phn, axis=-1)
        n_c += int((pred == true).sum())
        n_t += pred.size
        if verbose:
            print(f"acc[{n_t}] = {n_c / n_t:5.03f}")
    return (n_c / n_t if n_t else 0.0), n_t


def eval_loss(dec_params, dec_state, sampler, *, enc_params, enc_state,
              enc_cfg, dec_cfg, loss_cfg: DecoderLossConfig = DecoderLossConfig(),
              verbose: bool = False):
    """Streaming decoder losses over (mfcc, mel, stft) batches; returns
    (mean loss, mean mel_loss, mean stft_loss, mean mcd_db).

    mcd_db is the mel-cepstral distortion of the predicted mel vs truth
    (train/metrics.mel_cepstral_distortion) — the objective spectral-quality
    number the reference lacked (its only proxy was the weighted MSE,
    decoder.py:474-493)."""
    from .metrics import mel_cepstral_distortion

    @jax.jit
    def fn(mfcc, mel, stft):
        logits, _ = enc_m.apply(enc_params, enc_state, mfcc, cfg=enc_cfg, train=False)
        ppg = enc_m.posteriors(logits)
        y_mel, y_stft, _ = dec_m.apply(dec_params, dec_state, ppg, cfg=dec_cfg, train=False)
        mel_l = loss_cfg.mel_loss_weight * jnp.mean(jnp.square(y_mel - mel))
        stft_l = loss_cfg.stft_loss_weight * jnp.mean(jnp.square(y_stft - stft))
        if loss_cfg.loss_type == "log":
            loss = jnp.log(mel_l) + jnp.log(stft_l)
        else:
            loss = mel_l + stft_l
        return loss, mel_l, stft_l, mel_cepstral_distortion(mel, y_mel)

    acc = []
    for mfcc, mel, stft, *_ in sampler:
        out = fn(jnp.asarray(mfcc), jnp.asarray(mel), jnp.asarray(stft))
        acc.append([float(v) for v in out])
        if verbose:
            m = np.mean(acc, axis=0)
            print(f" - loss={m[0]:.3f} mel={m[1]:.3f} stft={m[2]:.3f} "
                  f"mcd={m[3]:.2f}dB")
    m = np.mean(acc, axis=0) if acc else np.zeros(4)
    return float(m[0]), float(m[1]), float(m[2]), float(m[3])


_CONFUSION_FNS: dict = {}


def eval_confusion(params, state, sampler, *, cfg, max_batches: int | None = None):
    """Streaming [n_out, n_out] confusion counts (rows=true, cols=pred) over a
    (mfcc, phn_onehot) batch iterator — the reference rendered this as a
    TensorBoard image (encoder.py:152-158); we accumulate the raw counts.

    The jitted kernel is cached per config (params/state are traced args) so
    repeated calls at save cadence don't recompile."""
    from .metrics import confusion_matrix

    fn = _CONFUSION_FNS.get(cfg)
    if fn is None:
        fn = jax.jit(lambda p, s, xx, yy: confusion_matrix(
            enc_m.apply(p, s, xx, cfg=cfg, train=False)[0], yy, cfg.n_output))
        _CONFUSION_FNS[cfg] = fn
    cm = np.zeros((cfg.n_output, cfg.n_output), np.float64)
    for b, (mfcc, phn, *_) in enumerate(sampler):
        cm += np.asarray(fn(params, state, jnp.asarray(mfcc), jnp.asarray(phn)))
        if max_batches is not None and b + 1 >= max_batches:
            break
    return cm


def top_confusions(cm: np.ndarray, idx2name: dict[int, str] | None = None,
                   k: int = 10):
    """Most-confused off-diagonal (true, pred) pairs with rates, from a
    confusion-count matrix. Returns [(true, pred, count, rate_of_true), ...]."""
    cm = np.asarray(cm, np.float64)
    off = cm.copy()
    np.fill_diagonal(off, 0.0)
    row_tot = cm.sum(axis=1)
    flat = np.argsort(off, axis=None)[::-1][:k]
    out = []
    for f in flat:
        i, j = divmod(int(f), cm.shape[1])
        if off[i, j] <= 0:
            break
        name_i = idx2name[i] if idx2name else str(i)
        name_j = idx2name[j] if idx2name else str(j)
        out.append((name_i, name_j, int(off[i, j]),
                    float(off[i, j] / max(row_tot[i], 1.0))))
    return out
