"""Conversion verification: did the clone actually change speaker identity?

Rebuild of the reference's implicit verification loop
(voice_identification.py:202-223 trains the speaker CNN; SURVEY.md §0.5 uses
it "to sanity-check that conversion changes speaker identity") — but closed:
this module feeds the *true* and *converted* power_dB windows through a
trained speaker-ID checkpoint and reports the per-class posterior shift, so
`convert --verify` / train_full stage 4 emit an objective verdict instead of
a human A/B listen.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..models import speaker_id as spk_m
from ..ops import mfcc_input
from ..runtime.checkpoint import Checkpointer


_MODEL_CACHE: dict = {}  # abspath -> (latest_step, loaded model); newest only
_APPLY_CACHE: dict = {}  # cfg -> jitted forward


def load_speaker_model(model_path: str):
    """Restore (params, state, cfg, spk_id_v) from a train_speaker_id dir.

    The speaker-class mapping is read from the config sidecar the trainer
    snapshots next to the weights (speaker_id_cfg_d.json). Cached by path,
    keeping only the NEWEST step per model dir: a verification server calls
    this per request, re-reading the npz every time is pure waste, and
    keeping superseded steps alive would leak a full param tree per saved
    checkpoint while training continues.
    """
    ck = Checkpointer(model_path, "speaker_id")
    path_key = os.path.abspath(model_path)
    step_now = ck.latest_step()
    hit = _MODEL_CACHE.get(path_key)
    if hit is not None and hit[0] == step_now:
        return hit[1]
    tree, step = ck.restore()
    if tree is None:
        raise FileNotFoundError(f"no speaker_id checkpoint under {model_path}")
    cfg_path = os.path.join(model_path, "speaker_id_cfg_d.json")
    with open(cfg_path) as f:
        cfg_d = json.load(f)
    cfg = spk_m.SpeakerIdConfig(
        n_timesteps=int(cfg_d["n_timesteps"]),
        n_features=int(cfg_d["n_features"]),
        n_output=int(cfg_d["n_output"]),
        time_fold=int(cfg_d.get("time_fold", 1)))
    spk_id_v = list(cfg_d["spk_id_v"])
    out = (tree["params"], tree["model_state"], cfg, spk_id_v)
    _MODEL_CACHE[path_key] = (step_now, out)  # evicts the superseded step
    return out


def power_windows(wav: np.ndarray, feat_cfg, n_timesteps: int) -> np.ndarray:
    """Waveform -> [K, T, n_stft] power_dB windows (the CNN's input space,
    voice_identification.py:180)."""
    _, _, power = mfcc_input(np.asarray(wav, np.float32), feat_cfg, xp=np)
    T = n_timesteps
    if power.shape[0] < T:
        power = np.pad(power, ((0, T - power.shape[0]), (0, 0)))
    K = max(power.shape[0] // T, 1)
    return power[: K * T].reshape(K, T, power.shape[1])


def mean_posterior(params, state, cfg, windows: np.ndarray) -> np.ndarray:
    """Mean softmax posterior over all windows -> [n_spk]."""
    fn = _APPLY_CACHE.get(cfg)
    if fn is None:
        # one jit object per cfg — a fresh jax.jit(lambda) per call could
        # never hit the trace cache, recompiling per request on a server
        fn = jax.jit(lambda p, s, x, cfg=cfg: spk_m.apply(p, s, x, cfg=cfg,
                                                          train=False))
        _APPLY_CACHE[cfg] = fn
    logits, _ = fn(params, state, windows)
    probs = jax.nn.softmax(np.asarray(logits, np.float32), axis=-1)
    return np.asarray(probs.mean(axis=0))


def verify_conversion(wav_true, wav_pred,
                      spk_model_path: str, feat_cfg,
                      target_spk_id: str | None = None, top_k: int = 3,
                      wav_control=None) -> dict:
    """Classify source vs converted audio; report the posterior shift.

    ``wav_true``/``wav_pred`` may be single waveforms or lists of waveforms —
    with a list, the posterior is averaged over the windows of ALL utterances
    (short utterances yield a single 400-frame window each, so a one-clip
    verdict rests on one CNN forward; averaging over several clips is the
    statistically honest version of voice_identification.py:202-223).

    ``wav_control`` (optional) is SELF-RECONSTRUCTED target-speaker audio —
    a true target utterance passed through the same decoder+vocoder. A
    classifier trained only on clean audio shifts ALL resynthesized audio
    the same way (Griffin-Lim phase + decoder coloration), so the honest
    question is not "does the conversion classify as the raw target?" but
    "does it classify like a reconstruction of the target does?". The
    reference had no such control (it eyeballed voice_identification.py
    outputs); this closes that gap.

    Returns a JSON-friendly report:
      true_top / pred_top: [(spk_id, p), ...] highest mean posteriors,
      identity_changed: argmax class moved,
      n_windows_true / n_windows_pred: how many windows the verdict averages,
      target_p_true / target_p_pred: posterior mass on ``target_spk_id``
        before/after conversion (when given),
      target_hit: converted audio classifies as the target,
      control_top: posterior of the reconstruction control,
      control_match: converted argmax == control argmax,
      cos_pred_control / cos_pred_true: cosine similarity of the converted
        posterior to the control's vs to the source's.
    """
    params, state, cfg, spk_id_v = load_speaker_model(spk_model_path)

    def windows_multi(wavs):
        if isinstance(wavs, np.ndarray) and wavs.ndim == 1:
            wavs = [wavs]
        return np.concatenate(
            [power_windows(w, feat_cfg, cfg.n_timesteps) for w in wavs], axis=0)

    win_true = windows_multi(wav_true)
    win_pred = windows_multi(wav_pred)
    post_true = mean_posterior(params, state, cfg, win_true)
    post_pred = mean_posterior(params, state, cfg, win_pred)

    def top(post):
        idx = np.argsort(post)[::-1][:top_k]
        return [(spk_id_v[i], float(post[i])) for i in idx]

    report = {
        "true_top": top(post_true),
        "pred_top": top(post_pred),
        "identity_changed": bool(int(post_true.argmax()) != int(post_pred.argmax())),
        "n_windows_true": int(win_true.shape[0]),
        "n_windows_pred": int(win_pred.shape[0]),
    }
    if wav_control is not None:
        post_ctl = mean_posterior(params, state, cfg, windows_multi(wav_control))

        def cos(a, b):
            return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

        report["control_top"] = top(post_ctl)
        report["control_match"] = bool(int(post_pred.argmax()) == int(post_ctl.argmax()))
        report["cos_pred_control"] = cos(post_pred, post_ctl)
        report["cos_pred_true"] = cos(post_pred, post_true)
    if target_spk_id is not None:
        if target_spk_id in spk_id_v:
            ti = spk_id_v.index(target_spk_id)
            report["target_spk_id"] = target_spk_id
            report["target_p_true"] = float(post_true[ti])
            report["target_p_pred"] = float(post_pred[ti])
            report["target_hit"] = bool(int(post_pred.argmax()) == ti)
        else:
            report["target_spk_id"] = target_spk_id
            report["target_warning"] = "target speaker not in classifier classes"
    return report


def format_report(report: dict) -> str:
    lines = [" speaker-ID verification:"]
    lines.append("   source audio classifies as: "
                 + ", ".join(f"{s}={p:.3f}" for s, p in report["true_top"]))
    lines.append("   converted audio classifies as: "
                 + ", ".join(f"{s}={p:.3f}" for s, p in report["pred_top"]))
    lines.append(f"   identity changed: {report['identity_changed']}")
    if "control_top" in report:
        lines.append("   reconstruction control classifies as: "
                     + ", ".join(f"{s}={p:.3f}" for s, p in report["control_top"]))
        lines.append(f"   converted matches control: {report['control_match']} "
                     f"(cos to control {report['cos_pred_control']:.3f} vs "
                     f"cos to source {report['cos_pred_true']:.3f})")
    if "target_p_pred" in report:
        lines.append(f"   posterior on target '{report['target_spk_id']}': "
                     f"{report['target_p_true']:.3f} -> {report['target_p_pred']:.3f}"
                     f" (target_hit={report['target_hit']})")
    return "\n".join(lines)
