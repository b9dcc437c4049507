"""Dataset base: declarative filtering, deterministic splits, feature cache,
window samplers.

Rebuild of the reference's `Sound_DS` (sound_ds.py:12-350) with the same
observable semantics — get_ds_filter with split_d per-key trn/val/tst splits
(:116-211), md5-keyed h5py feature caches (TIMIT_reader.py:92-111), the
seed-0 utterance-level val split and per-utterance random 400-frame crops of
spec_window_sampler (:262-350) — but with the sampling driven by explicit
numpy Generators (reproducible, no global-seed mutation) and the features
produced by our own DSP front-end instead of librosa.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Iterator

import numpy as np

from ..ops.features import FeatureConfig, mfcc_input, one_hot, phn_frame_targets

CACHE_KEY_FIELDS = (
    "sample_rate", "pre_emphasis", "hop_length", "win_length", "n_mels",
    "n_mfcc", "n_fft", "window", "mfcc_normaleze_first_mfcc",
    "mfcc_norm_factor", "calc_mfcc_derivate", "M_dB_norm_factor",
    "P_dB_norm_factor", "mean_abs_amp_norm", "clip_output",
)


def feature_cache_key(cfg: FeatureConfig, extra: tuple = ()) -> str:
    """md5 over the feature-relevant fields (TIMIT_reader.py:92-107 parity)."""
    vals = [str(getattr(cfg, f, None)) for f in CACHE_KEY_FIELDS]
    return hashlib.md5("_".join(list(map(str, extra)) + vals).encode()).hexdigest()


class SoundDataset:
    """Base for TIMIT / ARCTIC / TARGET_spk readers.

    Subclasses populate ``self.ds`` (dict of same-length numpy arrays, one
    row per utterance; 'wav' is an object array of float32 waves) via
    ``read_dataset_from_disk``, then call ``finalize()``.
    """

    def __init__(self, ds_path: str, feat_cfg: FeatureConfig, *,
                 cache_dir: str | None = None, ds_norm=(0.0, 1.0),
                 n_timesteps: int = 400, seed: int | None = None,
                 verbose: bool = False):
        self.ds_path = ds_path
        self.feat_cfg = feat_cfg
        self.cache_dir = cache_dir or ds_path
        self.ds_norm = tuple(ds_norm)
        self.n_timesteps = n_timesteps
        self.verbose = verbose
        self.rng = np.random.default_rng(seed)
        self.ds: dict[str, np.ndarray] = {}
        self.phn2idx: dict[str, int] = {}
        self.idx2phn: dict[int, str] = {}
        self.n_phn = 0

    # ------------------------------------------------------------ loading ---

    def read_dataset_from_disk(self) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    _OBJECT_COLS = ("wav", "phn_v", "txt_v", "wrd_v")

    def finalize(self):
        for k in self.ds:
            if k in self._OBJECT_COLS:
                col = np.empty(len(self.ds[k]), dtype=object)
                for i, v in enumerate(self.ds[k]):
                    col[i] = v
                self.ds[k] = col
            else:
                self.ds[k] = np.asarray(self.ds[k])
        self._normalize()

    def _normalize(self):
        """wav <- mult * (wav + add) (sound_ds.py:56-63)."""
        add, mult = self.ds_norm
        if (add, mult) != (0.0, 1.0):
            for i in range(len(self.ds["wav"])):
                self.ds["wav"][i] = mult * (self.ds["wav"][i] + add)

    def load_or_build(self, wav_cache_name: str):
        """Pickle wav cache like the reference (sound_ds.py:17-40)."""
        path = os.path.join(self.cache_dir, wav_cache_name)
        if os.path.exists(path):
            with open(path, "rb") as f:
                self.ds = pickle.load(f)
            self._normalize()
        else:
            self.read_dataset_from_disk()
            os.makedirs(self.cache_dir, exist_ok=True)
            with open(path, "wb") as f:
                pickle.dump(self.ds, f)
            self._normalize()

    # ----------------------------------------------------------- playback ---

    def play(self, wave, blocking: bool = False):
        """Audio playback (sound_ds.py:48-51); requires sounddevice."""
        from .viz import play

        play(wave, self.feat_cfg.sample_rate, blocking=blocking)

    def stop(self):
        from .viz import stop

        stop()

    def spec_show(self, spec, phn_v=None, **kw):
        """Spectrogram viewer with phone overlays (sound_ds.py:67-112)."""
        from .viz import spec_show

        spec_show(spec, phn_v=phn_v, idx2phn=self.idx2phn or None, **kw)

    # ---------------------------------------------------------- filtering ---

    def get_ds_filter(self, ds_filter_d: dict[str, Any] | None = None) -> np.ndarray:
        """Boolean utterance mask. Values may be scalars or lists (OR within a
        key, AND across keys); 'split_d' adds a deterministic per-key
        trn/val/tst split (sound_ds.py:116-211)."""
        n = len(self.ds["wav"])
        f = np.ones(n, dtype=bool)
        if not ds_filter_d:
            return f
        ds_filter_d = dict(ds_filter_d)
        split_d = ds_filter_d.pop("split_d", None)

        for key, val in ds_filter_d.items():
            if key not in self.ds:
                raise KeyError(f"ds filter field {key!r} not in dataset")
            if val is None:
                continue
            vals = val if isinstance(val, (list, tuple)) else [val]
            pf = np.zeros(n, dtype=bool)
            col = self.ds[key]
            for v in vals:
                pf |= col == v
            f &= pf

        if split_d is not None:
            split_key = split_d["split_key"]
            split_type = split_d["split_type"]
            p0, p1 = split_d["split_props_v"]
            if split_type not in ("trn", "val", "tst"):
                raise ValueError(f"bad split_type {split_type!r}")
            for k in np.unique(self.ds[split_key][f]):
                f_k = f & (self.ds[split_key] == k)
                idx = np.flatnonzero(f_k)
                n_trn = int(len(idx) * p0)
                n_val = int(len(idx) * p1)
                if split_type != "trn":
                    f[idx[:n_trn]] = False
                if split_type != "val":
                    f[idx[n_trn:n_val]] = False
                if split_type != "tst":
                    f[idx[n_val:]] = False
        return f

    def get_n_windows(self, prop_val: float = 0.3, ds_filter_d=None) -> tuple[int, int]:
        f = self.get_ds_filter(ds_filter_d)
        hop, T = self.feat_cfg.hop_length, self.n_timesteps
        n_windows = sum(w.shape[0] // (hop * T) for w in self.ds["wav"][f])
        n_trn = int((1 - prop_val) * n_windows)
        return n_trn, n_windows - n_trn

    # ------------------------------------------------------ feature cache ---

    @property
    def has_phones(self) -> bool:
        return "phn_v" in self.ds

    def spec_cache_path(self, base_name: str = "spec_cache.h5py") -> str:
        stem, ext = os.path.splitext(base_name)
        return os.path.join(self.cache_dir, f"{stem}_{feature_cache_key(self.feat_cfg)}{ext}")

    def build_spec_cache(self, base_name: str = "spec_cache.h5py", force: bool = False) -> str:
        """Per-utterance {mfcc, mel_dB, power_dB[, phn]} -> h5py, md5-keyed by
        the feature config (TIMIT_reader.py:144-210)."""
        import h5py

        path = self.spec_cache_path(base_name)
        if os.path.exists(path) and not force:
            return path
        os.makedirs(self.cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with h5py.File(tmp, "w") as h5:
            groups = {name: h5.create_group(name) for name in ("mfcc", "mel_dB", "power_dB")}
            if self.has_phones:
                groups["phn"] = h5.create_group("phn")
            for i in range(len(self.ds["wav"])):
                if self.verbose and i % 200 == 0:
                    print(f" - cached {i}/{len(self.ds['wav'])}")
                y = np.asarray(self.ds["wav"][i], np.float32)
                mfcc, mel_dB, power_dB = mfcc_input(y, self.feat_cfg, xp=np)
                groups["mfcc"].create_dataset(str(i), data=mfcc)
                groups["mel_dB"].create_dataset(str(i), data=mel_dB)
                groups["power_dB"].create_dataset(str(i), data=power_dB)
                if self.has_phones:
                    idx = phn_frame_targets(y.shape[0], self.ds["phn_v"][i], self.phn2idx,
                                            self.feat_cfg.hop_length, self.feat_cfg.win_length)
                    assert mfcc.shape[0] == idx.shape[0], (i, mfcc.shape, idx.shape)
                    groups["phn"].create_dataset(str(i), data=one_hot(idx, self.n_phn))
        os.replace(tmp, path)
        return path

    def build_packed_cache(self, base_name: str = "spec_cache.h5py") -> str:
        """Build (if needed) the .sclpack mirror of the h5py cache for the
        native loader (native/scl_data.cc); returns its path."""
        from .packed_cache import pack_from_h5

        h5_path = self.build_spec_cache(base_name)
        pack_path = h5_path.rsplit(".", 1)[0] + ".sclpack"
        if not os.path.exists(pack_path):
            streams = ("mfcc", "mel_dB", "power_dB", "phn") if self.has_phones \
                else ("mfcc", "mel_dB", "power_dB")
            pack_from_h5(h5_path, pack_path, streams=streams)
        return pack_path

    def packed_spec_window_sampler(self, batch_size: int = 32, n_epochs: int = 1,
                                   randomize_samples: bool = True,
                                   sample_trn: bool = True, prop_val: float = 0.3,
                                   ds_filter_d=None, n_threads: int = 4,
                                   base_name: str = "spec_cache.h5py"):
        """spec_window_sampler on the native loader: same filter/split
        semantics, batch assembly by the C++ thread pool."""
        from .packed_cache import PackedReader

        reader = PackedReader(self.build_packed_cache(base_name), n_threads=n_threads)
        f = self.get_ds_filter(ds_filter_d)
        samples = self._val_split(np.flatnonzero(f), prop_val, sample_trn)
        T = self.n_timesteps
        try:
            for _ in range(n_epochs):
                order = self.rng.permutation(samples) if randomize_samples else samples
                for i0 in range(0, len(order) - batch_size + 1, batch_size):
                    utts = order[i0 : i0 + batch_size].astype(np.int32)
                    lens = reader.n_frames[utts]
                    starts = np.asarray(
                        [self.rng.integers(0, max(l - T, 1)) for l in lens], np.int32)
                    yield tuple(reader.gather(utts, starts, T, s) for s in range(3))
        finally:
            reader.close()

    def get_spec(self, i_sample: int, base_name: str = "spec_cache.h5py"):
        """Random-access one utterance's cached features (sound_ds.py:225-247)."""
        import h5py

        out = {}
        with h5py.File(self.spec_cache_path(base_name), "r") as h5:
            for name in ("mfcc", "mel_dB", "power_dB", "phn"):
                if name in h5:
                    out[name] = h5[name][str(i_sample)][:]
        return out

    # ------------------------------------------------------------ splits ---

    @staticmethod
    def _val_split(samples: np.ndarray, prop_val: float, sample_trn: bool) -> np.ndarray:
        """Fixed seed-0 utterance split — SAME SEMANTICS as the reference
        (sound_ds.py:268-283: deterministic seed-0 permutation, last
        prop_val fraction is validation), but DIFFERENT MEMBERSHIP: this
        uses np.random.default_rng(0) where the reference used the legacy
        np.random.seed(0) global generator, so which utterances land in
        val differs. Eval numbers are therefore not comparable
        utterance-for-utterance with a reference run — only
        distributionally (deliberate re-design; legacy global seeding is
        process-wide state).

        When prop_val rounds to zero validation utterances (tiny corpora),
        train keeps everything and val is empty — the reference's
        ``idx_v[:-0]`` would silently empty the TRAIN set instead."""
        if prop_val <= 0.0:
            return samples
        rng = np.random.default_rng(0)
        idx = rng.permutation(len(samples))
        n_val = int(prop_val * len(samples))
        if n_val == 0:
            return samples if sample_trn else samples[:0]
        keep = idx[:-n_val] if sample_trn else idx[-n_val:]
        return samples[keep]

    # ----------------------------------------------------------- sampling ---

    def _crop(self, arr: np.ndarray, i_s: int) -> np.ndarray:
        return arr[i_s : i_s + self.n_timesteps]

    def spec_window_sampler(self, batch_size: int = 32, n_epochs: int = 1,
                            randomize_samples: bool = True, sample_trn: bool = True,
                            prop_val: float = 0.3, ds_filter_d=None,
                            yield_idxs: bool = False,
                            base_name: str = "spec_cache.h5py") -> Iterator:
        """Yields (mfcc, mel_dB, power_dB[, idxs]) float32 batches of
        [B, n_timesteps, .] windows: one random crop per utterance per epoch,
        zero-padding short utterances (sound_ds.py:262-350)."""
        import h5py

        f = self.get_ds_filter(ds_filter_d)
        samples = self._val_split(np.flatnonzero(f), prop_val, sample_trn)
        T = self.n_timesteps

        with h5py.File(self.spec_cache_path(base_name), "r") as h5:
            batch: list[tuple] = []
            for _ in range(n_epochs):
                order = self.rng.permutation(samples) if randomize_samples else samples
                for i in order:
                    key = str(int(i))
                    spec_len = h5["mfcc"][key].shape[0]
                    if spec_len <= T:
                        i_s = 0
                        rows = [_pad_rows(h5[n][key][:], T) for n in ("mfcc", "mel_dB", "power_dB")]
                    else:
                        i_s = int(self.rng.integers(0, spec_len - T))
                        rows = [h5[n][key][i_s : i_s + T] for n in ("mfcc", "mel_dB", "power_dB")]
                    batch.append((*rows, (i_s, i_s + T, int(i))))
                    if len(batch) == batch_size:
                        yield _stack_batch(batch, yield_idxs)
                        batch = []

    def window_sampler(self, batch_size: int = 32, n_epochs: int = 1,
                       randomize_samples: bool = True, ds_filter_d=None,
                       yield_idxs: bool = False, skip_short: bool = True,
                       pad_phn: str | None = None,
                       base_name: str = "spec_cache.h5py") -> Iterator:
        """Yields (mfcc, phn_onehot[, idxs]) training batches
        (TIMIT_reader.py:474-523; with pad_phn set, short utterances are
        padded and labeled pad_phn like ARCTIC_reader.py:317-335)."""
        import h5py

        f = self.get_ds_filter(ds_filter_d)
        samples = np.flatnonzero(f)
        T = self.n_timesteps

        with h5py.File(self.spec_cache_path(base_name), "r") as h5:
            batch: list[tuple] = []
            for _ in range(n_epochs):
                order = self.rng.permutation(samples) if randomize_samples else samples
                for i in order:
                    key = str(int(i))
                    spec_len = h5["mfcc"][key].shape[0]
                    if spec_len <= T:
                        if skip_short and pad_phn is None:
                            continue
                        mfcc = _pad_rows(h5["mfcc"][key][:], T)
                        phn = _pad_rows(h5["phn"][key][:], T)
                        if pad_phn is not None:
                            phn[spec_len:, self.phn2idx[pad_phn]] = 1.0
                        i_s = 0
                    else:
                        i_s = int(self.rng.integers(0, spec_len - T))
                        mfcc = h5["mfcc"][key][i_s : i_s + T]
                        phn = h5["phn"][key][i_s : i_s + T]
                    batch.append((mfcc, phn, (i_s, i_s + T, int(i))))
                    if len(batch) == batch_size:
                        yield _stack_batch(batch, yield_idxs)
                        batch = []

    def calc_class_weights(self, clip=(0, 10), ds_filter_d=None,
                           base_name: str = "spec_cache.h5py"):
        """Majority/count class weights (TIMIT_reader.py:528-551)."""
        import h5py

        f = self.get_ds_filter(ds_filter_d)
        counter = None
        with h5py.File(self.spec_cache_path(base_name), "r") as h5:
            for i in np.flatnonzero(f):
                s = np.sum(h5["phn"][str(int(i))], axis=0)
                counter = s if counter is None else counter + s
        n_samples = int(np.sum(counter))
        majority = float(np.mean(counter))
        cw = {c: (majority / cnt if cnt > 0 else 1.0) for c, cnt in enumerate(counter)}
        if clip is not None:
            cw = {k: float(np.clip(v, *clip)) for k, v in cw.items()}
        return cw, n_samples


def _pad_rows(a: np.ndarray, T: int) -> np.ndarray:
    pad = T - a.shape[0]
    if pad <= 0:
        return a[:T]
    return np.concatenate([a, np.zeros((pad, a.shape[1]), a.dtype)], axis=0)


def _stack_batch(batch: list[tuple], yield_idxs: bool):
    cols = list(zip(*batch))
    arrays = [np.stack(c).astype(np.float32) for c in cols[:-1]]
    if yield_idxs:
        arrays.append(np.asarray(cols[-1], dtype=np.int64))
    return tuple(arrays)
