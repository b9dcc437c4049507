"""CMU ARCTIC reader: the decoder's target-speaker dataset.

Rebuild of ARCTIC_reader.py: walks cmu_arctic/cmu_us_<spk>_arctic/{wav,lab}
(:181-228), parses festival .lab end-time files into (start, end, phone)
sample segments (:236-248), 43-phone inventory (:51-57), and a window
sampler that pads short utterances with 'pau' frames (:277-364).
"""

from __future__ import annotations

import os

import numpy as np

from .audio_io import load_audio
from .dataset import SoundDataset

PHONEMES_43 = np.array([
    "b", "d", "g", "p", "t", "k",
    "jh", "ch",
    "s", "sh", "z", "zh", "f", "th", "v", "dh",
    "m", "n", "ng",
    "l", "r", "w", "y", "hh",
    "aa", "ae", "ah", "ao", "aw", "ax", "ay", "eh", "er", "ey",
    "ih", "iy", "ow", "oy", "uh", "uw",
    "H#", "pau", "ssil",
])


class ARCTIC(SoundDataset):
    def __init__(self, ds_path: str, feat_cfg, *, ds_norm=(0.0, 1.0),
                 wav_cache_name: str = "arctic_cache.pickle", **kw):
        super().__init__(ds_path, feat_cfg, ds_norm=ds_norm, **kw)
        self.make_phoneme_conversion_dicts()
        self.load_or_build(wav_cache_name)

    def make_phoneme_conversion_dicts(self):
        self.phn2idx = {p: i for i, p in enumerate(PHONEMES_43)}
        self.idx2phn = {i: p for i, p in enumerate(PHONEMES_43)}
        self.n_phn = len(PHONEMES_43)

    def read_dataset_from_disk(self):
        self.ds = {k: [] for k in ("wav", "spk_id", "phn_v", "sts_id")}
        n = 0
        for spk_dir in sorted(os.listdir(self.ds_path)):
            abs_spk = os.path.join(self.ds_path, spk_dir)
            if not os.path.isdir(abs_spk):
                continue
            parts = spk_dir.split("_")
            spk_id = parts[-2] if len(parts) >= 2 else spk_dir
            wav_dir = os.path.join(abs_spk, "wav")
            lab_dir = os.path.join(abs_spk, "lab")
            if not os.path.isdir(wav_dir):
                continue
            for wav_name in sorted(os.listdir(wav_dir)):
                if not wav_name.endswith(".wav"):
                    continue
                sts_id = wav_name.split("_")[-1].split(".")[0]
                self.ds["wav"].append(
                    load_audio(os.path.join(wav_dir, wav_name), self.feat_cfg.sample_rate))
                self.ds["phn_v"].append(
                    self._read_lab(os.path.join(lab_dir, wav_name.replace(".wav", ".lab"))))
                self.ds["spk_id"].append(spk_id)
                self.ds["sts_id"].append(sts_id)
                n += 1
        if self.verbose:
            print(f" - ARCTIC: read {n} utterances")
        self.finalize()

    def _read_lab(self, path: str):
        """festival .lab: 'end_time_s <num> phone' lines -> cumulative
        (start, end, phone) in samples (ARCTIC_reader.py:236-248)."""
        out = []
        last = 0
        sr = self.feat_cfg.sample_rate
        with open(path) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) == 3:
                    end = int(sr * float(parts[0]))
                    out.append((last, end, parts[2]))
                    last = end
        return out

    def window_sampler(self, batch_size=32, n_epochs=1, randomize_samples=True,
                       sample_trn=True, prop_val=0.3,
                       ds_filter_d={"spk_id": ["bdl", "rms", "slt", "clb"]},
                       yield_idxs=False, base_name="spec_cache.h5py"):
        """ARCTIC's own window sampler: seed-0 val split + 'pau'-padded short
        utterances (ARCTIC_reader.py:277-364)."""
        import h5py

        f = self.get_ds_filter(ds_filter_d)
        samples = self._val_split(np.flatnonzero(f), prop_val, sample_trn)
        T = self.n_timesteps
        with h5py.File(self.spec_cache_path(base_name), "r") as h5:
            batch = []
            for _ in range(n_epochs):
                order = self.rng.permutation(samples) if randomize_samples else samples
                for i in order:
                    key = str(int(i))
                    spec_len = h5["mfcc"][key].shape[0]
                    if spec_len <= T:
                        from .dataset import _pad_rows

                        mfcc = _pad_rows(h5["mfcc"][key][:], T)
                        phn = _pad_rows(h5["phn"][key][:], T)
                        phn[spec_len:, self.phn2idx["pau"]] = 1.0
                        i_s = 0
                    else:
                        i_s = int(self.rng.integers(0, spec_len - T))
                        mfcc = h5["mfcc"][key][i_s : i_s + T]
                        phn = h5["phn"][key][i_s : i_s + T]
                    batch.append((mfcc, phn, (i_s, i_s + T, int(i))))
                    if len(batch) == batch_size:
                        from .dataset import _stack_batch

                        yield _stack_batch(batch, yield_idxs)
                        batch = []
