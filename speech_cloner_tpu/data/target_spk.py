"""Arbitrary-target-speaker corpus: a directory of mp3/audio files
(audiobook-style), no phone labels.

Rebuild of TARGET_spk_reader.py: exclude-list file filtering (:92-99),
ffmpeg decode at the target rate (:108), total-duration report (:123-126),
spec cache without phones (:132-182), and the sequential (non-seeded)
head/tail trn/val split whose sampler draws ``batch_size`` windows from one
file per batch (:187-246).
"""

from __future__ import annotations

import os

import numpy as np

from .audio_io import load_audio
from .dataset import SoundDataset, _stack_batch


class TargetSpeaker(SoundDataset):
    def __init__(self, ds_path: str, feat_cfg, *, ds_norm=(0.0, 1.0),
                 exclude_files_with=(), extensions=(".mp3", ".wav", ".ogg", ".flac"),
                 wav_cache_name: str = "target_cache.pickle", **kw):
        super().__init__(ds_path, feat_cfg, ds_norm=ds_norm, **kw)
        self.exclude_files_with = tuple(exclude_files_with)
        self.extensions = tuple(extensions)
        self.load_or_build(wav_cache_name)

    def read_dataset_from_disk(self):
        self.ds = {"wav": [], "name": [], "len": []}
        for name in sorted(os.listdir(self.ds_path)):
            if not name.lower().endswith(self.extensions):
                continue
            if any(excl in name for excl in self.exclude_files_with):
                if self.verbose:
                    print(f" excluded: {name}")
                continue
            y = load_audio(os.path.join(self.ds_path, name), self.feat_cfg.sample_rate)
            self.ds["wav"].append(y)
            self.ds["name"].append(name)
            self.ds["len"].append(y.shape[0] / self.feat_cfg.sample_rate)
        if self.verbose:
            total = int(sum(self.ds["len"]))
            print(f" - TargetSpeaker: {len(self.ds['wav'])} files, "
                  f"{total // 3600:02d}:{total % 3600 // 60:02d}:{total % 60:02d} total")
        self.finalize()

    def spec_window_sampler(self, batch_size=32, n_epochs=1, randomize_samples=True,
                            sample_trn=True, prop_val=0.3, ds_filter_d=None,
                            yield_idxs=False, base_name="spec_cache.h5py"):
        """Sequential head/tail split by file order, then ``batch_size``
        random crops from ONE file per batch (TARGET_spk_reader.py:187-246)."""
        import h5py

        n = len(self.ds["wav"])
        if sample_trn:
            samples = np.arange(0, int((1 - prop_val) * n))
        else:
            samples = np.arange(int((1 - prop_val) * n), n)
        T = self.n_timesteps

        with h5py.File(self.spec_cache_path(base_name), "r") as h5:
            for _ in range(n_epochs):
                order = self.rng.permutation(samples) if randomize_samples else samples
                for i in order:
                    key = str(int(i))
                    spec_len = h5["mfcc"][key].shape[0]
                    if spec_len <= T:
                        continue
                    batch = []
                    for _ in range(batch_size):
                        i_s = int(self.rng.integers(0, spec_len - T))
                        rows = [h5[nm][key][i_s : i_s + T]
                                for nm in ("mfcc", "mel_dB", "power_dB")]
                        batch.append((*rows, (i_s, i_s + T, int(i))))
                    yield _stack_batch(batch, yield_idxs)
