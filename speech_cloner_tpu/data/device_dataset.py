"""Device-resident feature store + on-device window gather.

The streaming samplers ship full feature windows host->device every step
(batch 32x400x361 f32 ~ 18 MB/step for the decoder); on a
bandwidth-constrained link that, not compute, bounds training. This module
uploads the (filtered) feature cache to HBM ONCE as padded [N, F_max, C]
arrays and crops the random training windows on device with a vmapped
dynamic_slice, so the per-step transfer is two int32 vectors.

Feasibility: the reference-scale corpora easily fit (TIMIT train features
~0.3 GB, one ARCTIC speaker ~0.3 GB, v5e HBM 16 GB). Falls back to the
native .sclpack loader when the corpus does not fit (data/packed_cache.py).

Sampling semantics mirror the streaming samplers: one random T-frame crop
per utterance per epoch, fixed seed-0 val split upstream via the caller's
sample index set, zero padding past utterance end (short utterances start
at 0, matching _pad_rows / scl_gather_batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gather_windows(streams, utt_idx, start, T: int):
    """Crop [B, T, C] windows out of padded [N, F_max, C] device arrays.

    Pass ``streams`` as explicit jit arguments (not closures): closed-over
    arrays embed as trace-time constants, which is exactly the giant-upload
    this module exists to avoid.
    """
    def one(stream):
        def slice_one(i, s):
            return jax.lax.dynamic_slice(stream[i], (s, 0), (T, stream.shape[2]))
        return jax.vmap(slice_one)(utt_idx, start)

    return tuple(one(s) for s in streams)


class DeviceWindows:
    """Padded per-stream device arrays + a jit-friendly window gather."""

    def __init__(self, utts_per_stream: list[list[np.ndarray]], T: int,
                 sharding=None):
        """utts_per_stream: for each stream, a list of [frames_i, C] arrays
        (same frames_i across streams for a given utterance)."""
        lens = np.asarray([a.shape[0] for a in utts_per_stream[0]], np.int32)
        F_max = max(int(lens.max()), T)
        self.T = T
        self.n_frames = lens
        self.streams = []
        for utts in utts_per_stream:
            buf = np.zeros((len(utts), F_max, utts[0].shape[1]), np.float32)
            for i, a in enumerate(utts):
                buf[i, : a.shape[0]] = a
            arr = jnp.asarray(buf)
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            self.streams.append(arr)

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(s.shape)) * 4 for s in self.streams)

    def gather(self, utt_idx, start):
        """[B] utterance ids + [B] start frames -> tuple of [B, T, C] windows,
        traced on device (one dynamic_slice per stream per sample)."""
        return gather_windows(self.streams, utt_idx, start, self.T)

    def index_sampler(self, samples: np.ndarray, batch_size: int,
                      n_epochs: int = 1, rng=None, randomize: bool = True):
        """Host-side index stream: yields (utt_idx [B], start [B]) int32 —
        the only per-step host->device traffic. ``samples`` index into the
        utterance axis of the device arrays."""
        rng = rng or np.random.default_rng(0)
        samples = np.asarray(samples)
        for _ in range(n_epochs):
            order = rng.permutation(samples) if randomize else samples
            for i0 in range(0, len(order) - batch_size + 1, batch_size):
                utts = order[i0 : i0 + batch_size].astype(np.int32)
                lens = self.n_frames[utts]
                starts = np.asarray(
                    [rng.integers(0, max(l - self.T, 1)) for l in lens], np.int32)
                yield utts, starts

    def file_batch_sampler(self, samples: np.ndarray, batch_size: int,
                           n_epochs: int = 1, rng=None, randomize: bool = True):
        """TARGET_spk sampling semantics: each batch is ``batch_size`` random
        crops from ONE utterance, files visited in (permuted) order, files
        shorter than one window skipped (TARGET_spk_reader.py:187-246 /
        data/target_spk.spec_window_sampler) — the device-loader analog of
        that host sampler. An audiobook-style corpus has few long files, so
        per-utterance batching (index_sampler) would starve at
        n_files < batch_size where this never does."""
        rng = rng or np.random.default_rng(0)
        samples = np.asarray(samples)
        for _ in range(n_epochs):
            order = rng.permutation(samples) if randomize else samples
            for i in order:
                n = int(self.n_frames[int(i)])
                if n <= self.T:
                    continue
                utts = np.full(batch_size, int(i), np.int32)
                starts = rng.integers(0, n - self.T,
                                      size=batch_size).astype(np.int32)
                yield utts, starts


def from_h5(h5_path: str, streams, utt_ids: np.ndarray, T: int,
            sharding=None) -> DeviceWindows:
    """Load selected utterances of an h5py spec cache into device memory."""
    import h5py

    cols = [[] for _ in streams]
    with h5py.File(h5_path, "r") as h5:
        for i in utt_ids:
            for j, s in enumerate(streams):
                cols[j].append(h5[s][str(int(i))][:])
    return DeviceWindows(cols, T, sharding=sharding)
