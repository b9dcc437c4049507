"""Build a real-voice TARGET_spk training corpus from one long recording.

The reference's TEST 4 uses the 60 s real narration clip
(`slt_test_chptr16/16 The Magic Art of the Great Humbug_true.mp3`) only as
*conversion input* (test.py:416-502); its target decoder was trained on a
separate multi-hour corpus ingested by TARGET_spk_reader.py:108-246 (a
directory of mp3s). The container ships no such corpus — the narration clip
is the only real speech in the image — so this tool turns THAT clip into a
TARGET_spk corpus: energy-snapped chunks written as wav files, optionally
speed-perturbed (resample_poly; the standard 0.9/1.0/1.1 3-way augmentation),
with the last chunks reserved unperturbed in a separate held-out directory so
decoder evaluation never sees training audio at any speed.

Optionally the same chunks are injected as one extra speaker into a
TIMIT-layout tree (TRAIN/DR1/<SPK>/utt.{WAV,PHN,TXT,WRD}) so the speaker-ID
verifier can learn the narrator as a class. The .PHN/.WRD/.TXT sidecars are
single-span placeholders (`h#` over the whole file): the verifier consumes
only power_dB windows + speaker labels (voice_identification.py:180), never
phone targets — training an *encoder* against these labels would be
meaningless, and the tool says so in the tree it writes.

  python -m speech_cloner_tpu.apps.make_narrator_corpus \
      --out-dir ./_real [--clip <audio>] [--timit-dir ./_synth5/timit]
"""

from __future__ import annotations

import argparse
import glob
import os
from fractions import Fraction

import numpy as np

DEFAULT_CLIP = ("/root/reference/slt_test_chptr16/"
                "16 The Magic Art of the Great Humbug_true.mp3")


def energy_snapped_bounds(y: np.ndarray, sr: int, chunk_s: float,
                          snap_s: float) -> list[int]:
    """Chunk boundaries every ~chunk_s, each snapped to the lowest-RMS
    25 ms frame within +/- snap_s — cutting in pauses, not mid-word."""
    win = int(0.025 * sr)
    hop = int(0.005 * sr)
    frames = np.lib.stride_tricks.sliding_window_view(y, win)[::hop]
    rms = np.sqrt(np.mean(frames**2, axis=1))
    bounds = [0]
    t = chunk_s * sr
    while t < len(y) - 0.5 * chunk_s * sr:
        lo = max(int((t - snap_s * sr) / hop), 0)
        hi = min(int((t + snap_s * sr) / hop), len(rms) - 1)
        i_min = lo + int(np.argmin(rms[lo:hi + 1]))
        bounds.append(i_min * hop + win // 2)
        t = bounds[-1] + chunk_s * sr
    bounds.append(len(y))
    return bounds


def speed_perturb(y: np.ndarray, factor: float) -> np.ndarray:
    """Speed change by `factor` (>1 = faster) via polyphase resampling —
    pitch and duration move together (Kaldi-style speed perturbation)."""
    if abs(factor - 1.0) < 1e-9:
        return y
    fr = Fraction(factor).limit_denominator(100)
    from scipy.signal import resample_poly

    return resample_poly(y, fr.denominator, fr.numerator).astype(np.float32)


def _clear_stale_caches(root: str):
    """A TIMIT tree gaining a speaker invalidates every derived cache."""
    for pat in ("timit_cache.pickle", "phn_mfcc_cache_*.h5py",
                "phn_mfcc_cache_*.sclpack", "spec_cache_*.h5py",
                "spec_cache_*.sclpack"):
        for p in glob.glob(os.path.join(root, pat)):
            os.remove(p)
            print(f" removed stale cache {p}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clip", default=DEFAULT_CLIP)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--chunk-s", type=float, default=6.0)
    ap.add_argument("--snap-s", type=float, default=0.75)
    ap.add_argument("--speeds", default="0.9,1.0,1.1",
                    help="comma list of speed factors for the training "
                         "chunks ('1.0' = no augmentation)")
    ap.add_argument("--heldout", type=int, default=2,
                    help="final chunks reserved unperturbed in "
                         "<out>/heldout/, excluded from <out>/target/")
    ap.add_argument("--sample-rate", type=int, default=16000)
    ap.add_argument("--timit-dir",
                    help="existing TIMIT-layout root to inject the narrator "
                         "into as speaker --timit-spk (for the verifier)")
    ap.add_argument("--timit-spk", default="FNARR0")
    args = ap.parse_args(argv)

    from ..data.audio_io import load_audio, write_riff_wav

    sr = args.sample_rate
    y = load_audio(args.clip, sr)
    print(f" clip: {args.clip!r}  {len(y) / sr:.1f}s @ {sr} Hz")
    bounds = energy_snapped_bounds(y, sr, args.chunk_s, args.snap_s)
    chunks = [y[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
    # a window sampler needs > n_timesteps (2 s) of frames per file
    chunks = [c for c in chunks if len(c) > 2.5 * sr]
    n_held = min(args.heldout, max(len(chunks) - 2, 0))
    train_chunks = chunks[: len(chunks) - n_held]
    held_chunks = chunks[len(chunks) - n_held:]
    speeds = [float(s) for s in args.speeds.split(",")]

    tgt_dir = os.path.join(args.out_dir, "target")
    held_dir = os.path.join(args.out_dir, "heldout")
    os.makedirs(tgt_dir, exist_ok=True)
    os.makedirs(held_dir, exist_ok=True)
    n_files, total_s = 0, 0.0
    for i, c in enumerate(train_chunks):
        for s in speeds:
            w = speed_perturb(c, s)
            write_riff_wav(os.path.join(
                tgt_dir, f"c{i:02d}_s{int(round(s * 100)):03d}.wav"), w, sr)
            n_files += 1
            total_s += len(w) / sr
    for j, c in enumerate(held_chunks):
        write_riff_wav(os.path.join(
            held_dir, f"held{j:02d}.wav"), c, sr)
    print(f" target corpus: {n_files} files, {total_s:.1f}s "
          f"({len(train_chunks)} chunks x speeds {speeds})")
    print(f" held out: {n_held} unperturbed chunks -> {held_dir}")

    if args.timit_dir:
        spk_dir = os.path.join(args.timit_dir, "TRAIN", "DR1", args.timit_spk)
        os.makedirs(spk_dir, exist_ok=True)
        utts = [(f"c{i:02d}s{int(round(s * 100)):03d}", speed_perturb(c, s))
                for i, c in enumerate(train_chunks) for s in speeds]
        utts += [(f"h{j:02d}s100", c) for j, c in enumerate(held_chunks)]
        for stem, w in utts:
            base = os.path.join(spk_dir, stem)
            write_riff_wav(base + ".WAV", w, sr)
            span = f"0 {len(w)} h#\n"
            for ext in (".PHN", ".WRD"):
                with open(base + ext, "w") as f:
                    f.write(span)
            with open(base + ".TXT", "w") as f:
                f.write(f"0 {len(w)} [real narration chunk; placeholder "
                        f"phone labels -- speaker-ID use only]\n")
        _clear_stale_caches(args.timit_dir)
        print(f" injected {len(utts)} utterances as {args.timit_spk} "
              f"under {spk_dir}")


if __name__ == "__main__":
    main()
