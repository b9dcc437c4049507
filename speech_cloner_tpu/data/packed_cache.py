"""Packed feature cache (.sclpack) + native loader bindings.

A flat memory-mappable alternative to the h5py spec cache, served by the C++
runtime in native/scl_data.cc (mmap + thread-pool window gather + PCM
decode), bound via ctypes. Python fallbacks (numpy mmap) keep everything
working when the .so isn't built; `ensure_native()` builds it with make.

Layout (little-endian):
  'SCLPACK1' | u32 n_utts | u32 n_streams
  u32 dims[n_streams]          # columns per stream
  u32 n_frames[n_utts]         # rows per utterance (shared across streams)
  u64 offsets[n_utts]          # byte offset of each utterance's data block
  data: per utt, streams concatenated, float32 row-major
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

MAGIC = b"SCLPACK1"
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libscl_data.so")

_lib = None


def ensure_native(build: bool = True):
    """Load (building if needed) the native library; returns it or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.scl_open.restype = ctypes.c_void_p
    lib.scl_open.argtypes = [ctypes.c_char_p]
    lib.scl_close.argtypes = [ctypes.c_void_p]
    for f in (lib.scl_n_utts, lib.scl_n_streams):
        f.restype = ctypes.c_int
        f.argtypes = [ctypes.c_void_p]
    lib.scl_stream_dim.restype = ctypes.c_int
    lib.scl_stream_dim.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.scl_n_frames.restype = ctypes.c_int
    lib.scl_n_frames.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.scl_gather_batch.restype = ctypes.c_int
    lib.scl_gather_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.scl_decode_pcm.restype = ctypes.c_int64
    lib.scl_decode_pcm.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def native_decode_pcm(path: str):
    """Fast WAV/SPHERE decode via the native lib; returns (wave, sr) or None."""
    lib = ensure_native()
    if lib is None:
        return None
    sr = ctypes.c_int32(0)
    n = lib.scl_decode_pcm(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        return None
    out = np.empty(n, np.float32)
    got = lib.scl_decode_pcm(path.encode(), out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), n, ctypes.byref(sr))
    if got != n:
        return None
    return out, int(sr.value)


def write_pack(path: str, utts: list[dict[str, np.ndarray]], streams: list[str]):
    """Write per-utterance feature dicts (same rows per stream) to .sclpack."""
    n_utts = len(utts)
    dims = [int(utts[0][s].shape[1]) for s in streams]
    n_frames = [int(u[streams[0]].shape[0]) for u in utts]
    for u in utts:
        t = u[streams[0]].shape[0]
        for s in streams:
            assert u[s].shape[0] == t, "streams must share frame count"

    header = MAGIC + struct.pack("<II", n_utts, len(streams))
    header += struct.pack(f"<{len(streams)}I", *dims)
    header += struct.pack(f"<{n_utts}I", *n_frames)
    data_start = len(header) + 8 * n_utts
    offsets, cur = [], data_start
    for i in range(n_utts):
        offsets.append(cur)
        cur += n_frames[i] * sum(dims) * 4
    header += struct.pack(f"<{n_utts}Q", *offsets)

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        for u in utts:
            for s in streams:
                f.write(np.ascontiguousarray(u[s], dtype=np.float32).tobytes())
    os.replace(tmp, path)
    return path


def pack_from_h5(h5_path: str, out_path: str, streams=("mfcc", "mel_dB", "power_dB")):
    """Convert an h5py spec cache into .sclpack."""
    import h5py

    with h5py.File(h5_path, "r") as h5:
        streams = [s for s in streams if s in h5]
        n = len(h5[streams[0]])
        utts = [{s: h5[s][str(i)][:] for s in streams} for i in range(n)]
    return write_pack(out_path, utts, list(streams))


class PackedReader:
    """Window-crop reader over a .sclpack; native-threaded when available."""

    def __init__(self, path: str, n_threads: int = 4, use_native: bool = True):
        self.path = path
        self.n_threads = n_threads
        self._lib = ensure_native() if use_native else None
        self._h = None
        if self._lib is not None:
            self._h = self._lib.scl_open(path.encode())
            if not self._h:
                self._lib = None
        if self._lib is None:
            self._open_python()
        else:
            self.n_utts = self._lib.scl_n_utts(self._h)
            self.n_streams = self._lib.scl_n_streams(self._h)
            self.dims = [self._lib.scl_stream_dim(self._h, s)
                         for s in range(self.n_streams)]
            self.n_frames = np.asarray(
                [self._lib.scl_n_frames(self._h, i) for i in range(self.n_utts)])

    def _open_python(self):
        with open(self.path, "rb") as f:
            head = f.read(16)
            assert head[:8] == MAGIC, "bad sclpack magic"
            self.n_utts, self.n_streams = struct.unpack("<II", head[8:])
            self.dims = list(struct.unpack(f"<{self.n_streams}I",
                                           f.read(4 * self.n_streams)))
            self.n_frames = np.asarray(struct.unpack(f"<{self.n_utts}I",
                                                     f.read(4 * self.n_utts)))
            self.offsets = np.asarray(struct.unpack(f"<{self.n_utts}Q",
                                                    f.read(8 * self.n_utts)))
        self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")

    @property
    def native(self) -> bool:
        return self._lib is not None

    def gather(self, utts: np.ndarray, starts: np.ndarray, T: int, stream: int):
        """[B] utt ids + [B] start frames -> [B, T, dim] float32 windows
        (zero-padded past utterance end)."""
        B = len(utts)
        out = np.empty((B, T, self.dims[stream]), np.float32)
        if self._lib is not None:
            u = np.ascontiguousarray(utts, np.int32)
            s = np.ascontiguousarray(starts, np.int32)
            rc = self._lib.scl_gather_batch(
                self._h, u.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, T, stream,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self.n_threads)
            if rc != 0:
                raise RuntimeError(f"scl_gather_batch failed rc={rc}")
            return out
        # numpy fallback
        for b in range(B):
            i, s0 = int(utts[b]), int(starts[b])
            off = self.offsets[i]
            for st in range(stream):
                off += int(self.n_frames[i]) * self.dims[st] * 4
            arr = np.frombuffer(self._mm, np.float32,
                                count=int(self.n_frames[i]) * self.dims[stream],
                                offset=int(off)).reshape(-1, self.dims[stream])
            n_copy = max(0, min(T, arr.shape[0] - s0))
            out[b, :n_copy] = arr[s0 : s0 + n_copy]
            out[b, n_copy:] = 0.0
        return out

    def close(self):
        if self._lib is not None and self._h:
            self._lib.scl_close(self._h)
            self._h = None


def packed_window_sampler(reader: PackedReader, *, batch_size=32, n_timesteps=400,
                          streams=(0, 1, 2), samples=None, n_epochs=1,
                          rng=None, randomize=True):
    """spec_window_sampler equivalent over a PackedReader: one random crop per
    utterance per epoch, assembled by the native gather."""
    rng = rng or np.random.default_rng(0)
    samples = np.arange(reader.n_utts) if samples is None else np.asarray(samples)
    T = n_timesteps
    for _ in range(n_epochs):
        order = rng.permutation(samples) if randomize else samples
        for i0 in range(0, len(order) - batch_size + 1, batch_size):
            utts = order[i0 : i0 + batch_size]
            lens = reader.n_frames[utts]
            starts = np.asarray([rng.integers(0, max(l - T, 1)) for l in lens],
                                np.int32)
            yield tuple(reader.gather(utts, starts, T, s) for s in streams)
