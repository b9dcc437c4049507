"""Host-side audio ingest: RIFF WAV, NIST SPHERE (TIMIT), and ffmpeg-decoded
compressed audio (mp3/ogg), all -> float32 mono at a target sample rate.

The reference leaned on librosa/audioread/ffmpeg for decode
(TIMIT_reader.py:308, TARGET_spk_reader.py:108); decode is the only part of
the data path that stays on host here (SURVEY.md §2.2). librosa.load
conventions are preserved: int PCM scaled to [-1, 1), mono by channel mean,
polyphase resampling.
"""

from __future__ import annotations

import io
import os
import shutil
import struct
import subprocess
import wave

import numpy as np


def _resample(y: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return y
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr, target_sr)
    return resample_poly(y, target_sr // g, sr // g).astype(np.float32)


def _pcm_to_float(data: bytes, sampwidth: int, n_channels: int, big_endian=False) -> np.ndarray:
    if sampwidth == 2:
        dt = ">i2" if big_endian else "<i2"
        y = np.frombuffer(data, dtype=dt).astype(np.float32) / 32768.0
    elif sampwidth == 1:
        y = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 4:
        dt = ">i4" if big_endian else "<i4"
        y = np.frombuffer(data, dtype=dt).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    if n_channels > 1:
        y = y.reshape(-1, n_channels).mean(axis=1)
    return y


def read_riff_wav(path: str) -> tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        data = w.readframes(w.getnframes())
        y = _pcm_to_float(data, w.getsampwidth(), w.getnchannels())
    return y, sr


def read_nist_sphere(path: str) -> tuple[np.ndarray, int]:
    """TIMIT's .WAV files are NIST SPHERE, not RIFF. Parses the 1024-byte
    ASCII header; supports uncompressed PCM only (TIMIT is uncompressed)."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"NIST_1A"):
            raise ValueError(f"{path}: not a NIST SPHERE file")
        header_size = int(f.readline().strip())
        f.seek(0)
        header = f.read(header_size).decode("ascii", errors="replace")
        fields: dict[str, str] = {}
        for line in header.splitlines()[2:]:
            parts = line.split(maxsplit=2)
            if len(parts) == 3 and parts[1].startswith("-"):
                fields[parts[0]] = parts[2]
            if line.strip() == "end_head":
                break
        fmt = fields.get("sample_coding", "pcm")
        if "shorten" in fmt or "embedded" in fmt:
            raise ValueError(f"{path}: shorten-compressed SPHERE unsupported")
        sr = int(fields.get("sample_rate", 16000))
        sampwidth = int(fields.get("sample_n_bytes", 2))
        n_channels = int(fields.get("channel_count", 1))
        big_endian = fields.get("sample_byte_format", "01") == "10"
        f.seek(header_size)
        y = _pcm_to_float(f.read(), sampwidth, n_channels, big_endian)
    return y, sr


def read_via_ffmpeg(path: str, target_sr: int) -> tuple[np.ndarray, int]:
    """Decode mp3/ogg/anything with ffmpeg to raw mono float32."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg not available for compressed-audio decode")
    cmd = [ffmpeg, "-v", "quiet", "-i", path, "-f", "f32le", "-acodec",
           "pcm_f32le", "-ac", "1", "-ar", str(target_sr), "-"]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(raw, dtype="<f4").astype(np.float32), target_sr


# ------------------------------------------------------------- mp3 decode ---
# The reference decodes mp3 through librosa -> audioread -> ffmpeg
# (TARGET_spk_reader.py:108). Neither librosa nor ffmpeg ships in this
# image, but the system libmpg123 does — bind it directly (ctypes, no
# subprocess, no temp files) and decode in-process. ffmpeg remains the
# fallback for non-mp3 compressed formats.

_MPG123_ENC_SIGNED_16 = 0xD0   # mpg123.h MPG123_ENC_SIGNED_16
_MPG123_OK, _MPG123_DONE, _MPG123_NEW_FORMAT = 0, -12, -11

_mpg123_lib = None


def _load_mpg123():
    global _mpg123_lib
    if _mpg123_lib is not None:
        return _mpg123_lib or None
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("mpg123") or "libmpg123.so.0"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        _mpg123_lib = False
        return None
    c = ctypes
    lib.mpg123_init()
    lib.mpg123_new.restype = c.c_void_p
    lib.mpg123_new.argtypes = [c.c_char_p, c.POINTER(c.c_int)]
    lib.mpg123_open.argtypes = [c.c_void_p, c.c_char_p]
    lib.mpg123_getformat.argtypes = [c.c_void_p, c.POINTER(c.c_long),
                                     c.POINTER(c.c_int), c.POINTER(c.c_int)]
    lib.mpg123_format_none.argtypes = [c.c_void_p]
    lib.mpg123_format.argtypes = [c.c_void_p, c.c_long, c.c_int, c.c_int]
    lib.mpg123_read.argtypes = [c.c_void_p, c.c_void_p, c.c_size_t,
                                c.POINTER(c.c_size_t)]
    lib.mpg123_close.argtypes = [c.c_void_p]
    lib.mpg123_delete.argtypes = [c.c_void_p]
    lib.mpg123_strerror.restype = c.c_char_p
    lib.mpg123_strerror.argtypes = [c.c_void_p]
    _mpg123_lib = lib
    return lib


def can_decode_mp3() -> bool:
    """True when an in-process (libmpg123) or ffmpeg decode path exists."""
    return _load_mpg123() is not None or shutil.which("ffmpeg") is not None


def read_via_mpg123(path: str) -> tuple[np.ndarray, int]:
    """Decode an mp3 via the system libmpg123 -> (float32 mono, native sr)."""
    import ctypes

    lib = _load_mpg123()
    if lib is None:
        raise RuntimeError("libmpg123 not available")
    err = ctypes.c_int(0)
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError(f"mpg123_new failed (err {err.value})")
    try:
        if lib.mpg123_open(h, os.fsencode(path)) != _MPG123_OK:
            raise ValueError(f"mpg123 cannot open {path}: "
                             f"{lib.mpg123_strerror(h).decode()}")
        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        if lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(channels),
                                ctypes.byref(enc)) != _MPG123_OK:
            raise ValueError(f"mpg123 cannot read format of {path}")
        # pin the output format so it cannot change mid-stream
        lib.mpg123_format_none(h)
        lib.mpg123_format(h, rate.value, channels.value, _MPG123_ENC_SIGNED_16)
        buf = (ctypes.c_char * (1 << 20))()
        got = ctypes.c_size_t(0)
        chunks = []
        while True:
            rc = lib.mpg123_read(h, buf, len(buf), ctypes.byref(got))
            if got.value:
                chunks.append(bytes(buf[: got.value]))
            if rc == _MPG123_DONE:
                break
            if rc not in (_MPG123_OK, _MPG123_NEW_FORMAT):
                raise ValueError(f"mpg123 decode error on {path}: "
                                 f"{lib.mpg123_strerror(h).decode()}")
        y = np.frombuffer(b"".join(chunks), dtype="<i2").astype(np.float32) / 32768.0
        if channels.value > 1:
            y = y.reshape(-1, channels.value).mean(axis=1)
        return y, int(rate.value)
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)


def load_audio(path: str, sample_rate: int = 16000, use_native: bool = True) -> np.ndarray:
    """Any supported audio file -> float32 mono at sample_rate.

    PCM WAV/SPHERE decode goes through the native C++ decoder when the
    library is built (native/scl_data.cc — one pass, no Python chunking);
    the Python readers are the fallback, ffmpeg handles compressed formats.
    """
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext in (".wav", ".wv1", ".wv2", ""):
            with open(path, "rb") as f:
                magic = f.read(8)
            if magic.startswith((b"RIFF", b"NIST_1A")):
                if use_native:
                    from .packed_cache import native_decode_pcm

                    out = native_decode_pcm(path)
                    if out is not None:
                        return _resample(out[0], out[1], sample_rate)
                y, sr = (read_riff_wav(path) if magic.startswith(b"RIFF")
                         else read_nist_sphere(path))
            else:
                y, sr = read_via_ffmpeg(path, sample_rate)
        elif ext == ".mp3" and _load_mpg123() is not None:
            y, sr = read_via_mpg123(path)
        else:
            y, sr = read_via_ffmpeg(path, sample_rate)
    except (wave.Error, struct.error) as e:
        raise ValueError(f"failed to decode {path}: {e}") from e
    return _resample(y, sr, sample_rate)


def write_riff_wav(path: str, y: np.ndarray, sample_rate: int, norm: bool = True):
    """float wav -> 16-bit RIFF (librosa.output.write_wav parity incl. the
    norm=True peak normalization used at test.py:177-179). int16 input is
    written as-is (already-normalized device PCM, ClonePipeline.convert_pcm16)."""
    y = np.asarray(y)
    if y.dtype == np.int16:
        pcm = y.astype("<i2")
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.tobytes())
        return
    y = np.asarray(y, np.float32)
    if norm and np.abs(y).max() > 0:
        y = y / np.abs(y).max()
    pcm = np.clip(y * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
