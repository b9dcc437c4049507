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
