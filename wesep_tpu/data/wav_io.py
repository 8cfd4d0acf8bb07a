"""WAV read/write on numpy, stdlib-only (no soundfile/torchaudio deps).

Covers the formats the reference touches through torchaudio.load /
soundfile.read / runtime/frontend/wav.h (RIFF PCM16/24/32, float32).
Waveforms are float32 in [-1, 1], shaped [channels, T] to match the
torchaudio.load convention the pipeline dicts use
(/root/reference/wesep/dataset/processor.py:104-106).
"""

import io
import struct
import wave
from typing import BinaryIO, Tuple, Union

import numpy as np

__all__ = ["read_wav", "write_wav", "wav_info"]


def _read_riff_any(data: bytes) -> Tuple[np.ndarray, int]:
    """Minimal RIFF parser for formats the `wave` module rejects
    (float32 / extensible)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif chunk_id == b"data":
            raw = body
        pos += 8 + size + (size % 2)
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, sr, _, _, bits = fmt
    if audio_fmt == 3 or (audio_fmt == 0xFFFE and bits == 32):
        x = np.frombuffer(raw, "<f4").astype(np.float32)
    elif bits == 16:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif bits == 32:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif bits == 24:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int32))
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
    elif bits == 8:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported wav: fmt={audio_fmt} bits={bits}")
    return x.reshape(-1, n_ch).T.copy(), sr


def read_wav(src: Union[str, bytes, BinaryIO]) -> Tuple[np.ndarray, int]:
    """-> (waveform [C, T] float32 in [-1,1], sample_rate)."""
    if isinstance(src, bytes):
        data = src
    elif isinstance(src, str):
        with open(src, "rb") as f:
            data = f.read()
    else:
        data = src.read()
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            sr = w.getframerate()
            raw = w.readframes(w.getnframes())
        if width == 2:
            x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif width == 4:
            x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
        elif width == 3:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            xi = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = (xi - ((xi & 0x800000) << 1)).astype(np.float32) / 8388608.0
        elif width == 1:
            x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported sample width {width}")
        return x.reshape(-1, n_ch).T.copy(), sr
    except wave.Error:
        return _read_riff_any(data)


def write_wav(path: str, wav: np.ndarray, sample_rate: int):
    """Write float [-1,1] (or int16) [T] / [C, T] as PCM16."""
    wav = np.asarray(wav)
    if wav.ndim == 1:
        wav = wav[None, :]
    if wav.dtype != np.int16:
        wav = np.clip(wav, -1.0, 1.0)
        wav = (wav * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(wav.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(wav.T.tobytes())


def wav_info(src: Union[str, bytes, BinaryIO]) -> Tuple[int, int, int]:
    """-> (n_frames, sample_rate, n_channels) without decoding samples."""
    if isinstance(src, str):
        with open(src, "rb") as f:
            head = f.read(512 * 1024)
    elif isinstance(src, bytes):
        head = src
    else:
        head = src.read()
    with wave.open(io.BytesIO(head), "rb") as w:
        return w.getnframes(), w.getframerate(), w.getnchannels()


def wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    """Encode to PCM16 wav bytes (for shard writers)."""
    buf = io.BytesIO()
    wav = np.asarray(wav)
    if wav.ndim == 1:
        wav = wav[None, :]
    if wav.dtype != np.int16:
        wav = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(wav.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(wav.T.tobytes())
    return buf.getvalue()
