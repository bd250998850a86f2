"""Audio payload kernels — PCM16 container + windowed features (numpy-only).

The driver brief's multimodal list is image/audio/video with decode /
feature-extract implemented as Arrow-batched kernels and real codecs
stubbed.  This module is the audio leg: a real, deterministic PCM16
container (``pcm16``) so the Spark kernel parses genuine bytes, and
windowed feature extraction designed EXACT-ARITHMETIC-FIRST so the DuckDB
oracle reproduces every value bit-for-bit:

* per 256-sample window: ``sum_sq`` (int64 — samples are int16, so the sum
  is exact on any engine), ``peak`` (max |x|, int), ``zcr`` (count of
  strict sign flips x[i-1]·x[i] < 0, int) and ``rms`` =
  round(sqrt(sum_sq/win), 4) — the only float, derived from an identical
  integer on both sides (win is a power of two, so the division is exact).

Compressed codecs (MP3/Opus/AAC) need external libs absent from this
container and raise ``NotImplementedError`` (same stub pattern as
functions/image.py JPEG/PNG).

Container ``pcm16``: 12-byte header (magic ``AUD0``, sr:uint32le,
n_samples:uint32le) + n_samples × int16le mono samples.
"""

from __future__ import annotations

import struct

import numpy as np

_AUD_MAGIC = b"AUD0"
_HEADER = struct.Struct("<4sII")

WINDOW = 256


def encode_audio(samples: np.ndarray, sr: int = 16000) -> bytes:
    assert samples.dtype == np.int16 and samples.ndim == 1
    return _HEADER.pack(_AUD_MAGIC, sr, len(samples)) + samples.tobytes()


def decode_audio(buf: bytes, fmt: str = "pcm16") -> tuple[int, np.ndarray]:
    """bytes → (sample_rate, int16 samples).  Unknown codecs raise (stub)."""
    if fmt != "pcm16":
        raise NotImplementedError(
            f"audio codec {fmt!r} needs external decoders not present in "
            f"this container; pcm16 exercises the identical Spark plumbing")
    magic, sr, n = _HEADER.unpack_from(buf, 0)
    assert magic == _AUD_MAGIC, "bad pcm16 magic"
    return sr, np.frombuffer(buf, dtype="<i2", offset=_HEADER.size,
                             count=n)


FP_WINDOWS = 65  # fingerprint64 consumes 65 windows -> 64 delta bits


def fingerprint64(samples: np.ndarray, win: int = WINDOW) -> int:
    """Haitsma-Kalker-style energy-delta sign fingerprint (ISMIR'02 shape,
    reduced to one band): bit b — MSB-first, b = 0 the int64 sign bit, the
    same packing as functions/image.py average_hash — is 1 iff the energy
    (windowed sum of squares, exact int64) STRICTLY rises from window b to
    window b+1, over the first 65 full windows.  Clips shorter than 65
    windows leave the trailing bits 0 (the frame-aligned convention of
    window_features); energy is invariant to sign flips and robust to the
    small amplitude noise the delta-sign survives — the property the
    original fingerprint was designed around.  Returned as a SIGNED 64-bit
    int so it rides an int64 Spark/parquet column like the image phash."""
    x = samples.astype(np.int64)
    n_win = min(len(x) // win, FP_WINDOWS)
    fp = 0
    if n_win >= 2:
        e = (x[:n_win * win].reshape(n_win, win) ** 2).sum(axis=1)
        for b in range(n_win - 1):
            if e[b + 1] > e[b]:
                fp |= 1 << (63 - b)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def window_features(samples: np.ndarray, win: int = WINDOW):
    """Yield (win_idx, sum_sq, peak, zcr, rms) per FULL window (a trailing
    partial window is dropped — the fixtures use exact multiples; at scale
    the drop is the standard frame-aligned convention and is disclosed
    here).  Integer features are exact (int64); rms is the only float."""
    import math

    x = samples.astype(np.int64)
    n_win = len(x) // win
    for w in range(n_win):
        seg = x[w * win:(w + 1) * win]
        sum_sq = int((seg * seg).sum())
        peak = int(np.abs(seg).max())
        zcr = int(((seg[:-1] * seg[1:]) < 0).sum())
        rms = round(math.sqrt(sum_sq / win), 4)
        yield w, sum_sq, peak, zcr, rms
