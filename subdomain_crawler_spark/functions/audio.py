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
