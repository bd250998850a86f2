"""Audio PCM16 kernels + the windowed-features driver query."""

from __future__ import annotations

import math

import numpy as np
import pytest

from subdomain_crawler_spark.functions import audio


def test_pcm16_roundtrip():
    rs = np.random.RandomState(11)
    x = rs.randint(-32768, 32768, size=777, dtype=np.int16)
    sr, got = audio.decode_audio(audio.encode_audio(x, sr=22050))
    assert sr == 22050
    assert np.array_equal(got, x)


def test_unknown_codec_stubbed():
    with pytest.raises(NotImplementedError):
        audio.decode_audio(b"xxxx", "mp3")


def test_window_features_manual():
    """Exact-arithmetic check against a from-scratch python loop, including
    a window whose boundary pair would be a sign flip (must NOT count) and
    zero samples (strict product < 0 ⇒ no flip)."""
    x = np.array([3, -2, 0, 5] * 128, dtype=np.int16)  # 512 = 2 windows
    feats = list(audio.window_features(x))
    assert [f[0] for f in feats] == [0, 1]
    for w, sum_sq, peak, zcr, rms in feats:
        seg = [int(v) for v in x[w * 256:(w + 1) * 256]]
        assert sum_sq == sum(v * v for v in seg)
        assert peak == max(abs(v) for v in seg)
        assert zcr == sum(1 for i in range(1, 256)
                          if seg[i - 1] * seg[i] < 0)
        assert rms == round(math.sqrt(sum_sq / 256), 4)


def test_trailing_partial_window_dropped():
    x = np.ones(300, dtype=np.int16)
    assert [f[0] for f in audio.window_features(x)] == [0]


def test_audio_features_query(spark):
    """Spark kernel (real byte decode) vs the closed-form sawtooth the
    DuckDB oracle also regenerates."""
    from subdomain_crawler_spark.plans import driver_queries as dq

    want = []
    i = np.arange(dq._AUDIO_SAMPLES, dtype=np.int64)
    for c in range(dq._AUDIO_CLIPS):
        x = ((i * (c + 3)) % 2048 - 1024).astype(np.int16)
        for w, sum_sq, peak, zcr, rms in audio.window_features(x):
            want.append((f"aud{c:03d}", w, sum_sq, peak, zcr, rms))
    got = sorted(tuple(r) for r in
                 dq.q_audio_features(spark, "").collect())
    assert got == sorted(want)
    assert len(got) == dq._AUDIO_CLIPS * (dq._AUDIO_SAMPLES // audio.WINDOW)
