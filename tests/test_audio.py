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


def test_fingerprint64_manual():
    """Energy-delta sign hash against a from-scratch python loop, plus the
    edge conventions: short clips (< 2 windows -> 0; < 65 windows -> only
    leading bits set), strict-rise semantics (equal energies -> bit 0),
    and the signed-int64 packing (bit 0 set -> negative)."""
    win = audio.WINDOW
    rs = np.random.RandomState(7)
    x = rs.randint(-400, 400, size=win * 65, dtype=np.int16)
    e = [sum(int(v) ** 2 for v in x[w * win:(w + 1) * win])
         for w in range(65)]
    want = 0
    for b in range(64):
        if e[b + 1] > e[b]:
            want |= 1 << (63 - b)
    if want >= 1 << 63:
        want -= 1 << 64
    assert audio.fingerprint64(x) == want

    assert audio.fingerprint64(np.zeros(10, dtype=np.int16)) == 0
    assert audio.fingerprint64(np.ones(win * 3, dtype=np.int16)) == 0
    rising = np.repeat(np.array([1, 2, 3], dtype=np.int16), win)
    # bits 0,1 set -> sign bit set -> negative signed packing
    assert audio.fingerprint64(rising) == (0b11 << 62) - (1 << 64)
    assert audio.fingerprint64(rising) < 0


def test_audio_nd_fixture_designed_structure():
    """The builder's bytes ⇄ fingerprint round-trip, re-verified from the
    PARQUET (not the builder's in-memory assert): decode every stored
    clip, recompute energies with an independent python loop, repack, and
    match the stored fp; then pin the designed distances — (base, member)
    = 3, even-group rejects 5 with three equal 16-bit bands (the designed
    band-collision candidates), odd-group rejects 12 with NO equal band."""
    import pyarrow.parquet as pq

    from subdomain_crawler_spark.plans import driver_queries as dq

    t = pq.read_table(dq._ensure_audio_nd_fixture()).to_pandas()
    win = audio.WINDOW
    fps = {}
    for aid, buf, fmt, fp in zip(t["audio_id"], t["bytes"], t["fmt"],
                                 t["fp"]):
        _, x = audio.decode_audio(buf, fmt)
        e = [sum(int(v) ** 2 for v in x[w * win:(w + 1) * win])
             for w in range(len(x) // win)]
        got = 0
        for b in range(len(e) - 1):
            if e[b + 1] > e[b]:
                got |= 1 << (63 - b)
        if got >= 1 << 63:
            got -= 1 << 64
        assert got == fp, aid
        fps[aid] = int(fp) & ((1 << 64) - 1)

    def band_eq(a, b, k):
        return ((a >> (16 * k)) & 0xFFFF) == ((b >> (16 * k)) & 0xFFFF)

    for g in range(dq._AUDIO_ND_GROUPS):
        base, mem, rej = (fps[f"and{3 * g + r:03d}"] for r in range(3))
        assert bin(base ^ mem).count("1") == 3
        if g % 2 == 0:
            assert bin(base ^ rej).count("1") == 5
            assert sum(band_eq(base, rej, k) for k in range(4)) == 3
        else:
            assert bin(base ^ rej).count("1") == 12
            assert not any(band_eq(base, rej, k) for k in range(4))


def test_audio_near_dup_pairs(spark):
    """q_audio_near_dup vs an all-pairs brute force over the stored
    designed fingerprints; every group's (base, member) pair present,
    rejects never paired (even-group band-collision candidates confirmed
    dropped), and the output fingerprints equal the stored ones."""
    import pyarrow.parquet as pq

    from subdomain_crawler_spark.plans import driver_queries as dq

    t = pq.read_table(dq._ensure_audio_nd_fixture(),
                      columns=["audio_id", "fp"]).to_pandas()
    fps = dict(zip(t["audio_id"], (int(v) for v in t["fp"])))
    want = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if d <= dq._IMG_RADIUS:
                want.add((a, b, fps[a], fps[b], d))
    got = {tuple(r) for r in dq.q_audio_near_dup(spark, "").collect()}
    assert got == want
    for g in range(dq._AUDIO_ND_GROUPS):
        base, mem = f"and{3 * g:03d}", f"and{3 * g + 1:03d}"
        assert (base, mem, fps[base], fps[mem], 3) in got
    rejects = {f"and{3 * g + 2:03d}" for g in range(dq._AUDIO_ND_GROUPS)}
    assert not any(l in rejects or r in rejects for l, r, *_ in got)


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
