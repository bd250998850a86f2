"""Image codec / phash / PSNR kernels (north-rule payload path, M5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from subdomain_crawler_spark.functions import image


def _img(h=33, w=47, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_raw_roundtrip():
    img = _img()
    assert np.array_equal(image.decode_raw(image.encode_raw(img)), img)


def test_bmp_roundtrip():
    img = _img()  # width 47 → 141 bytes/row → exercises 4-byte padding
    assert np.array_equal(image.decode_bmp(image.encode_bmp(img)), img)


def test_bmp_even_width_roundtrip():
    img = _img(16, 16, seed=1)
    assert np.array_equal(image.decode_bmp(image.encode_bmp(img)), img)


def test_lossy_psnr_band():
    img = _img()
    dec = image.decode_image(image.encode_image(img, "lossy"), "lossy")
    p = image.psnr(img, dec)
    assert 40.0 <= p < 60.0, f"lossy PSNR {p} outside expected band"
    assert not np.array_equal(dec, img)  # genuinely lossy


def test_psnr_identical_inf():
    img = _img()
    assert image.psnr(img, img) == float("inf")


def test_phash_deterministic_and_locality():
    img = _img(64, 64, seed=3)
    h1 = image.average_hash(img)
    assert h1 == image.average_hash(img.copy())
    # mild quantization barely moves the hash
    h2 = image.average_hash(image.quantize(img))
    from subdomain_crawler_spark.functions.text import hamming64
    assert hamming64(h1, h2) <= 4
    # unrelated image lands far away
    h3 = image.average_hash(_img(64, 64, seed=99))
    assert hamming64(h1, h3) > 10


def test_unknown_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        image.encode_image(_img(), "jpeg")
    with pytest.raises(NotImplementedError):
        image.decode_image(b"\xff\xd8", "jpeg")


def test_validate_batch():
    a, b = _img(seed=1), _img(seed=2)
    rows = {
        "bytes": [image.encode_image(a, "bmp"), image.encode_image(a, "lossy"),
                  image.encode_image(b, "raw")],
        "fmt": ["bmp", "lossy", "raw"],
        "ref_bytes": [image.encode_image(a, "bmp")] * 3,
        "ref_fmt": ["bmp"] * 3,
        "caption": ["same", "same", "diff"],
        "ref_caption": ["same", "same", "DIFF"],
    }
    df = pd.DataFrame(rows)
    out = image.validate_batch(df["bytes"], df["fmt"], df["ref_bytes"],
                               df["ref_fmt"], df["caption"], df["ref_caption"])
    assert list(out["pixels_ok"]) == [True, True, False]
    assert out["psnr_db"][1] >= 40.0
    assert list(out["caption_ok"]) == [True, True, False]


def test_phash_batch():
    a = _img(seed=1)
    s = image.phash_batch(
        pd.Series([image.encode_image(a, "bmp"), None]), pd.Series(["bmp", "bmp"])
    )
    assert s[0] == image.average_hash(a)
    assert pd.isna(s[1])


def test_resize_nearest_manual():
    img = _img(h=10, w=14, seed=5)
    out = image.resize_nearest(img, 25, 7)
    assert out.shape == (25, 7, 3)
    for i in range(25):
        for j in range(7):
            assert np.array_equal(out[i, j], img[(i * 10) // 25,
                                                 (j * 14) // 7])


def test_resize_box_mean_exact():
    img = _img(h=12, w=8, seed=6)
    out = image.resize_box_mean(img, 4)
    assert out.shape == (3, 2, 3)
    for i in range(3):
        for j in range(2):
            block = img[i * 4:(i + 1) * 4, j * 4:(j + 1) * 4].astype(int)
            assert np.array_equal(out[i, j],
                                  block.reshape(16, 3).sum(0) // 16)


def test_resize_preserves_phash_on_block_mosaic():
    """The fixture-family invariant the img_resize oracle pins: uniform
    2x2-block mosaics keep their average-hash under NN 2x upscale and
    factor-2 box-mean downscale."""
    rs = np.random.RandomState(8)
    pat = rs.randint(0, 2, size=(8, 8)).astype(np.uint8)
    gray = (np.kron(pat, np.ones((2, 2), dtype=np.uint8)) * 150 + 50)
    img = np.stack([gray.astype(np.uint8)] * 3, axis=2)
    base = image.average_hash(img)
    assert image.average_hash(image.resize_nearest(img, 32, 32)) == base
    assert image.average_hash(image.resize_box_mean(img, 2)) == base


def test_img_stats_matches_numpy(spark):
    """q_img_stats (round 9): integer-exact per-image pixel statistics.
    Expectation recomputed by decoding every fixture image directly with
    numpy — independent of the Spark kernel's batching — and the design
    closed form (12 channel bytes per phash cell at gray 200 / lo) is
    asserted against the same numbers."""
    import pyarrow.parquet as pq

    from subdomain_crawler_spark.plans import driver_queries as dq

    t = pq.read_table(dq._ensure_img_corpus_fixture(),
                      columns=["image_id", "bytes", "fmt", "phash"]
                      ).to_pandas()
    want = {}
    for iid, buf, fmt, ph in zip(t["image_id"], t["bytes"], t["fmt"],
                                 t["phash"]):
        a = image.decode_image(buf, fmt).astype(np.int64)
        want[iid] = (int(a.size), int(a.sum()), int((a * a).sum()),
                     int(a.min()), int(a.max()))
        k = bin(int(ph) & ((1 << 64) - 1)).count("1")
        lo = 48 if fmt == "lossy" else 50
        assert want[iid] == (768, 12 * (k * 200 + (64 - k) * lo),
                             12 * (k * 40000 + (64 - k) * lo * lo), lo, 200)
    got = {r["image_id"]: (r["n_px"], r["sum_px"], r["sum_sq"],
                           r["min_px"], r["max_px"])
           for r in dq.q_img_stats(spark, "").collect()}
    assert got == want


def test_img_quality_filter_matches_numpy(spark):
    """q_img_quality_filter (round 10): first-failing-rule reasons over
    decoded pixel stats + caption length, recomputed independently with
    numpy per image.  Also asserts every reason class actually fires at
    fixture scale (a gate that never fires is untested)."""
    import pyarrow.parquet as pq

    from subdomain_crawler_spark.plans import driver_queries as dq

    t = pq.read_table(dq._ensure_img_corpus_fixture(),
                      columns=["image_id", "bytes", "fmt", "caption"]
                      ).to_pandas()
    want = {}
    for iid, buf, fmt, cap in zip(t["image_id"], t["bytes"], t["fmt"],
                                  t["caption"]):
        a = image.decode_image(buf, fmt).astype(np.int64)
        n, s, sq = int(a.size), int(a.sum()), int((a * a).sum())
        if s < dq._IQF_MIN_MEAN * n:
            want[iid] = "too_dark"
        elif n * sq - s * s < dq._IQF_MIN_VAR * n * n:
            want[iid] = "low_contrast"
        elif len(cap.split()) < dq._IQF_MIN_CAP_TOKENS:
            want[iid] = "bad_caption"
        else:
            want[iid] = "kept"
    got = {r["image_id"]: r["reason"]
           for r in dq.q_img_quality_filter(spark, "").collect()}
    assert got == want
    assert set(want.values()) == {"too_dark", "low_contrast",
                                  "bad_caption", "kept"}
