"""Video container kernels + the frame-sample driver query."""

from __future__ import annotations

import numpy as np
import pytest

from subdomain_crawler_spark.functions import image, video


def _frames(n=6, h=8, w=12, seed=3):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_video_roundtrip():
    fr = _frames()
    buf = video.encode_video(fr, fps=30)
    assert video.video_meta(buf) == (12, 8, 6, 30)
    assert np.array_equal(video.decode_video(buf), fr)


def test_sample_frames_matches_full_decode():
    fr = _frames(n=11)
    buf = video.encode_video(fr)
    for stride in (1, 2, 3, 4, 11, 50):
        got = list(video.sample_frames(buf, stride))
        assert [i for i, _ in got] == list(range(0, 11, stride))
        for i, f in got:
            assert np.array_equal(f, fr[i])


def test_unknown_codec_stubbed():
    with pytest.raises(NotImplementedError):
        video.decode_video(b"xxxx", "h264")
    with pytest.raises(NotImplementedError):
        list(video.sample_frames(b"xxxx", 2, "vp9"))


def test_frame_sample_query_matches_image_fixture(spark):
    """The Spark kernel re-decodes packed rawv bytes and hashes; the
    expectation comes from the image fixture's phash column — the same
    independence the DuckDB oracle uses."""
    import pyarrow.parquet as pq

    from subdomain_crawler_spark.plans import driver_queries as dq

    imgs = pq.read_table(dq._ensure_img_corpus_fixture(),
                         columns=["image_id", "phash"]).to_pandas()
    imgs = imgs.sort_values("image_id").reset_index(drop=True)
    want = sorted(
        (f"vid{i // dq._VIDEO_FRAMES:03d}",
         i % dq._VIDEO_FRAMES, int(imgs["phash"][i]))
        for i in range(len(imgs))
        if (i % dq._VIDEO_FRAMES) % dq._VIDEO_STRIDE == 0)
    got = sorted(tuple(r) for r in
                 dq.q_video_frame_sample(spark, "").collect())
    assert got == want
    assert len(got) == len(imgs) // dq._VIDEO_STRIDE
