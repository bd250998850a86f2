"""Streaming seed ingest + M5 payload validation on Spark."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from subdomain_crawler_spark.functions import image
from subdomain_crawler_spark.operators.validate import validate_payloads
from subdomain_crawler_spark.streaming import ingest


def test_streaming_seed_ingest(spark, tmp_path):
    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    (seeds_dir / "a.txt").write_text(
        "alpha.com\n\n# comment line\n  www.gamma.co.uk  \n")
    inbox = str(tmp_path / "inbox")
    q = ingest.start_seed_ingest(spark, str(seeds_dir), inbox,
                                 str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = ingest.drain_inbox(spark, inbox)
    rows = {(x.host, x.root, x.depth) for x in got.collect()}
    # SLD expanded (134 candidates), subdomain passed through, comment dropped
    assert ("alpha.com", "alpha.com", 0) in rows
    assert ("www.alpha.com", "alpha.com", 0) in rows
    assert ("www.gamma.co.uk", "gamma.co.uk", 0) in rows
    assert len([r for r in rows if r[1] == "alpha.com"]) == 134
    assert not any("#" in r[0] for r in rows)

    # second file arrives → incremental micro-batch, no reprocessing of a.txt
    (seeds_dir / "b.txt").write_text("beta.org\n")
    q2 = ingest.start_seed_ingest(spark, str(seeds_dir), inbox,
                                  str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    rows2 = {(x.host, x.root, x.depth) for x in
             ingest.drain_inbox(spark, inbox).collect()}
    assert ("www.beta.org", "beta.org", 0) in rows2
    assert len(rows2) == len(rows) + 134


def test_drain_empty_inbox(spark, tmp_path):
    assert ingest.drain_inbox(spark, str(tmp_path / "nope")) is None


def _payload_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows))


def test_validate_payloads(spark):
    rng = np.random.RandomState(5)
    img_a = rng.randint(0, 256, (24, 31, 3), dtype=np.uint8)
    img_b = rng.randint(0, 256, (24, 31, 3), dtype=np.uint8)
    ref = [
        dict(image_id="a", bytes=image.encode_image(img_a, "bmp"), fmt="bmp",
             caption="cap-a"),
        dict(image_id="b", bytes=image.encode_image(img_b, "raw"), fmt="raw",
             caption="cap-b"),
        dict(image_id="c", bytes=image.encode_image(img_a, "bmp"), fmt="bmp",
             caption="cap-c"),
    ]
    got = [
        # lossy re-encode of a: PSNR ≥ 40, caption matches → ok
        dict(image_id="a", bytes=image.encode_image(img_a, "lossy"),
             fmt="lossy", caption="cap-a"),
        # wrong pixels for b → fail
        dict(image_id="b", bytes=image.encode_image(img_a, "raw"), fmt="raw",
             caption="cap-b"),
        # exact pixels but caption drift → caption_ok False
        dict(image_id="c", bytes=image.encode_image(img_a, "bmp"), fmt="bmp",
             caption="CAP-C"),
    ]
    out = {r["image_id"]: r.asDict() for r in
           validate_payloads(_payload_df(spark, got),
                             _payload_df(spark, ref)).collect()}
    assert out["a"]["pixels_ok"] and out["a"]["caption_ok"]
    assert 40.0 <= out["a"]["psnr_db"] < 60.0
    assert not out["b"]["pixels_ok"]
    assert out["c"]["pixels_ok"] and out["c"]["psnr_db"] == 1e9
    assert not out["c"]["caption_ok"] and not out["c"]["payload_ok"]


def test_validate_fixture_corpus_self(spark, fixture_web):
    """The fixture corpus validates against itself (exact for raw/bmp,
    ≥40 dB for lossy rows)."""
    base = fixture_web["base"]
    corpus = spark.read.parquet(f"{base}/corpus.parquet") \
        .select("image_id", "bytes", "fmt", "caption")
    out = validate_payloads(corpus, corpus)
    n = out.count()
    ok = out.filter("payload_ok").count()
    assert n == ok > 0


import pytest


@pytest.mark.parametrize("state_mode", ["exact", "bloom"])
def test_streaming_stateful_dedup(spark, tmp_path, state_mode):
    """applyInPandasWithState seen-filter: novel hosts pass, repeats are
    dropped WITHIN a batch, ACROSS micro-batches, and ACROSS query restarts
    (state rides the checkpoint).  Runs both state representations: exact
    host-array state and the constant-memory serialized-bloom state (the
    10^10-host form; at this capacity the FP rate is ~0 so the outputs
    must be identical)."""
    import json
    import os

    from pyspark.sql import functions as F
    from subdomain_crawler_spark.streaming.dedup import streaming_seen_filter

    src = tmp_path / "cands"
    src.mkdir()
    out_dir = str(tmp_path / "novel")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        raw = (spark.readStream.format("json")
               .schema("host string, root string, depth int")
               .load(str(src)))
        novel = streaming_seen_filter(raw, shards=4, state_mode=state_mode,
                                      bloom_capacity=10_000, bloom_fp=1e-6)

        def sink(batch, batch_id):
            (batch.coalesce(1).write.mode("append").parquet(out_dir))

        q = (novel.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    def write_file(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    write_file("a.json", [
        {"host": "a.x.com", "root": "x.com", "depth": 1},
        {"host": "b.x.com", "root": "x.com", "depth": 1},
        {"host": "a.x.com", "root": "x.com", "depth": 1},  # in-batch repeat
    ])
    run_once()
    got1 = {r.host for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {"a.x.com", "b.x.com"}

    # restart with new data: previously-seen hosts must stay filtered
    write_file("b.json", [
        {"host": "b.x.com", "root": "x.com", "depth": 1},  # seen last run
        {"host": "c.x.com", "root": "x.com", "depth": 2},
    ])
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    hosts = sorted(r.host for r in rows)
    assert hosts == ["a.x.com", "b.x.com", "c.x.com"]  # c novel, b not re-emitted
    assert {r.depth for r in rows if r.host == "c.x.com"} == {2}
