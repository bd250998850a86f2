"""Watermarked windowed rates (streaming/rates.py): late-data semantics
pinned deterministically with two availableNow runs over one checkpoint.

Run 1 processes on-time events and advances the watermark; run 2 feeds a
row OLDER than the watermark (its window already finalized) plus a fresh
window. The late row must be dropped — the finalized window's count never
changes — while the fresh window aggregates normally. Also pins the
batch≡stream equivalence of the aggregation itself (same expression as
the batch A2 twin at this window width).
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (StringType, StructField, StructType,
                               TimestampType)

from subdomain_crawler_spark.streaming import rates

SCHEMA = StructType([
    StructField("ts", TimestampType()),
    StructField("event_type", StringType()),
])

T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _run(spark, events_dir, ckpt, store):
    def sink(batch, batch_id):
        for r in batch.collect():  # tiny test frames only
            store[(r["bucket"], r["event_type"])] = r["requests"]

    q = rates.start_rate_stream(
        spark, events_dir, ckpt, sink,
        window="5 minutes", watermark="5 minutes", schema=SCHEMA)
    q.awaitTermination()


def test_watermark_drops_late_rows(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    store: dict = {}

    # run 1: window W0 [10:00,10:05) gets 3 rows, W2 [10:20,10:25) gets 1
    # → max event time 10:21, watermark after the run = 10:16 → W0 closed
    _write(spark, events_dir, [
        (T0 + dt.timedelta(minutes=1), "http"),
        (T0 + dt.timedelta(minutes=2), "http"),
        (T0 + dt.timedelta(minutes=3), "dns"),
        (T0 + dt.timedelta(minutes=21), "http"),
    ])
    _run(spark, events_dir, ckpt, store)
    w0 = T0
    assert store[(w0, "http")] == 2
    assert store[(w0, "dns")] == 1

    # run 2 (same checkpoint → watermark 10:16 resumes): one LATE http row
    # in the finalized W0 + one fresh row in W4 [10:20..) — the late row
    # must be dropped, W0's count unchanged, the fresh row aggregated
    _write(spark, events_dir, [
        (T0 + dt.timedelta(minutes=4), "http"),            # late: < wm
        (T0 + dt.timedelta(minutes=22), "http"),           # fresh
    ])
    _run(spark, events_dir, ckpt, store)
    assert store[(w0, "http")] == 2, "late row leaked into a closed window"
    w4 = T0 + dt.timedelta(minutes=20)
    assert store[(w4, "http")] == 2  # run-1 row + run-2 fresh row


def test_batch_stream_aggregation_equivalence(spark):
    """windowed_rates on a BATCH frame ≡ the plain batch aggregation —
    the streaming operator introduces watermark state handling, not
    different math."""
    rows = [(T0 + dt.timedelta(minutes=m), t)
            for m in range(0, 30, 2) for t in ("http", "dns")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r["bucket"], r["event_type"]): (r["requests"], r["rate_per_sec"])
           for r in rates.windowed_rates(df).collect()}
    want = {(r["bucket"], r["event_type"]): (r["requests"], r["rate_per_sec"])
            for r in (df.groupBy(F.window("ts", "5 minutes").alias("w"),
                                 "event_type")
                      .agg(F.count(F.lit(1)).alias("requests"))
                      .select(F.col("w.start").alias("bucket"), "event_type",
                              "requests",
                              F.round(F.col("requests") / 300.0, 4)
                               .alias("rate_per_sec"))).collect()}
    assert got == want and len(got) == 12


def test_processing_time_trigger_runs_continuously(spark, tmp_path):
    """A live deployment passes processing_time and the query keeps
    running across micro-batches instead of draining and stopping
    (round-7 review: continuous mode must be reachable via the API) —
    files added AFTER the stream starts are picked up by a later
    micro-batch of the SAME query."""
    import time

    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    store: dict = {}

    def sink(batch, batch_id):
        for r in batch.collect():
            store[(r["bucket"], r["event_type"])] = r["requests"]

    _write(spark, events_dir, [(T0 + dt.timedelta(minutes=1), "http")])
    q = rates.start_rate_stream(
        spark, events_dir, ckpt, sink, window="5 minutes",
        watermark="5 minutes", schema=SCHEMA,
        processing_time="1 second")
    try:
        deadline = time.monotonic() + 60
        while (T0, "http") not in store and time.monotonic() < deadline:
            time.sleep(0.25)
        assert store.get((T0, "http")) == 1
        assert q.isActive, "availableNow semantics leaked into live mode"

        _write(spark, events_dir, [(T0 + dt.timedelta(minutes=2), "http")])
        while store.get((T0, "http")) != 2 and time.monotonic() < deadline:
            time.sleep(0.25)
        assert store.get((T0, "http")) == 2
        assert q.isActive
    finally:
        q.stop()
