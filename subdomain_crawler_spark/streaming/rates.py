"""Streaming discovery rates — A2's event-time twin with watermarked
windows for late data.

The batch engine computes A2 (requests/discoveries per time bucket) over
the persisted events table (`plans/driver_queries.q_a2_rates`); a live
deployment wants the same aggregation over the event STREAM as rounds
emit it.  The reference's dashboard recomputes rates from in-process
counters once per second (/root/reference/pkg/presentation/dashboard.go)
and has no late-data concept; the streaming form must, because on a real
cluster round events arrive from a thousand executors with skewed delays.

Spark-first shape:

    events ──withWatermark(ts, delay)──►
        groupBy(window(ts, width), event_type) ──count──► rate rows

* The watermark bounds state: a window's partial aggregate is kept only
  until the watermark (max event time seen − delay) passes the window
  end, then finalized and dropped from state — without it, state grows
  with the stream's lifetime.  Events arriving later than the watermark
  (older than every open window) are DROPPED, the documented trade: a
  rate row is eventually-exact w.r.t. data at most ``delay`` late.
* Aggregation is partial/map-side like the batch twin: the shuffle
  carries (window, event_type) pairs, which grow with time span, not
  row count.
* ``update`` output mode pairs with a ``foreachBatch`` sink that upserts
  by (window, event_type) key — each micro-batch emits only the windows
  it changed.

The crawl itself stays iterative batch (the reference BFS has no
stream-time semantics, SURVEY.md §2.8); this operator is for the metrics
surface, where event time is real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rates(events: DataFrame, window: str = "5 minutes",
                   watermark: str = "5 minutes") -> DataFrame:
    """Event-time windowed counts + per-second rates per event_type.

    ``events`` needs ``ts:timestamp`` and ``event_type:string`` columns
    (the engine's events schema).  Works on a streaming OR batch frame —
    on batch input ``withWatermark`` is a no-op and the result equals the
    batch A2 aggregation at this window width, which is what the
    equivalence test pins.
    """
    # timestamp_diff, not cast-to-long: the engine's persisted events carry
    # TIMESTAMP_NTZ (zone-free), which Spark refuses to cast to bigint;
    # the diff form works on both NTZ and LTZ inputs
    win_sec = F.timestamp_diff("SECOND", F.col("w.start"), F.col("w.end"))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("requests"))
            .select(F.col("w.start").alias("bucket"), "event_type",
                    "requests",
                    F.round(F.col("requests") / win_sec.cast("double"), 4)
                     .alias("rate_per_sec")))


def start_rate_stream(spark, events_dir: str, checkpoint_dir: str,
                      sink, window: str = "5 minutes",
                      watermark: str = "5 minutes", schema=None,
                      processing_time: str | None = None):
    """File-source stream of event rows → watermarked windowed rates →
    ``sink(batch_df, batch_id)`` via foreachBatch in ``update`` mode
    (each micro-batch emits the windows it changed; the sink upserts by
    (bucket, event_type)).  Returns the StreamingQuery; a later run over
    the same ``checkpoint_dir`` resumes the watermark, so windows already
    finalized stay closed and older-than-watermark rows are dropped —
    pinned by tests/test_streaming_rates.py.

    Trigger: by default ``availableNow`` — drain every file already
    present, then stop (the drain-and-resume contract the tests pin, and
    the right shape for a periodic batch-ish refresh).  A LIVE deployment
    passes ``processing_time`` (e.g. ``"10 seconds"``) and the query runs
    continuously, emitting each micro-batch on that cadence (round-7
    review: the continuous mode must be reachable through this API, not
    hardcoded away)."""
    raw = spark.readStream.schema(schema).parquet(events_dir)
    rates = windowed_rates(raw, window=window, watermark=watermark)
    writer = (rates.writeStream
              .foreachBatch(sink)
              .outputMode("update")
              .option("checkpointLocation", checkpoint_dir))
    if processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
