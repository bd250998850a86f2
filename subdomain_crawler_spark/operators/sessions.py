"""Sessionization — including the salted two-phase form for hot-user skew.

The driver query (plans/driver_queries.q_sessionize) uses the classic
two-window shape with ``Window.partitionBy(user_id)``: correct, but a
single hot key (one bot user_id emitting 10^8 events at 10^10-event scale)
serializes that user's entire timeline through ONE window task.

``sessionize_salted`` is the scale form, same trick as the politeness
budget's salted top-K (operators/politeness.py): shard the heavy window by
a compound key whose cardinality you control, then reconcile shard
boundaries on a frame that is **per-shard, not per-event** sized.

Phase 1 (heavy, parallel): partition events by (user_id, time-bucket);
inside each bucket run the usual lag→gap→flag→running-count window.  A
bucket holds at most ``bucket_us`` worth of one user's events, so the hot
user's timeline splits across ``span/bucket_us`` independent tasks.

Phase 2 (light): per (user, bucket) aggregate first/last event time and
local session count — ONE row per user-bucket.  A window over THIS tiny
frame decides, for each bucket, whether its first local session continues
the previous bucket's last session (boundary gap ≤ threshold) and computes
the user's running session offset.  Global id = offset + local_id −
merged_first.  Exactness: a session is a maximal run of events with gaps ≤
threshold; splitting at an arbitrary time boundary and re-joining iff the
boundary gap ≤ threshold reconstructs exactly the unsplit runs, so the
output equals the single-window form row-for-row
(tests/test_plans.py::test_sessionize_salted_parity pins this, hot user
included).

Scale math: phase-1 task size ≤ events-per-user-per-bucket (bounded by
rate × bucket_us, not by total user volume); phase-2 window rows per user =
time-span / bucket_us (e.g. 30 days / 1 day = 30), constant in event count.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 1800 * 1_000_000   # 30-minute inactivity gap
DEFAULT_BUCKET_US = 86_400 * 1_000_000  # 1-day phase-1 shards

_EPOCH = datetime.datetime(1970, 1, 1)


def sessionize_simple(events: DataFrame,
                      gap_us: int = SESSION_GAP_US) -> DataFrame:
    """The single-window reference shape (what q_sessionize runs) — here so
    the salted form has an in-library twin to prove parity against."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    new_s = (gap.isNull() | (gap > F.lit(gap_us))).cast("long")
    sid = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    x = events.select("user_id", "event_id", "ts", sid.alias("session_id"))
    return (x.groupBy("user_id", "session_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min("event_id").alias("first_event"),
                  F.floor(F.timestamp_diff("MICROSECOND", F.min("ts"),
                                           F.max("ts")) / F.lit(1_000_000))
                  .cast("long").alias("duration_sec")))


def sessionize_salted(events: DataFrame,
                      gap_us: int = SESSION_GAP_US,
                      bucket_us: int = DEFAULT_BUCKET_US) -> DataFrame:
    """(user_id, event_id, ts) → (user_id, session_id, n_events,
    first_event, duration_sec) — identical to the single-window
    q_sessionize, hot-user safe.  ts arithmetic is zone-free microsecond
    deltas from a fixed epoch literal (NTZ-safe, like q_sessionize)."""
    us = F.timestamp_diff("MICROSECOND", F.lit(_EPOCH), F.col("ts"))
    e = events.select(
        "user_id", "event_id", us.alias("us"),
        F.floor(us / F.lit(bucket_us)).cast("long").alias("bkt"))

    # phase 1: local sessionize inside (user, bucket)
    w = Window.partitionBy("user_id", "bkt").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    loc_new = (gap.isNull() | (gap > F.lit(gap_us))).cast("long")
    x = e.select(
        "user_id", "bkt", "event_id", "us",
        F.sum(loc_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
         .alias("loc_sid"))

    # phase 2: one row per (user, bucket) — boundary merge + running offset
    b = (x.groupBy("user_id", "bkt")
          .agg(F.min("us").alias("first_us"), F.max("us").alias("last_us"),
               F.max("loc_sid").alias("n_sess")))
    wb = Window.partitionBy("user_id").orderBy("bkt")
    prev_last = F.lag("last_us").over(wb)
    merged = (prev_last.isNotNull()
              & (F.col("first_us") - prev_last <= F.lit(gap_us))).cast("long")
    contrib = F.col("n_sess") - merged
    b2 = b.select(
        "user_id", "bkt", merged.alias("merged"),
        F.coalesce(
            F.sum(contrib).over(
                wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("offset"))

    # global id, then the same per-session aggregate as q_sessionize
    g = (x.join(b2, ["user_id", "bkt"])
          .select("user_id", "event_id", "us",
                  (F.col("offset") + F.col("loc_sid") - F.col("merged"))
                  .alias("session_id")))
    return (g.groupBy("user_id", "session_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min("event_id").alias("first_event"),
                  F.floor((F.max("us") - F.min("us")) / F.lit(1_000_000))
                   .cast("long").alias("duration_sec")))
