"""Structured-Streaming seed ingest — continuous frontier feeding.

The reference crawl is a terminating BFS with no stream-time semantics
(SURVEY.md §2.8: no watermarks/windows; completion = WaitGroup hits zero,
/root/reference/pkg/application/crawl_usecase.go:285-292), so the crawl loop
itself is iterative batch. What IS continuous in a production deployment is
seed arrival: new seed lists land as files and must flow into the next
round's frontier. This module implements that as a file-source stream +
``foreachBatch``:

    seeds dir (text files) ──readStream──► S1 parse (trim, skip blanks/#)
        ──X4 expand (Arrow UDF) ──root stamp──► append to frontier inbox

The engine picks the inbox up at its next round boundary (union +
canonical dedup), so streaming ingest composes with checkpoint/resume —
the inbox append is idempotent per micro-batch (batch-id-named files).
At scale the inbox is partitioned by ingest batch; no shuffle happens on
the stream path (explode + projection only, map-side).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import udfs
from ..plans.crawl import FRONTIER_SCHEMA


def parse_seed_lines(raw: DataFrame) -> DataFrame:
    """S1 semantics (assembler.go:121-126): trim; drop blanks and
    ``#``-comment lines. Input: one ``value:string`` column."""
    line = F.trim(F.col("value"))
    return (raw.select(line.alias("seed"))
            .filter((F.col("seed") != "") & ~F.col("seed").startswith("#")))


def expand_to_frontier(seeds: DataFrame) -> DataFrame:
    """X4 fan-out + root stamp + depth=0 (crawl_usecase.go:237-263 quirks:
    depth hardcoded 0, root falls back to the host itself on PSL error)."""
    hosts = seeds.select(
        F.explode(udfs.udf_expand_domain("seed")).alias("host"))
    return hosts.select(
        "host",
        F.coalesce(udfs.udf_get_root("host"), F.col("host")).alias("root"),
        F.lit(0).cast("int").alias("depth"),
    )


def start_seed_ingest(
    spark: SparkSession,
    seeds_dir: str,
    inbox_dir: str,
    checkpoint_dir: str,
):
    """Start the streaming query: text files in ``seeds_dir`` → expanded
    frontier rows appended under ``inbox_dir``. Returns the StreamingQuery.
    """
    raw = spark.readStream.format("text").load(seeds_dir)
    frontier = expand_to_frontier(parse_seed_lines(raw))

    def sink(batch: DataFrame, batch_id: int) -> None:
        (batch.coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(inbox_dir, f"batch={batch_id}")))

    return (frontier.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def drain_inbox(spark: SparkSession, inbox_dir: str) -> DataFrame | None:
    """Read everything the stream has appended (None if nothing yet); the
    engine unions this with its current frontier at a round boundary."""
    if not os.path.isdir(inbox_dir) or not os.listdir(inbox_dir):
        return None
    df = spark.read.schema(FRONTIER_SCHEMA).parquet(inbox_dir + "/batch=*")
    return df
