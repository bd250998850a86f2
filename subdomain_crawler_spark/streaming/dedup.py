"""Streaming seen-filter — the crawler's D1 as a stateful streaming operator.

The reference's seen-set is a mutable in-process bloom filter
(/root/reference/pkg/infrastructure/storage/bloom_filter.go); the batch
engine replays it as an anti-join + broadcast bloom bank (operators/seen.py).
This module is the STREAMING form: a continuous candidate stream is deduped
against state that persists across micro-batches and restarts — the
``applyInPandasWithState`` custom-stateful-operator pattern from the brief.

Shape:

    candidates ──groupBy(shard = xxhash64(host) % S)──►
        applyInPandasWithState(per-shard seen-set state) ──► novel rows only

* State is partitioned by a hash shard key, NOT by host: state rows stay
  bounded (S entries) and each shard's set grows with its share of the
  keyspace — the same sharding the broadcast bloom bank uses.
* Within a micro-batch the operator also dedups batch-internal repeats
  (first occurrence wins, like D2).
* Exactness: state stores the exact host set per shard. At 10^10 hosts the
  production variant swaps the array state for serialized bloom shard bytes
  (operators/seen.ShardedSeenFilter.to_bytes_list) — constant memory per
  shard at the cost of false-positive DROPS of genuinely-novel hosts;
  exact state is the semantics-preserving default and what the tests pin.
* Restart safety: GroupState rides the streaming checkpoint, so a second
  ``availableNow`` run over the same checkpoint resumes the seen set —
  test_streaming_dedup proves cross-run dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("root", StringType()),
    StructField("depth", IntegerType()),
])

STATE_SCHEMA = StructType([StructField("hosts", ArrayType(StringType()))])


def _dedup_shard(key, pdfs, state):
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        batch = pdf.drop_duplicates("host")          # D2: within-batch
        novel = batch[~batch["host"].isin(seen)]     # D1: vs state
        if len(novel):
            seen.update(novel["host"].tolist())
            yield novel[["host", "root", "depth"]]
    state.update((sorted(seen),))


def streaming_seen_filter(candidates: DataFrame, shards: int = 32) -> DataFrame:
    """Candidates (host, root, depth) stream → novel-only stream."""
    sharded = candidates.withColumn(
        "shard", F.pmod(F.xxhash64("host"), F.lit(shards)).cast("long"))
    return (sharded.groupBy("shard")
            .applyInPandasWithState(
                _dedup_shard,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf="NoTimeout"))
