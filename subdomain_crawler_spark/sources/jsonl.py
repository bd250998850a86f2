"""JSONL result export with the reference's external schema.

The reference writes one JSON object per line via ``json.Encoder``
(/root/reference/pkg/infrastructure/storage/writer.go:33-38) with the
``CrawlResult`` field set (entity/domain.go:20-30):

    domain, ips, subdomains, status, status_code, title, content_length,
    error (OMITTED when empty — ``json:"error,omitempty"``), timestamp

Artifact pins (reference result.jsonl): line 1 carries no ``error`` key on a
success; line 2 shows the raw status-line passthrough ``"status":"200 "``.

Differences, documented:

* the reference's line order is completion order (racy goroutines); the
  canonical export order here is ``(round, domain)`` — the only
  cross-implementation-stable order (SURVEY.md §3.4);
* offline builds have no real fetch times, so ``timestamp`` is synthesized
  deterministically as ``epoch + round`` seconds (RFC3339, UTC) — callers on
  a real cluster pass ``epoch=None`` to stamp the export wall-clock time.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference field order (entity/domain.go:21-29); Spark's JSON writer emits
# keys in column order and drops nulls (ignoreNullFields default true) —
# which reproduces Go's omitempty exactly
_FIELDS = ["domain", "ips", "subdomains", "status", "status_code", "title",
           "content_length", "error", "timestamp"]

_RFC3339 = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def results_to_jsonl_df(results: DataFrame, epoch: float | None = None) -> DataFrame:
    """Project the engine's results table into the reference JSONL schema."""
    if epoch is None:
        epoch = time.time()
    ts = F.timestamp_seconds(F.lit(float(epoch)) + F.col("round"))
    return results.select(
        "domain", "ips", "subdomains", "status", "status_code", "title",
        "content_length",
        # null error → key omitted (Go omitempty twin)
        F.when(F.col("error").isNotNull() & (F.col("error") != ""),
               F.col("error")).alias("error"),
        F.date_format(ts, _RFC3339).alias("timestamp"),
        "round",
    )


def export_log_jsonl(log: DataFrame, path: str) -> None:
    """Export an http_log/dns_log table as one JSONL file (S3/S4 twins of
    writer.go:66-100), canonically ordered by (round, host) — null fields
    (e.g. status_code on failed attempts) are omitted per Go omitempty."""
    tmp = tempfile.mkdtemp(prefix="jsonl_log_")
    try:
        order = [c for c in ("round", "host", "proto") if c in log.columns]
        log.orderBy(*order).coalesce(1).write.mode("overwrite").json(tmp)
        part = sorted(glob.glob(os.path.join(tmp, "part-*")))
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if part:
            shutil.move(part[0], path)
        else:
            open(path, "w").close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def export_results_jsonl(results: DataFrame, path: str,
                         epoch: float | None = None,
                         single_file: bool = True) -> None:
    """Write the results table as reference-schema JSONL.

    ``single_file=True`` mirrors the reference's one-file contract (sorted by
    the canonical (round, domain) order, coalesced, part-file renamed into
    place) — fine for crawl outputs, which are tiny relative to the corpus.
    ``single_file=False`` keeps a distributed .json directory for at-scale
    exports.
    """
    df = results_to_jsonl_df(results, epoch)
    out = df.orderBy("round", "domain").drop("round")
    if not single_file:
        out.write.mode("overwrite").json(path)
        return
    tmp = tempfile.mkdtemp(prefix="jsonl_export_")
    try:
        out.coalesce(1).write.mode("overwrite").json(tmp)
        part = sorted(glob.glob(os.path.join(tmp, "part-*")))
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if part:
            shutil.move(part[0], path)
        else:  # zero-row result set still produces a valid (empty) file
            open(path, "w").close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
