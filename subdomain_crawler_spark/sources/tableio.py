"""TableIO — snapshot-committed table seam (Iceberg-shaped, parquet-backed).

The north rule asks for Iceberg snapshots; this container has no Iceberg
runtime jar (verified: /opt/spark/jars has none, no network), so the same
seam is implemented as parquet round-directories plus an atomically-renamed
JSON manifest. Swap ``ParquetSnapshotIO`` for an Iceberg-backed twin
(``writeTo().append()`` / ``VERSION AS OF``) on a real cluster — the engine
only talks to this interface.

Layout:
    base/<table>/round=<N>/*.parquet      one atomic append per round
    base/_manifest.json                   {"committed_round": N, "tables": [...]}

Commit protocol (single-writer, the driver loop): write every table's
``round=N`` directory, then rename ``_manifest.json.tmp`` → ``_manifest.json``.
A crash between writes leaves uncommitted round dirs that readers ignore —
exact-resume semantics (reference analog: the racy 16-second bloom dump,
/root/reference/pkg/application/crawl_usecase.go:192-208, made atomic here).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ParquetSnapshotIO:
    spark: SparkSession
    base: str

    # -- manifest -----------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.base, "_manifest.json")

    def committed_round(self) -> int:
        """Highest committed round, or -1 if no commit yet."""
        try:
            with open(self._manifest_path()) as f:
                return int(json.load(f)["committed_round"])
        except (FileNotFoundError, KeyError, ValueError):
            return -1

    def commit_round(self, round_no: int, extra: dict | None = None) -> None:
        os.makedirs(self.base, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        payload = {"committed_round": round_no, **(extra or {})}
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._manifest_path())  # atomic on POSIX

    def manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    # -- table append / read -------------------------------------------------

    def round_dir(self, table: str, round_no: int) -> str:
        return os.path.join(self.base, table, f"round={round_no}")

    def append(self, table: str, df: DataFrame, round_no: int) -> None:
        # Write-tier levers (A/B'd in BENCH/BASELINE.md; defaults measured):
        # SPARK_GRAFT_LOG_CODEC overrides the parquet codec for these
        # scratch-tier round tables (snappy default; lz4/zstd/uncompressed —
        # the encode pass is a memory-bus pass, the binding resource of the
        # write wave); SPARK_GRAFT_LOG_DICT=0 disables dictionary encoding
        # (host/url columns are mostly-unique, so the dictionary build is a
        # wasted hash+copy pass that falls back to plain anyway).
        w = df.write.mode("overwrite")
        codec = os.environ.get("SPARK_GRAFT_LOG_CODEC", "")
        if codec:
            w = w.option("compression", codec)
        if os.environ.get("SPARK_GRAFT_LOG_DICT", "1") == "0":
            w = w.option("parquet.enable.dictionary", "false")
        w.parquet(self.round_dir(table, round_no))

    def read_round(self, table: str, round_no: int) -> DataFrame:
        return self.spark.read.parquet(self.round_dir(table, round_no))

    def read_upto(self, table: str, round_no: int) -> DataFrame | None:
        """Union of all committed rounds ≤ round_no (None if none exist)."""
        dirs = [
            self.round_dir(table, r)
            for r in range(round_no + 1)
            if os.path.isdir(self.round_dir(table, r))
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def exists(self, table: str, round_no: int) -> bool:
        return os.path.isdir(self.round_dir(table, round_no))

    def append_local(self, table: str, pdf, round_no: int) -> None:
        """Driver-side append for tiny tables (e.g. the one-row metrics
        record): plain pyarrow write, no Spark job. The layout is identical
        to ``append`` so ``read_round``/``read_upto`` see one table."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = self.round_dir(table, round_no)
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(d, "part-00000.parquet"))
