"""Local stand-in for the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf=0.01, compare row count, column
names, and an order-insensitive value hash.

Usage:  python tests/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(canon_value(df.iloc[i][c]) for c in cols)
        for i in range(len(df))
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main(names: list[str] | None = None) -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle — rows-only)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        g = frame_hash(got)
        w = frame_hash(want)
        ok = g == w
        # the lenient canon_value collapses 5.0 -> 5, which MASKED the
        # round-3 sessionize red row (DuckDB HUGEINT -> pandas float64 vs
        # Spark int64; the driver's canonicalizer keeps the '.0').  Treat a
        # numeric-KIND mismatch as a failure even when the hashes agree.
        for c in set(got.columns) & set(want.columns):
            gk = getattr(got[c].dtype, "kind", "O")
            wk = getattr(want[c].dtype, "kind", "O")
            if {gk, wk} == {"i", "f"} or {gk, wk} == {"u", "f"}:
                ok = False
                print(f"FAIL  {name}: column '{c}' dtype kind mismatch "
                      f"spark={got[c].dtype} vs duck={want[c].dtype} "
                      f"(driver canonicalizer would hash-mismatch)")
        if not ok:
            failures += 1
            print(f"FAIL  {name}: spark(rows={g[0]}, cols={g[1]}, h={g[2]}) "
                  f"vs duck(rows={w[0]}, cols={w[1]}, h={w[2]})")
            if g[0] == w[0] and g[1] == w[1]:
                gs = got.sort_values(sorted(got.columns)).reset_index(drop=True)
                ws = want.sort_values(sorted(want.columns)).reset_index(drop=True)
                for i in range(min(len(gs), 2000)):
                    rg = "|".join(canon_value(gs.iloc[i][c]) for c in sorted(gs.columns))
                    rw = "|".join(canon_value(ws.iloc[i][c]) for c in sorted(ws.columns))
                    if rg != rw:
                        print(f"      first diff row {i}:\n      spark: {rg}\n      duck : {rw}")
                        break
        else:
            print(f"OK    {name}: rows={g[0]} hash={g[2]}")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:] or None))
