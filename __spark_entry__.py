"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl-style pipeline at sf0.001; ``queries`` /
``oracle_sql`` expose every SQL-expressible operator from SURVEY.md §2 plus
the training-data pipeline ops, implemented in
``subdomain_crawler_spark/plans/driver_queries.py`` (Spark) with DuckDB
oracles generated from the same Python constants.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from subdomain_crawler_spark.plans import driver_queries as dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one crawl-shaped round over sf0.001 — synthesize page text
    from ``documents``, extract hostnames (X1, Arrow UDF), canonical-dedup
    against a seen set (D1 left_anti), count discoveries per host."""
    from pyspark.sql import functions as F

    from subdomain_crawler_spark.functions import udfs

    sf_dir = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = d.select(
        "doc_id",
        F.concat(F.lit("Visit "), "source", F.lit(".example.com and mirror "),
                 "lang", F.lit(".example.org <title>doc </title>")).alias("body"),
    )
    cands = (pages
             .withColumn("hosts", udfs.udf_extract_hosts("body"))
             .select("doc_id", F.explode("hosts").alias("host")))
    seen = cands.filter(F.col("doc_id") % 5 == 0).select("host").distinct()
    novel = cands.join(seen, "host", "left_anti")
    return (novel.groupBy("host")
            .agg(F.count(F.lit(1)).alias("mentions"))
            .orderBy(F.desc("mentions"), "host"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + pipeline ops."""
    return dict(dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracles for EVERY query in ``queries()`` — the
    seeded-sketch kernels (fingerprint/minhash/simhash/LSH bands) were
    designed SQL-portable (polynomial folds mod Mersenne primes, md5 band
    hashing) so even they get exact value-hash checks."""
    return dq.oracles()
