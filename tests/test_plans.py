"""Physical-plan shape assertions — the scale contract, checked in CI.

These pin the properties that make the 100 TB story true: filters reach the
parquet scan, small sides broadcast, the extraction UDF is Arrow-evaluated,
and nothing silently degenerates into a cartesian or a dropped hint.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from subdomain_crawler_spark.plans import driver_queries as dq

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity"))
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in p
    # column pruning: only the two projected columns are read
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_tpch_q3_broadcasts_dimension(spark):
    p = plan(dq.q_tpch_q3(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_semi_join_is_broadcast(spark):
    p = plan(dq.q_j3_semi_join(spark, SF))
    assert "BroadcastHashJoin" in p and "LeftSemi" in p


def test_extraction_is_arrow_eval(spark):
    p = plan(dq.q_fingerprint64(spark, SF))
    assert "ArrowEvalPython" in p  # vectorized pandas UDF, not BatchEvalPython
    assert "BatchEvalPython" not in p


def test_anti_join_shape(spark):
    p = plan(dq.q_d1_anti_join(spark, SF))
    assert "LeftAnti" in p


def test_q1_map_side_partial_aggregate(spark):
    """Two HashAggregates around one exchange = map-side combine before the
    single shuffle (WholeStageCodegen spans only show post-AQE-finalization,
    so the structural partial-agg shape is what CI pins)."""
    p = plan(dq.q_tpch_q1(spark, SF))
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") <= 2  # one shuffle (+AQE reuse marker at most)


def test_dedup_frontier_partial_aggregate(spark):
    """Frontier dedup is a groupBy+min-struct (map-side combine collapses a
    hot host's duplicates before the shuffle), not a window row_number
    (which would ship every duplicate to one task)."""
    from subdomain_crawler_spark.plans.crawl import CrawlEngine

    df = spark.createDataFrame(
        [("a.com", "a.com", 1), ("a.com", "a.com", 2)],
        "host string, root string, depth int")
    p = plan(CrawlEngine._dedup_frontier(df))
    # struct-min lowers to SortAggregate; partial_min = map-side combine
    assert "partial_min" in p
    assert "Window" not in p


def test_politeness_robots_join_broadcasts(spark, fixture_web):
    """The robots table joins broadcast (tiny dim vs 10^10-row frontier)."""
    from subdomain_crawler_spark.config import CrawlConfig
    from subdomain_crawler_spark.operators.politeness import apply_budgets

    base = fixture_web["base"]
    frontier = spark.createDataFrame(
        [("www.a.com", "a.com", 0)], "host string, root string, depth int")
    robots = spark.read.parquet(f"{base}/robots.parquet")
    scheduled, deferred = apply_budgets(
        frontier, robots, CrawlConfig(honor_robots=True))
    p = plan(scheduled)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_crawl_fetch_join_broadcasts_frontier(spark, fixture_web, tmp_path):
    """The small-round join chain must keep every join broadcast — the
    corpus/dns tables stream through broadcast-inner extracts and the
    frontier LEFT-joins the broadcast extracts: zero frontier shuffles, no
    SortMergeJoin anywhere (a dropped hint here silently shuffles the
    100 TB side). Giant rounds must instead be a shuffle join chain with no
    broadcast of the frontier (a 10^10-row broadcast would kill the
    driver)."""
    from subdomain_crawler_spark.config import CrawlConfig
    from subdomain_crawler_spark.plans.crawl import CrawlEngine

    base = fixture_web["base"]
    eng = CrawlEngine(spark, CrawlConfig(honor_robots=False),
                      str(tmp_path / "c"),
                      spark.read.parquet(f"{base}/corpus.parquet"),
                      spark.read.parquet(f"{base}/dns.parquet"))
    eng.start(fixture_web["seeds"])
    f = eng.io.read_round("frontier", 0)

    p = plan(eng._join_frontier(f, small_round=True))
    assert p.count("BroadcastHashJoin") >= 4  # 2 extracts + 2 left joins
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    # disable auto-broadcast so the tiny fixture corpus doesn't mask the
    # giant-round plan shape (at 10^10 rows nothing auto-broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p_big = plan(eng._join_frontier(f, small_round=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in p_big
    assert "BroadcastHashJoin" not in p_big
