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


def test_sessionize_salted_parity(spark):
    """The salted two-phase sessionize (operators/sessions.py — hot-user
    scale form) must equal the single-window shape ROW FOR ROW on skewed
    data, across bucket sizes both larger and smaller than the gap
    (bucket < gap exercises the sparse-bucket boundary merge through the
    previous NON-EMPTY bucket)."""
    import datetime as dt

    import pandas as pd
    from subdomain_crawler_spark.operators import sessions

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    eid = 0
    # hot user 1: 3 days of events — dense 5-min runs with occasional
    # >30-min breaks, plus exact-boundary gaps (== gap, and gap+1us)
    t = t0
    for i in range(400):
        step = (dt.timedelta(minutes=5) if i % 7 else
                dt.timedelta(minutes=31))
        if i == 100:
            step = dt.timedelta(seconds=1800)                  # == gap: same session
        if i == 200:
            step = dt.timedelta(seconds=1800, microseconds=1)  # > gap: new session
        t = t + step
        rows.append((1, eid, t)); eid += 1
    # normal users: few events each, some spanning midnight boundaries
    for u in range(2, 12):
        for k in range(5):
            rows.append((u, eid, t0 + dt.timedelta(hours=23, minutes=50 + u)
                         + dt.timedelta(minutes=20 * k))); eid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_id", "ts"]))

    want = sorted(map(tuple, sessions.sessionize_simple(df).collect()))
    for bucket_us in (86_400_000_000,      # 1 day  (bucket >> gap)
                      3_600_000_000,       # 1 hour (bucket 2x gap)
                      900_000_000):        # 15 min (bucket < gap!)
        got = sorted(map(tuple,
                         sessions.sessionize_salted(
                             df, bucket_us=bucket_us).collect()))
        assert got == want, f"bucket_us={bucket_us}"


def test_a2_rates_partial_aggregate(spark):
    """A2 rates is a tumbling-window groupBy: two HashAggregates around one
    exchange (map-side combine — per-bucket partials collapse before the
    shuffle; the shuffled key space is (bucket, event_type), which grows
    with time span, not row count)."""
    p = plan(dq.q_a2_rates(spark, SF))
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") <= 2
    assert "Window" not in p  # tumbling window = project + group, no W-node


def test_sessionize_salted_phase2_is_aggregated(spark):
    """The salted sessionize's cross-bucket reconciliation window must read
    the per-(user, bucket) AGGREGATE, not the event stream: the plan has a
    partial-aggregated groupBy feeding the phase-2 Window, and the heavy
    phase-1 Window partitions by (user_id, bkt) — never by user_id alone."""
    from subdomain_crawler_spark.operators import sessions

    e = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "event_id", "ts")
    p = plan(sessions.sessionize_salted(e))
    assert "partial_min" in p or "partial_max" in p  # phase-2 input is an agg
    # phase-1 window keys: user_id AND bkt (hot-user shard key present)
    import re
    wspecs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
    assert wspecs, p
    assert any("bkt" in w and "user_id" in w for w in wspecs)


def test_corpus_filter_split_parity(spark, fixture_web, tmp_path,
                                    monkeypatch):
    """A flagged giant round-0 frontier splits on the corpus∪dns
    membership bloom (config.corpus_filter): definite non-members bypass
    the join with null columns. The split output must equal the unsplit
    join ROW FOR ROW (false positives take the join path; misses
    synthesize exactly the failed-left-join row), the written frontier
    table must NOT carry the flag, and an over-capacity corpus must
    discard the bank and fall back to the plain unflagged path."""
    from subdomain_crawler_spark.config import CrawlConfig
    from subdomain_crawler_spark.plans import crawl as crawl_mod
    from subdomain_crawler_spark.plans.crawl import CrawlEngine

    # force the giant regime on the tiny fixture seed list
    monkeypatch.setattr(crawl_mod, "BROADCAST_FRONTIER_MAX", 10)

    base = fixture_web["base"]
    corpus = spark.read.parquet(f"{base}/corpus.parquet")
    dns = spark.read.parquet(f"{base}/dns.parquet")

    eng = CrawlEngine(spark,
                      CrawlConfig(honor_robots=False, corpus_filter=True),
                      str(tmp_path / "on"), corpus, dns)
    eng.start(fixture_web["seeds"])
    assert eng._f0_flagged and eng._corpus_bank_state is True
    f_cached = eng._frontier0
    assert "_in_corpus" in f_cached.columns
    f_disk = eng.io.read_round("frontier", 0)
    assert "_in_corpus" not in f_disk.columns  # table schema unchanged

    def rows(df):
        return sorted(map(tuple, df.collect()))

    plain = rows(eng._join_frontier(f_disk, small_round=False))
    split = rows(eng._join_frontier(f_cached, small_round=False,
                                    flagged=True))
    assert split == plain
    # the fan-out frontier must contain genuine non-members for the test
    # to exercise the bypass branch at all
    n_members = corpus.select("host").unionByName(dns.select("host")) \
                      .distinct().count()
    assert f_disk.count() > n_members

    # over-capacity corpus → bank discarded, unflagged frontier
    eng2 = CrawlEngine(spark,
                       CrawlConfig(honor_robots=False, corpus_filter=True,
                                   corpus_bloom_capacity=1),
                       str(tmp_path / "off"), corpus, dns)
    eng2.start(fixture_web["seeds"])
    assert eng2._corpus_bank_state is False and not eng2._f0_flagged
    assert "_in_corpus" not in eng2._frontier0.columns


def test_round_table_codec_default_zstd(spark, tmp_path, monkeypatch):
    """The scratch-tier write default is zstd (BENCH §3e codec A/B); the
    lever still selects others and "spark" restores the session codec."""
    import glob

    from subdomain_crawler_spark.sources.tableio import ParquetSnapshotIO

    df = spark.range(10).selectExpr("cast(id as string) as host")
    io = ParquetSnapshotIO(spark, str(tmp_path / "w"))
    monkeypatch.delenv("SPARK_GRAFT_LOG_CODEC", raising=False)
    io.append("t", df, 0)
    assert glob.glob(io.round_dir("t", 0) + "/*.zstd.parquet")
    monkeypatch.setenv("SPARK_GRAFT_LOG_CODEC", "lz4")
    io.append("t", df, 1)
    assert glob.glob(io.round_dir("t", 1) + "/*.lz4*.parquet")  # lz4hadoop
    monkeypatch.setenv("SPARK_GRAFT_LOG_CODEC", "spark")
    io.append("t", df, 2)
    assert glob.glob(io.round_dir("t", 2) + "/*.snappy.parquet")
    # round-trip: the engine reads its own rounds regardless of codec
    assert io.read_upto("t", 2).count() == 30


def test_ann_ivf_arrow_parity(spark):
    """The large-k Arrow argmax kernel is BIT-EQUAL to the oracle-pinned
    literal-expression path (the q_ann_ivf docstring's contract): same
    cell for every vector and the same final top-k, at the default k=16
    and at a k above the literal/Arrow threshold, on the sf0.1 embeddings
    — the kernel emulates the literal path's arithmetic exactly
    (f32 products, sequential f64 fold, HALF_UP round; _ivf_scores_np)."""
    sf = "/root/testdata/sf0.1"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")

    for k in (16, dq._IVF_LITERAL_MAX_K + 8):
        cents = (e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= k))
                 .select("vec_id", "embedding").orderBy("vec_id").collect())
        cmat = [list(map(float, r["embedding"])) for r in cents]
        cids = [int(r["vec_id"]) for r in cents]
        vectors = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")

        lit = dq._ivf_cells_literal(
            vectors, F.lit(cmat).cast("array<array<float>>"),
            F.lit(cids).cast("array<long>"))
        arw = dq._ivf_cells_arrow(vectors, cmat, cids)
        cells_lit = {r["vec_id"]: r["cell"]
                     for r in lit.select("vec_id", "cell").collect()}
        cells_arw = {r["vec_id"]: r["cell"]
                     for r in arw.select("vec_id", "cell").collect()}
        assert cells_lit == cells_arw, f"cell assignment diverged at k={k}"

        # end-to-end: the full query returns identical rows on both paths
        rows_lit = [tuple(r) for r in
                    dq.q_ann_ivf(spark, sf, k=k, use_arrow=False).collect()]
        rows_arw = [tuple(r) for r in
                    dq.q_ann_ivf(spark, sf, k=k, use_arrow=True).collect()]
        assert rows_lit == rows_arw, f"top-k diverged at k={k}"


def test_ann_recall_matches_python_recomputation(spark):
    """q_ann_recall (round 9): the recall row equals the set intersection
    of the two underlying top-k queries recomputed in python, and is a
    valid proportion of k."""
    sf = "/root/testdata/sf0.01"
    exact = {r["vec_id"] for r in dq.q_cosine_topk(spark, sf).collect()}
    ivf = {r["vec_id"] for r in dq.q_ann_ivf(spark, sf).collect()}
    [row] = dq.q_ann_recall(spark, sf).collect()
    assert row["k"] == dq._IVF_TOPK
    assert row["n_hits"] == len(exact & ivf)
    assert row["recall_at_k"] == round(len(exact & ivf) / dq._IVF_TOPK, 4)
    assert 0 <= row["n_hits"] <= dq._IVF_TOPK


def test_ann_ivf_threshold_selects_arrow():
    """q_ann_ivf defaults to the Arrow argmax path at every k (round 11 —
    the literal path measured 10× slower warm; bit-parity is pinned by
    test_ann_ivf_arrow_parity and the driver-green ann_ivf_arrow row)."""
    import inspect

    sig = inspect.signature(dq.q_ann_ivf)
    assert sig.parameters["k"].default == dq._IVF_K
    assert sig.parameters["use_arrow"].default is None  # None → Arrow


def test_pair_cos4_parity(spark):
    """The Arrow pair-cosine kernel (_pair_cos4_np / _udf_pair_cos4) is
    BIT-EQUAL to the literal `_cos4` zip_with/aggregate expression it
    replaced on every pair-scoring path (round 11): same rounded value for
    every (vector, query) pair of the sf0.1 embeddings — f32 products,
    sequential f64 fold, HALF_UP round."""
    sf = "/root/testdata/sf0.1"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    j = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    lit = {r["vec_id"]: r["c"] for r in j.select(
        "vec_id", dq._cos4("embedding", F.col("qv")).alias("c")).collect()}
    arw = {r["vec_id"]: r["c"] for r in j.select(
        "vec_id",
        dq._udf_pair_cos4("embedding", "qv").alias("c")).collect()}
    assert lit == arw
