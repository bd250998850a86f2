"""M2/M3 — end-to-end equivalence: CrawlEngine (Spark) vs ReferenceSimulator.

SURVEY.md §5.3: (a) exact seen-set equality, (b) per-round frontier-set
equality under synchronized-BFS, (c) result rows match after canonical sort,
(d) per-round metrics equality. Run twice: with and without the bloom
pre-filter, which must never change results (SURVEY.md §7 "exact-vs-bloom").
"""

from __future__ import annotations

import pandas as pd
import pytest

from subdomain_crawler_spark.config import CrawlConfig
from subdomain_crawler_spark.plans.crawl import CrawlEngine
from subdomain_crawler_spark.plans.reference_sim import ReferenceSimulator


def _run_engine(spark, fixture_web, tmp_path, cfg):
    base = fixture_web["base"]
    corpus = spark.read.parquet(f"{base}/corpus.parquet")
    dns = spark.read.parquet(f"{base}/dns.parquet")
    eng = CrawlEngine(spark, cfg, str(tmp_path / "crawl"), corpus, dns, robots=None)
    stats = eng.run(seeds=fixture_web["seeds"], max_rounds=10)
    return eng, stats


def _sim(fixture_web, cfg):
    t = fixture_web["tables"]
    return ReferenceSimulator(t["corpus"], t["dns"], cfg).run(
        fixture_web["seeds"], max_rounds=10)


@pytest.fixture(scope="module", params=[False, True], ids=["exact", "bloom"])
def crawl_pair(request, spark, fixture_web, tmp_path_factory):
    cfg = CrawlConfig(use_bloom_prefilter=request.param, honor_robots=False,
                      bloom_min_seen=0)  # force the bank on at fixture scale
    eng, stats = _run_engine(spark, fixture_web,
                             tmp_path_factory.mktemp(f"run{request.param}"), cfg)
    sim = _sim(fixture_web, cfg)
    return eng, stats, sim


def test_round_count_matches(crawl_pair):
    eng, stats, sim = crawl_pair
    assert len(stats) == len(sim.frontiers)


def test_frontier_sets_per_round(crawl_pair):
    eng, stats, sim = crawl_pair
    for r, sim_rows in enumerate(sim.frontiers):
        got = {
            (x.host, x.root, x.depth)
            for x in eng.io.read_round("frontier", r).collect()
        }
        assert got == set(sim_rows), f"round {r} frontier mismatch"


def test_seen_set_equality(crawl_pair):
    eng, stats, sim = crawl_pair
    got = {
        x.host
        for x in eng.io.read_upto("seen", len(stats) - 1).collect()
    }
    assert got == set(sim.seen)


def test_results_match_golden(crawl_pair):
    eng, stats, sim = crawl_pair
    got = (
        eng.io.read_upto("results", len(stats) - 1)
        .toPandas()
        .sort_values(["round", "domain"])
        .reset_index(drop=True)
    )
    want = sim.results.sort_values(["round", "domain"]).reset_index(drop=True)
    assert len(got) == len(want)
    for col in ["round", "domain", "status", "status_code", "title",
                "content_length"]:
        pd.testing.assert_series_equal(
            got[col], want[col], check_dtype=False, check_names=False,
            obj=f"results.{col}")
    # list/nullable columns compared row-wise
    for i in range(len(got)):
        assert list(got["subdomains"][i]) == list(want["subdomains"][i]), \
            f"subdomains mismatch at {want['domain'][i]} (round {want['round'][i]})"
        assert list(got["ips"][i]) == list(want["ips"][i])
        g_err, w_err = got["error"][i], want["error"][i]
        assert (g_err is None or pd.isna(g_err)) == (w_err is None), \
            f"error mismatch at {want['domain'][i]}"


def test_metrics_match(crawl_pair):
    eng, stats, sim = crawl_pair
    want = sim.metrics
    for st in stats:
        row = want[want["round"] == st.round].iloc[0]
        for k in ["tasks_processed", "tasks_enqueued", "http_requests",
                  "dns_requests", "success_count", "error_count",
                  "unique_subdomains"]:
            assert getattr(st, k) == row[k], f"round {st.round} metric {k}"


def test_log_volumes_match(crawl_pair):
    eng, stats, sim = crawl_pair
    last = len(stats) - 1
    assert eng.io.read_upto("http_log", last).count() == len(sim.http_log)
    assert eng.io.read_upto("dns_log", last).count() == len(sim.dns_log)


def test_depth4_host_seen_but_never_crawled(crawl_pair):
    """The F4-after-D1 quirk: toodeep.* enters the seen set, never a frontier."""
    eng, stats, sim = crawl_pair
    deep = "toodeep.deep.cs.lab.hotuni.edu.cn"
    assert deep in sim.seen
    seen = {x.host for x in eng.io.read_upto("seen", len(stats) - 1).collect()}
    assert deep in seen
    for r in range(len(stats)):
        hosts = {x.host for x in eng.io.read_round("frontier", r).collect()}
        assert deep not in hosts
