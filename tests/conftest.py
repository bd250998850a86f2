from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("subdomain-crawler-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_web(tmp_path_factory):
    """Deterministic synthetic web (scale=1) written once per session."""
    from subdomain_crawler_spark.sources import fixtures

    tables = fixtures.make_web(scale=1, seed=42)
    base = str(tmp_path_factory.mktemp("web"))
    fixtures.write_parquet(tables, base)
    return {"tables": tables, "base": base,
            "seeds": list(tables["seeds"]["seed"])}
