"""Redirect-chain resolution over the corpus table — the offline twin of
the reference's HTTP client redirect following (fetcher.go:33-38: Go's
``CheckRedirect`` errors once ``len(via) >= 10``, i.e. redirects 1-9 are
followed and the 10th is refused with "too many redirects").

The corpus models a redirect as a row whose ``status_code`` is 3xx and
whose ``redirect_to`` column names the target HOST (scheme-less — the
synthetic web defines redirect hops as always-connectable when the target
row exists; a missing target row is a dead host, i.e. "connection
refused" mid-chain, exactly as for a missing source).

Spark-first design: because the corpus is STATIC for a crawl, chains are
resolved ONCE per crawl as a graph closure over the (tiny) 3xx-source
subset — zero per-round cost beyond one left join of the meta projection
against the resolution table.  The closure uses pointer doubling: each
round composes every chain with the chain starting at its current
endpoint, so reach grows 1 → 2 → 4 → 8 → 16 hops in 4 self-joins — enough
to exactly classify the 10-request cap (success needs ≤ 9 follows; any
chain still unterminated at 16 hops, cycles included, is "too many
redirects").  Hop counts are exact sums until termination, so the ≤ 9
threshold is decided exactly, matching the per-request loop of the
simulator twin (plans/reference_sim.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Go stdlib semantics (fetcher.go:33-38): CheckRedirect(req, via) errors at
# len(via) >= 10; via holds i requests when redirect i is attempted, so
# follows 1..9 succeed and follow 10 is refused.
MAX_FOLLOWS = 9
TOO_MANY = "too many redirects"
REFUSED = "connection refused"

# 2^4 = 16 > MAX_FOLLOWS + 1: four doubling rounds classify every chain
_DOUBLING_ROUNDS = 4


def resolve_redirects(meta: DataFrame) -> DataFrame:
    """Resolve every redirect SOURCE row of ``meta`` (columns: host,
    status_code, content_length, redirect_to) to its terminal state.

    Returns DataFrame(host, content_host, final_status, final_content_length,
    fetch_error) — one row per 3xx+redirect_to source host only:

    * terminal reached in ≤ 9 follows and terminal row exists →
      content_host/final_status/final_content_length from the terminal row
      (the response Go's client returns for the source URL), fetch_error
      null.  A terminal 3xx-without-redirect_to row is a valid terminal
      (its 3xx is returned as-is, not fetched).
    * > 9 follows needed (long chains AND cycles) → fetch_error
      "too many redirects".
    * chain walks onto a host with no corpus row within the cap →
      fetch_error "connection refused" (dead hop).

    When fetch_error is non-null the terminal columns are NULL — a failed
    chain reached no terminal, so a mid-chain endpoint's status/length must
    not masquerade as one (round-5 ADVICE: the contract implied the fields
    describe a successfully reached terminal).
    """
    is3xx = (F.col("status_code") >= 300) & (F.col("status_code") < 400)
    chains = (meta.filter(is3xx & F.col("redirect_to").isNotNull())
              .select("host", F.col("redirect_to").alias("cur"),
                      F.lit(1).cast("int").alias("hops")))
    for _ in range(_DOUBLING_ROUNDS):
        jump = chains.select(F.col("host").alias("jh"),
                             F.col("cur").alias("jcur"),
                             F.col("hops").alias("jhops"))
        # endpoint still a source → compose both half-chains; else terminal
        chains = (chains.join(jump, chains["cur"] == jump["jh"], "left")
                  .select("host",
                          F.coalesce("jcur", "cur").alias("cur"),
                          (F.col("hops") + F.coalesce("jhops", F.lit(0)))
                          .alias("hops")))
    # classify: still-a-source endpoints (cycles / >16-chains) are caught by
    # hops >= 16 > MAX_FOLLOWS + 1, no extra membership join needed
    terminal = meta.select(F.col("host").alias("_th"),
                           F.col("status_code").alias("_tstatus"),
                           F.col("content_length").alias("_tclen"))
    err = (F.when(F.col("hops") > MAX_FOLLOWS, F.lit(TOO_MANY))
           .when(F.col("_th").isNull(), F.lit(REFUSED)))
    out = (chains.join(terminal, chains["cur"] == terminal["_th"], "left")
           .select(
               "host",
               F.when(err.isNull(), F.col("cur")).alias("content_host"),
               F.when(err.isNull(), F.col("_tstatus")).alias("final_status"),
               F.when(err.isNull(), F.col("_tclen"))
                .alias("final_content_length"),
               err.alias("fetch_error")))
    # NOTE the closure plan references `chains` twice per doubling round —
    # 2^4 copies of the source subtree.  Callers should materialize the
    # (tiny) result ONCE, e.g. localCheckpoint(), so per-round plans see a
    # leaf instead of 16 parquet scans (CrawlEngine.__init__ does).
    return out
