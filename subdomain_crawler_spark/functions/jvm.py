"""JVM-side (Catalyst expression) twins of the extraction kernels — the
crawl's hot path ("UDFs are the slow path").

X1+F2 (host extraction + scope filter, domain_service.go:133,138-153 +
worker.go:108-110) and X3 (title, domain_service.go:213-232) are pure
regex/array work, so they compile to Catalyst expressions: the 100 TB text
column never crosses the JVM→Arrow→Python boundary. Equivalence with the
Python kernels (functions/core.py) is pinned by tests/test_core.py
(test_jvm_extraction_parity) and by the golden E2E suite, which runs the
whole crawl against the scalar reference simulator.

Semantics notes (why this is exactly `extract_hosts_one` + scope filter):

* Java and Python both run leftmost, non-overlapping `findall` for this
  pure-ASCII pattern with greedy bounded quantifiers — identical match sets;
* matches cannot contain whitespace, so Python's per-match `.strip()` is a
  no-op — only `lower()` must be applied before dedup;
* `array_distinct` keeps FIRST occurrences in encounter order — the
  reference's order-preserving first-wins dedup (domain_service.go:145-151);
* Spark `trim()` strips only spaces, so the title strip uses an anchored
  `\\s+` regexp_replace (Go strings.TrimSpace strips all ASCII whitespace).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared with functions/core.py / driver_queries.py (Go source:
# domain_service.go:133,215) — with Java-side Unicode flags added for parity
# with the Python kernels: Python's `(?i)` case-folds Unicode (U+212A KELVIN
# matches [a-z]) and `str.split()` / `\s` treat NBSP & co. as whitespace,
# while Java's `(?i)` / `\s` are ASCII-only by default.  `(?u)` enables
# UNICODE_CASE and `(?U)` UNICODE_CHARACTER_CLASS (which implies `(?u)`).
# Residual documented divergence: Python str.isspace() also treats
# U+001C..U+001F (file/group/record/unit separators) as whitespace; Unicode
# White_Space (Java `(?U)\s`) does not — a dotted token bridged only by
# those four control chars tokenizes differently (regex match set is
# unaffected since neither engine matches them inside a host).  The
# max_response_size byte-vs-char cap caveat in plans/crawl.py also applies.
EXTRACT_PATTERN = (
    r"(?iu)(?:[a-zA-Z0-9](?:[a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?\.)+[a-zA-Z]{2,}"
)
TITLE_PATTERN = r"(?is)<title[^>]*>(.*?)</title>"
WS = r"(?U)\s"


def reduce_dotted(text) -> Column:
    """Dot-token reduction as a pure JVM expression: keep only the
    whitespace-free tokens that contain a literal '.', joined by single
    spaces. A hostname match can never span whitespace and must contain a
    dot, so running ANY of the extraction kernels on this reduced string
    yields an identical match sequence — while shrinking prose input
    20-50×. Used standalone by the crawl's hybrid path (the reduction runs
    JVM-side so only dot-bearing tokens cross the JVM→Arrow→Python
    boundary) and as the first stage of the pure-JVM chain below."""
    dotted = F.filter(F.split(text, WS + "+"),
                      lambda t: t.contains("."))
    return F.array_join(dotted, " ")


def extract_hosts(text) -> Column:
    """X1 — ordered first-wins-deduped lowercase hostname mentions.

    Dot-token fast path (same as core._findall_hosts): the (backtracking,
    ~0.2 ms/KB) regex only sees the dot-bearing whitespace-free tokens —
    see reduce_dotted."""
    reduced = reduce_dotted(text)
    return F.array_distinct(
        F.transform(
            F.regexp_extract_all(reduced, F.lit(EXTRACT_PATTERN), F.lit(0)),
            lambda m: F.lower(m)))


def extract_in_scope(text, root) -> Column:
    """X1+F2 fused — extraction filtered to the parent root's scope
    (`c == root or c.endswith("." + root)`, domain_service.go:55-61)."""
    r = F.col(root) if isinstance(root, str) else root
    return F.filter(
        extract_hosts(text),
        lambda c: (c == r) | c.endswith(F.concat(F.lit("."), r)))


def extract_title(text) -> Column:
    """X3 — first <title> match: strip, control-chars→space, collapse runs."""
    raw = F.regexp_extract(text, TITLE_PATTERN, 1)
    stripped = F.regexp_replace(raw, r"(?U)^\s+|\s+$", "")
    spaced = F.regexp_replace(stripped, r"[\n\r\t]", " ")
    return F.regexp_replace(spaced, WS + "+", " ")
