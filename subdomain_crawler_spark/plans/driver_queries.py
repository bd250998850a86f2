"""Driver-contract queries: every SQL-expressible operator from SURVEY.md §2
exercised over the driver's testdata tables, each paired with a DuckDB oracle.

Design rules (driver compares row-count + schema + order-insensitive
value-hash at sf=0.01):

* identical column NAMES and, where possible, types (bigint over int);
* no raw timestamps/floats in outputs — aggregates are ``round()``ed the same
  on both sides, rankings order by the rounded value with integer tie-breaks;
* the SQL string is generated from the same Python constants (prefix list,
  stopword sets, regexes) the Spark side uses, so the two can't drift.

The queries are grouped: crawl-operator analogs (F*, X*, W*, D1, J*, A1,
U1 — reference citations in each docstring) and training-data pipeline ops
(dedup / similarity / text analysis). Ops whose semantics SQL can't express
(minhash, simhash, fingerprint, phash) ship Spark-only — the driver records
a rows-only check for them (documented in each docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import core, text as text_k
from ..functions import udfs

# Go validation / extraction regexes (domain_service.go:33,133) — shared
# verbatim by both engines (Java regex and RE2 accept this syntax).
VALID_PATTERN = r"^([a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?\.)+[a-zA-Z]{2,}$"
EXTRACT_PATTERN = r"(?i)(?:[a-zA-Z0-9](?:[a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?\.)+[a-zA-Z]{2,}"
TITLE_PATTERN = r"(?is)<title[^>]*>(.*?)</title>"

_LANGS = ("de", "en", "es", "fr")  # tie-break order (functions/text.py)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents spread across all cores for CPU-heavy Arrow-UDF kernels.

    The sf-testdata documents table is a single small parquet file → one
    scan split → a pandas UDF would run on ONE core. At real scale the scan
    splits by row group (maxPartitionBytes) and this repartition is a no-op
    cost-wise: kernel CPU ≫ one extra shuffle of the text column."""
    d = _t(spark, sf_dir, "documents")
    return d.repartition(spark.sparkContext.defaultParallelism)


def _sql_list(items) -> str:
    return "(" + ", ".join(f"'{i}'" for i in items) + ")"


def _sql_array(items) -> str:
    return "[" + ", ".join(f"'{i}'" for i in items) + "]"


# ---------------------------------------------------------------------------
# crawl-operator analogs
# ---------------------------------------------------------------------------


def q_f1_validate(spark, sf_dir):
    """F1 — syntactic hostname validation (domain_service.go:33,38-44) over
    synthesized candidates: one well-formed host per doc + one raw text
    prefix (mostly invalid)."""
    d = _t(spark, sf_dir, "documents")
    synth = d.select("doc_id", F.concat("source", F.lit("."), "lang",
                                        F.lit(".example.com")).alias("cand"),
                     F.lit("synth").alias("kind"))
    raw = d.select("doc_id", F.substring("text", 1, 12).alias("cand"),
                   F.lit("text").alias("kind"))
    u = synth.unionByName(raw)
    return u.select("doc_id", "cand", "kind",
                    F.trim(F.col("cand")).rlike(VALID_PATTERN).alias("is_valid"))


SQL_F1 = f"""
WITH u AS (
  SELECT doc_id, source || '.' || lang || '.example.com' AS cand, 'synth' AS kind
  FROM documents
  UNION ALL
  SELECT doc_id, substring(text, 1, 12) AS cand, 'text' AS kind FROM documents
)
SELECT doc_id, cand, kind,
       regexp_matches(trim(cand), '{VALID_PATTERN}') AS is_valid
FROM u
"""


def q_f2_scope(spark, sf_dir):
    """F2 — scope predicate domain==root OR endswith('.'+root)
    (domain_service.go:55-61)."""
    d = _t(spark, sf_dir, "documents")
    host = F.concat("source", F.lit(".example.com"))
    root = F.when(F.col("doc_id") % 2 == 0, "example.com").otherwise("other.org")
    return d.select(
        "doc_id", host.alias("host"), root.alias("root"),
        ((host == root) | host.endswith(F.concat(F.lit("."), root))).alias("in_scope"),
    )


SQL_F2 = """
SELECT doc_id,
       source || '.example.com' AS host,
       CASE WHEN doc_id % 2 = 0 THEN 'example.com' ELSE 'other.org' END AS root,
       (source || '.example.com' =
          CASE WHEN doc_id % 2 = 0 THEN 'example.com' ELSE 'other.org' END)
       OR suffix(source || '.example.com',
          '.' || CASE WHEN doc_id % 2 = 0 THEN 'example.com' ELSE 'other.org' END)
         AS in_scope
FROM documents
"""


def q_x6_depth(spark, sf_dir):
    """X6 — subdomain depth as label-count delta (domain_service.go:81-100,
    expression form per SURVEY §2.3)."""
    d = _t(spark, sf_dir, "documents")
    host = F.expr("repeat('x.', cast(doc_id % 4 as int)) || 'example.com'")
    d = d.select("doc_id", host.alias("host"), F.lit("example.com").alias("root"))
    depth = (F.when(F.col("host") == F.col("root"), 0)
             .otherwise(F.size(F.split("host", r"\.")) - F.size(F.split("root", r"\."))))
    return d.select("doc_id", "host", depth.cast("long").alias("depth"))


SQL_X6 = """
WITH h AS (
  SELECT doc_id, repeat('x.', CAST(doc_id % 4 AS INT)) || 'example.com' AS host,
         'example.com' AS root
  FROM documents
)
SELECT doc_id, host,
       CASE WHEN host = root THEN 0
            ELSE len(string_split(host, '.')) - len(string_split(root, '.'))
       END::BIGINT AS depth
FROM h
"""


def q_x3_title(spark, sf_dir):
    """X3 — title extraction + whitespace collapse (domain_service.go:213-232)."""
    d = _t(spark, sf_dir, "documents")
    html = F.concat(F.lit('<title lang="x">  '), F.substring("text", 1, 30),
                    F.lit("\t</title><body>"), F.col("lang"), F.lit("</body>"))
    t = F.regexp_extract(html, TITLE_PATTERN, 1)
    t = F.trim(F.regexp_replace(F.regexp_replace(t, r"[\n\r\t]", " "), r"\s+", " "))
    return d.select("doc_id", t.alias("title"))


SQL_X3 = f"""
SELECT doc_id,
  trim(regexp_replace(regexp_replace(
     regexp_extract('<title lang="x">  ' || substring(text,1,30) || chr(9)
                    || '</title><body>' || lang || '</body>',
                    '{TITLE_PATTERN}', 1),
     '[\\n\\r\\t]', ' ', 'g'), '\\s+', ' ', 'g')) AS title
FROM documents
"""


def q_x1_extract(spark, sf_dir):
    """X1 — regex hostname extraction, lowercased (domain_service.go:133-153;
    the synthesized hosts are distinct so per-doc dedup is a no-op here —
    dedup order semantics are pinned by tests/test_core.py instead).

    Output is '|'-joined (order-preserving) rather than array<string>: the
    driver's canonicalizer hashes scalar columns only."""
    d = _t(spark, sf_dir, "documents")
    t2 = F.concat(F.lit("visit "), "source", F.lit(".Example.COM and "),
                  "lang", F.lit(".example.org now"))
    d = d.withColumn("t2", t2)
    hosts = F.transform(
        F.regexp_extract_all("t2", F.lit(EXTRACT_PATTERN), F.lit(0)),
        lambda x: F.lower(x))
    return d.select("doc_id", F.array_join(hosts, "|").alias("hosts"))


SQL_X1 = f"""
SELECT doc_id,
  array_to_string(list_transform(
    regexp_extract_all('visit ' || source || '.Example.COM and ' || lang
                       || '.example.org now', '{EXTRACT_PATTERN}'),
    x -> lower(x)), '|') AS hosts
FROM documents
"""


def q_x5_root(spark, sf_dir):
    """X5 — eTLD+1 via the vendored PSL trie (domain_service.go:103-106,
    functions/psl.py), exercised over synthetic hosts covering the rule
    classes: plain TLD (.com), multi-label suffix (edu.cn), wildcard (*.ck)
    with exception (!www.ck), and the default-* unknown-TLD rule. The
    DuckDB oracle states each class's closed-form answer — general PSL
    semantics are pinned by unit tests porting the reference's cases
    (domain_service_test.go:85-95)."""
    d = _t(spark, sf_dir, "documents")
    host = (F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit("a."), "source", F.lit(".example.com")))
            .when(F.col("doc_id") % 4 == 1,
                  F.concat("source", F.lit(".tsinghua.edu.cn")))
            .when(F.col("doc_id") % 4 == 2,
                  F.concat(F.lit("x."), "source", F.lit(".site.ck")))
            .otherwise(F.concat("source", F.lit(".bar.unknowntld"))))
    d = d.select("doc_id", host.alias("host"))
    return d.select("doc_id", "host", udfs.udf_get_root("host").alias("root"))


SQL_X5 = """
SELECT doc_id, host,
  CASE WHEN doc_id % 4 = 0 THEN 'example.com'            -- rule: com
       WHEN doc_id % 4 = 1 THEN 'tsinghua.edu.cn'        -- rule: edu.cn
       WHEN doc_id % 4 = 2 THEN source || '.site.ck'     -- wildcard *.ck:
            -- suffix = <label>.ck, so eTLD+1 = source.site.ck for host
            -- x.<source>.site.ck  (site.ck is the suffix match)
       ELSE 'bar.unknowntld'                             -- default '*' rule
  END AS root
FROM (SELECT doc_id, source,
             CASE WHEN doc_id % 4 = 0 THEN 'a.' || source || '.example.com'
                  WHEN doc_id % 4 = 1 THEN source || '.tsinghua.edu.cn'
                  WHEN doc_id % 4 = 2 THEN 'x.' || source || '.site.ck'
                  ELSE source || '.bar.unknowntld' END AS host
      FROM documents)
"""


def q_x4_expand(spark, sf_dir):
    """X4 — SLD fan-out with the reference's 133-prefix list
    (expander.go:11-131); one SLD per distinct source."""
    d = _t(spark, sf_dir, "documents").select("source").distinct()
    prefixes = core.merged_prefixes()
    sld = F.concat("source", F.lit(".example.com"))
    arr = F.concat(
        F.array(sld),
        F.transform(F.array(*[F.lit(p) for p in prefixes]),
                    lambda p: F.concat(p, F.lit("."), sld)),
    )
    return (d.select(sld.alias("sld"), F.explode(arr).alias("candidate")))


def _sql_x4() -> str:
    prefixes = core.merged_prefixes()
    return f"""
WITH s AS (SELECT DISTINCT source || '.example.com' AS sld FROM documents)
SELECT sld, unnest(list_prepend(sld,
        list_transform({_sql_array(prefixes)}, p -> p || '.' || sld))) AS candidate
FROM s
"""


def q_w1_first_success(spark, sf_dir):
    """W1 — first-success-per-key (worker.go:90-126 protocol loop; here:
    first event per user).  Shape: groupBy + min-struct ordered by
    (ts, event_id) — the same canonical-winner pattern the crawl's
    _dedup_frontier uses — instead of a window row_number: the aggregate
    gets a map-side partial combine, so each task ships ONE candidate row
    per user across the exchange instead of every event (struct min
    compiles to SortAggregate — a sort on user_id only — but over the
    combined per-user rows, not the full event log); rows are unique per
    (ts, event_id) so the winner is identical to the rn=1 row (round 11;
    measured 1.0 s → 0.3 s warm at sf1.0 vs the window form's Sort +
    WindowGroupLimit on both sides of the exchange)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("user_id")
             .agg(F.min(F.struct("ts", "event_id", "event_type"))
                  .alias("w"))
             .select("user_id", F.col("w.event_id").alias("first_event_id"),
                     F.col("w.event_type").alias("first_event_type")))


SQL_W1 = """
SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
      FROM events) WHERE rn = 1
"""


def q_d1_anti_join(spark, sf_dir):
    """D1 — seen-set exact left_anti (bloom accelerator never changes this;
    bloom_filter.go:26-46 → SURVEY §2.4 canonical semantics)."""
    d = _t(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return (d.join(seen, "doc_id", "left_anti")
             .select("doc_id", "source"))


SQL_D1 = """
SELECT doc_id, source FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 7 = 0)
"""


def q_j3_semi_join(spark, sf_dir):
    """J3 — scope whitelist as broadcast left-semi join
    (domain_service.go:62-70 → SURVEY §2.5)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
    return (c.join(F.broadcast(asian), c.c_nationkey == asian.n_nationkey,
                   "left_semi")
             .select("c_custkey", "c_name"))


SQL_J3 = """
SELECT c_custkey, c_name FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey IN (
    SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
"""


def q_w2_budget(spark, sf_dir):
    """W2 — per-key politeness budget: top-3 per customer by (date, key)
    (north-rule addition; operators/politeness.py is the salted scale form)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.withColumn("rn", F.row_number().over(w))
             .filter("rn <= 3")
             .select("o_custkey", "o_orderkey", F.col("rn").cast("long").alias("rn")))


SQL_W2 = """
SELECT o_custkey, o_orderkey, rn::BIGINT AS rn
FROM (SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) rn
      FROM orders) WHERE rn <= 3
"""


def q_a1_metrics(spark, sf_dir):
    """A1 — per-round counters as grouped aggregates
    (crawl_usecase.go:331-357)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("requests"),
                  F.round(F.sum("value"), 2).alias("sum_value"),
                  F.countDistinct("user_id").alias("users")))


SQL_A1 = """
SELECT event_type, count(*) AS requests, round(sum(value), 2) AS sum_value,
       count(DISTINCT user_id) AS users
FROM events GROUP BY event_type
"""


def q_u1_union_dedup(spark, sf_dir):
    """U1 — frontier union + dropDuplicates (worker.go:194-223 feedback loop)."""
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "view").select("user_id")
    return a.unionByName(b).distinct()


SQL_U1 = """
SELECT DISTINCT user_id FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  UNION ALL SELECT user_id FROM events WHERE event_type = 'view')
"""


def q_tpch_q1(spark, sf_dir):
    """Headline pricing-summary aggregate (TPC-H Q1 shape) — map-side
    partial agg + single shuffle; the A1-at-scale pattern."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
                 F.count(F.lit(1)).alias("count_order")))


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 2) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    """Headline join query (TPC-H Q3 shape): broadcast dim join + grouped
    revenue + deterministic top-10."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .groupBy("l_orderkey")
              .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                    .alias("revenue"))
              .orderBy(F.desc("revenue"), "l_orderkey")
              .limit(10))


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# training-data pipeline ops
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup via hash-groupBy: keeper = min id per normalized key
    (here: first 3 tokens of the text as the near-key)."""
    d = _t(spark, sf_dir, "documents")
    key = F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 3), " ")
    return (d.select(key.alias("key"), "doc_id")
             .groupBy("key")
             .agg(F.min("doc_id").alias("keeper"),
                  F.count(F.lit(1)).alias("dup_count")))


SQL_DEDUP_EXACT = """
SELECT array_to_string(regexp_split_to_array(trim(text), '\\s+')[1:3], ' ') AS key,
       min(doc_id) AS keeper, count(*) AS dup_count
FROM documents GROUP BY 1
"""


def q_token_count(spark, sf_dir):
    """Whitespace token count — size(split(trim(s), '\\s+'))."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"))


SQL_TOKEN_COUNT = """
SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens
FROM documents
"""


# GPT-2-style pre-tokenizer classes, simplified to its ASCII core and RE2-
# compatible (NO lookahead — the original's trailing-space lookahead is a
# whitespace-preservation detail, irrelevant to counting): an optional
# leading space glued to a letter run, digit run, or punctuation run.
# Both engines (Java regex / RE2) resolve this alternation identically:
# branch first-chars are disjoint, so leftmost-first == leftmost-longest.
_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def q_token_count_bpe(spark, sf_dir):
    """BPE-ish token count — the brief's second counting mode: the GPT-2
    pre-tokenizer's split classes (letter runs / digit runs / punctuation
    runs, each absorbing one leading space) counted per document via JVM
    ``regexp_count``; a whitespace count under-estimates BPE cost on
    punctuation-dense text, and this is the standard first-order
    correction a data pipeline budgets tokens with.  No UDF, no shuffle —
    one codegen'd scan."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_PAT)).cast("long")
         .alias("n_bpe_tokens"))


def _sql_token_count_bpe() -> str:
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_PAT}'))::BIGINT AS n_bpe_tokens
FROM documents
"""


def q_quality_score(spark, sf_dir):
    """Quality proxy: round(en-stopword-ratio, 4) (functions/text.py
    quality_score — same stopword list on both sides)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    sw = list(text_k.STOPWORDS["en"])
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    score = F.round(hits.cast("double") / F.greatest(F.size(toks), F.lit(1)), 4)
    return d.select("doc_id", score.alias("quality"))


def _sql_quality() -> str:
    sw = _sql_array(text_k.STOPWORDS["en"])
    return f"""
SELECT doc_id,
  round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        t -> list_contains({sw}, t)))::DOUBLE
        / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 4)
  AS quality
FROM documents
"""


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic: argmax of per-language stopword hits,
    tie-break de<en<es<fr, zero hits → 'und' (functions/text.py lang_id)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")

    def _hit(lang):
        sw = list(text_k.STOPWORDS[lang])
        return F.size(F.filter(toks, lambda t: t.isin(sw)))

    d = d.select("doc_id", *[_hit(x).alias(f"h_{x}") for x in _LANGS])
    expr = (
        F.when((F.col("h_de") >= F.greatest("h_en", "h_es", "h_fr"))
               & (F.col("h_de") > 0), "de")
        .when((F.col("h_en") >= F.greatest("h_es", "h_fr")) & (F.col("h_en") > 0), "en")
        .when((F.col("h_es") >= F.col("h_fr")) & (F.col("h_es") > 0), "es")
        .when(F.col("h_fr") > 0, "fr")
        .otherwise("und"))
    return d.select("doc_id", expr.alias("lang_pred"))


def _sql_lang_id() -> str:
    hit = lambda lang: (
        f"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"t -> list_contains({_sql_array(text_k.STOPWORDS[lang])}, t)))")
    return f"""
WITH h AS (
  SELECT doc_id, {hit('de')} AS h_de, {hit('en')} AS h_en,
         {hit('es')} AS h_es, {hit('fr')} AS h_fr
  FROM documents
)
SELECT doc_id,
  CASE WHEN h_de >= greatest(h_en, h_es, h_fr) AND h_de > 0 THEN 'de'
       WHEN h_en >= greatest(h_es, h_fr) AND h_en > 0 THEN 'en'
       WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
       WHEN h_fr > 0 THEN 'fr'
       ELSE 'und' END AS lang_pred
FROM h
"""


def q_repetition_score(spark, sf_dir):
    """Within-document repetition: duplicate word-3-gram fraction
    (1 − distinct/total 3-grams), the Gopher-rule family's "fraction of
    duplicate n-grams" quality filter (Rae et al. 2021 §A1.1) — a doc that
    repeats its own phrasing is boilerplate/spam-like and gets filtered
    before LLM training. 100 TB shape: pure per-row JVM higher-order
    functions (split → transform over a 1..n−2 index sequence → slice /
    concat_ws → array_distinct) — no UDF, no shuffle, whole-stage codegen
    end to end; the filter composes with quality_score/lang_id in one
    scan."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    n = F.size(toks)
    # guard n < 3 BEFORE building the index sequence: sequence(1, n-2)
    # with n-2 < 1 would generate a DESCENDING range (implicit step -1),
    # not an empty one
    grams = F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(1), n - F.lit(2)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 3)))
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    frac = F.when(
        total > 0,
        F.round(F.lit(1.0)
                - F.size(F.array_distinct(grams)).cast("double") / total, 4)
    ).otherwise(F.lit(0.0))
    return d.select("doc_id", frac.alias("dup_3gram_frac"))


def _sql_repetition() -> str:
    # DuckDB twin: 1-based list indexing, range(1, n-1) is end-exclusive →
    # start indices 1..n-2, same rounding
    return """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
    ELSE [] END AS grams
  FROM t
)
SELECT doc_id,
  CASE WHEN len(grams) > 0
       THEN round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 4)
       ELSE 0.0 END AS dup_3gram_frac
FROM g
"""


# -- composed training-data quality filter -----------------------------------

_QF_MIN_TOKENS = 20    # Gopher-style min length
_QF_MIN_QUALITY = 0.02  # min en-stopword ratio (C4-style heuristic)
_QF_MAX_REP = 0.05     # max duplicate-3-gram fraction (Rae et al. §A1.1)


# first-failing-rule verdicts in gate order (duplicate wins over language
# over length …) + the keep verdict — the quality_metrics schema
QF_REASONS = ("duplicate", "non_english", "too_short", "low_quality",
              "repetitive", "kept")


def quality_filter_verdict(d: DataFrame) -> DataFrame:
    """The composed quality gate as a library call over ``d(doc_id, text,
    ...)``: returns ALL input columns plus ``reason`` (first failing rule,
    QF_REASONS order) and ``keep`` — so an engine caller can filter and
    export the surviving rows without a second scan or re-join.  Helper
    columns are underscore-prefixed and dropped (no collision with caller
    columns).  Every gate is a per-row JVM expression in one
    whole-stage-codegen pass; the only shuffle is the dup-keeper window's
    hash partition by key (the same shuffle dedup_exact pays)."""
    toks = F.split(F.trim("text"), r"\s+")
    n = F.size(toks)
    key = F.array_join(F.slice(toks, 1, 3), " ")
    sw_en = list(text_k.STOPWORDS["en"])
    quality = F.round(
        F.size(F.filter(toks, lambda t: t.isin(sw_en))).cast("double")
        / F.greatest(n, F.lit(1)), 4)
    grams = F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(1), n - F.lit(2)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 3)))
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    rep = F.when(
        total > 0,
        F.round(F.lit(1.0)
                - F.size(F.array_distinct(grams)).cast("double") / total, 4)
    ).otherwise(F.lit(0.0))

    def _hit(lang):
        sw = list(text_k.STOPWORDS[lang])
        return F.size(F.filter(toks, lambda t: t.isin(sw)))

    cols = list(d.columns)
    # engine callers pass arbitrary corpus slices — a caller frame already
    # carrying an output or helper name would produce duplicate/ambiguous
    # columns downstream (round-10 ADVICE); fail loudly instead
    reserved = ({"reason", "keep", "_key", "_n_tokens", "_quality",
                 "_rep", "_lang_pred", "_keeper"}
                | {f"_h_{x}" for x in _LANGS})
    clash = reserved.intersection(cols)
    if clash:
        raise ValueError(
            "quality_filter_verdict: input columns collide with reserved "
            f"helper/output names {sorted(clash)}; rename them first")
    base = d.select(*cols, key.alias("_key"), n.alias("_n_tokens"),
                    quality.alias("_quality"), rep.alias("_rep"),
                    *[_hit(x).alias(f"_h_{x}") for x in _LANGS])
    lang = (
        F.when((F.col("_h_de") >= F.greatest("_h_en", "_h_es", "_h_fr"))
               & (F.col("_h_de") > 0), "de")
        .when((F.col("_h_en") >= F.greatest("_h_es", "_h_fr"))
              & (F.col("_h_en") > 0), "en")
        .when((F.col("_h_es") >= F.col("_h_fr")) & (F.col("_h_es") > 0),
              "es")
        .when(F.col("_h_fr") > 0, "fr")
        .otherwise("und"))
    keeper = F.min("doc_id").over(Window.partitionBy("_key"))
    scored = base.select(*cols, "_n_tokens", "_quality", "_rep",
                         lang.alias("_lang_pred"), keeper.alias("_keeper"))
    reason = (
        F.when(F.col("doc_id") != F.col("_keeper"), "duplicate")
        .when(F.col("_lang_pred") != "en", "non_english")
        .when(F.col("_n_tokens") < _QF_MIN_TOKENS, "too_short")
        .when(F.col("_quality") < _QF_MIN_QUALITY, "low_quality")
        .when(F.col("_rep") > _QF_MAX_REP, "repetitive")
        .otherwise("kept"))
    return scored.select(*cols, reason.alias("reason"),
                         (reason == "kept").alias("keep"))


def q_quality_filter(spark, sf_dir):
    """THE composed pass an LLM training pipeline runs before tokenizing:
    exact-dup keeper + language gate + length gate + stopword-ratio gate +
    repetition gate, fused into ONE scan with first-failing-rule reasons
    (duplicate → non_english → too_short → low_quality → repetitive →
    kept).  Reuses the exact expressions of dedup_exact / lang_id /
    token_count / quality_score / repetition_score — each independently
    hash-green — so this pins their COMPOSITION, and the oracle composes
    the same five oracle CTEs.  100 TB shape: every gate is a per-row JVM
    expression in one whole-stage-codegen pass over the scan; the only
    shuffle is the dedup window's hash partition by key (the same shuffle
    dedup_exact pays), after which the verdict expression is free.
    The expressions live in quality_filter_verdict — the engine's
    CrawlEngine.quality_filter_documents runs the SAME composition, so
    this oracle row certifies the production path too."""
    d = _t(spark, sf_dir, "documents")
    return (quality_filter_verdict(d.select("doc_id", "text"))
            .select("doc_id", "reason", "keep"))


def _sql_quality_filter() -> str:
    """Composes the five standalone oracle CTEs verbatim — the SQL twins
    cannot drift from their single-op forms."""
    return f"""
WITH lang AS ({_sql_lang_id()}),
tok AS ({SQL_TOKEN_COUNT}),
q AS ({_sql_quality()}),
rep AS ({_sql_repetition()}),
dup AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY array_to_string(
             regexp_split_to_array(trim(text), '\\s+')[1:3], ' ')) AS keeper
  FROM documents
), verdict AS (
  SELECT d.doc_id,
    CASE WHEN d.doc_id <> dup.keeper THEN 'duplicate'
         WHEN lang.lang_pred <> 'en' THEN 'non_english'
         WHEN tok.n_tokens < {_QF_MIN_TOKENS} THEN 'too_short'
         WHEN q.quality < {_QF_MIN_QUALITY} THEN 'low_quality'
         WHEN rep.dup_3gram_frac > {_QF_MAX_REP} THEN 'repetitive'
         ELSE 'kept' END AS reason
  FROM documents d
  JOIN lang USING (doc_id) JOIN tok USING (doc_id) JOIN q USING (doc_id)
  JOIN rep USING (doc_id) JOIN dup USING (doc_id)
)
SELECT doc_id, reason, reason = 'kept' AS keep FROM verdict
"""


# decontamination: eval split rule + overlap gram width.  doc_id % 23
# puts ~4% of the corpus in the "benchmark" set — deterministic, so the
# oracle is exact; 8 grams is the published width (GPT-3 appx C / Llama 2
# appx A.6 use 8-13-gram collision as the contamination rule)
_DECON_EVAL_MOD = 23
_DECON_N = 8


def q_decontaminate(spark, sf_dir):
    """Benchmark DECONTAMINATION — the train-set hygiene pass run before
    every serious LLM training job (GPT-3 appx C; Llama 2 appx A.6):
    flag every training document sharing at least one word-8-gram with
    the held-out eval set (here the deterministic doc_id % 23 == 0
    split), reporting the shared-gram count per train doc.  A flagged
    doc either leaks eval answers into training or inflates eval scores;
    both sides of the split are computed from the same table so the
    oracle is exact.

    100 TB shape: the eval side is always orders of magnitude smaller
    than train (benchmarks are thousands of docs), so its distinct gram
    set BROADCASTS — the train scan explodes grams and probes the
    broadcast hash table with NO train-side shuffle; only the flagged
    subset (rare) enters the per-doc count aggregation.  The eval and
    train branches each explode their OWN pre-filtered slice of the scan
    (round 11 — one shared exploded frame consumed by both branches made
    the dominant train-side explode run twice, once per branch, since
    nothing persisted it; the eval split predicate is a pure doc_id
    function, so filtering before the gram transform is free).  At real
    scale the gram string is hashed to int64 first (xxhash64) to shrink
    the broadcast; fixture scale keeps the strings so the oracle needs no
    hash twin."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    n = F.size(toks)
    grams = F.array_distinct(F.when(
        n >= _DECON_N,
        F.transform(F.sequence(F.lit(1), n - F.lit(_DECON_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, _DECON_N)))
    ).otherwise(F.array().cast("array<string>")))
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0
    eval_g = (d.filter(is_eval)
              .select(F.explode(grams).alias("gram")).distinct())
    train_g = (d.filter(~is_eval)
               .select("doc_id", F.explode(grams).alias("gram")))
    hits = (train_g
            .join(F.broadcast(eval_g), "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("hits")))
    return (d.filter(~is_eval).select("doc_id")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("hits", F.lit(0)).cast("long")
                     .alias("n_shared_grams"))
            .withColumn("contaminated", F.col("n_shared_grams") > 0))


def _sql_decontaminate() -> str:
    return f"""
WITH g AS (
  SELECT doc_id, doc_id % {_DECON_EVAL_MOD} = 0 AS is_eval,
         unnest(list_distinct(CASE
           WHEN len(regexp_split_to_array(trim(text), '\\s+'))
                >= {_DECON_N}
           THEN list_transform(
             generate_series(1, len(regexp_split_to_array(trim(text),
                                                          '\\s+'))
                                - {_DECON_N - 1}),
             i -> array_to_string(regexp_split_to_array(trim(text),
                 '\\s+')[i:i+{_DECON_N - 1}], ' '))
           ELSE []::VARCHAR[] END)) AS gram
  FROM documents
), ev AS (
  SELECT DISTINCT gram FROM g WHERE is_eval
), hits AS (
  SELECT g.doc_id, count(*) AS hits
  FROM g JOIN ev USING (gram) WHERE NOT g.is_eval
  GROUP BY g.doc_id
)
SELECT d.doc_id, coalesce(h.hits, 0)::BIGINT AS n_shared_grams,
       coalesce(h.hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_DECON_EVAL_MOD} <> 0
"""


def q_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup scoring on adjacent doc pairs (the scalable
    all-pairs form is LSH-bucketed; this pins the pair-metric semantics)."""
    d = _t(spark, sf_dir, "documents")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(
            F.size(F.split(F.trim("text"), r"\s+")) - 2, F.lit(1))),
        lambda i: F.array_join(
            F.slice(F.split(F.trim("text"), r"\s+"), i, 3), " ")))
    a = d.select(F.col("doc_id"), grams.alias("g1"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), grams.alias("g2"))
    j = a.join(b, "doc_id")
    inter = F.size(F.array_intersect("g1", "g2"))
    uni = F.size(F.array_union("g1", "g2"))
    return j.select(
        "doc_id",
        F.round(inter.cast("double") / F.greatest(uni, F.lit(1)), 4).alias("jaccard"))


SQL_NGRAM_JACCARD = """
WITH g AS (
  SELECT doc_id,
    list_distinct(list_transform(
      generate_series(1, greatest(len(regexp_split_to_array(trim(text),'\\s+')) - 2, 1)),
      i -> array_to_string(regexp_split_to_array(trim(text),'\\s+')[i:i+2], ' ')))
    AS grams
  FROM documents
)
SELECT a.doc_id,
  round(len(list_intersect(a.grams, b.grams))::DOUBLE /
        greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1), 4) AS jaccard
FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
"""


def q_cosine_topk(spark, sf_dir):
    """Similarity search — brute-force cosine top-10 vs the vec_id=0 query
    vector.  Scoring runs through the Arrow pair kernel (_pair_cos4_np),
    bit-equal to the old zip_with/aggregate lambda tree but vectorized
    numpy instead of interpreted boxed JVM ops (guide §4.2) — and without
    the lambda tree's multi-second first-run codegen."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    j = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    return (j.select("vec_id", _udf_pair_cos4("embedding", "qv")
                     .alias("cos_sim"))
             .orderBy(F.desc("cos_sim"), "vec_id").limit(10))


SQL_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
  round(list_inner_product(embedding, qv) /
        (sqrt(list_inner_product(embedding, embedding))
         * sqrt(list_inner_product(qv, qv))), 4) AS cos_sim
FROM embeddings, q WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


# --- sign-LSH over embeddings: ADAPTIVE bucket cardinality -------------------
# Round-2's fixed 8-hyperplane bucketing capped the space at 256 buckets
# forever — at the 10^10-row target that is ~4·10^7 rows/bucket and the
# "bucketed, not all-pairs" property degenerates (VERDICT r2). The bit count
# now scales with input size:
#
#     r = clamp(ceil(log2(N / 32)), 4, 32)      (target ~32 rows/bucket)
#
# so bucket count grows linearly with N: N=500 → r=4 (16 buckets, ~31
# rows each), N=2000 → r=6, N=10^10 → r=28 → 2.7·10^8 buckets, ~37
# rows/bucket — candidate work per bucket stays O(target²)≈10³ pairs
# regardless of N, and the 64-dim embedding column supplies enough
# coordinate hyperplanes for any N ≤ 2^32·32 ≈ 10^11 rows. Both engines
# derive r from the SAME formula over the SAME table (Spark: a scalar
# count; DuckDB: a params CTE), so the oracle stays exact at every sf.

_LSH_TARGET = 32          # target rows per bucket
_LSH_MIN_BITS, _LSH_MAX_BITS = 4, 32


def _lsh_bits(n: int) -> int:
    import math

    return max(_LSH_MIN_BITS,
               min(_LSH_MAX_BITS, math.ceil(math.log2(max(n, 1) / _LSH_TARGET))))


def _lsh_bucket_expr(col: str, r: int, offset: int = 0):
    """Sign bucket from coordinate hyperplanes [offset, offset+r)."""
    return sum(
        (F.when(F.col(col)[offset + i] > 0, 1 << i).otherwise(0))
        for i in range(r)
    ).cast("long")


def _sql_bucket(r_expr: str, offset: str = "0") -> str:
    """DuckDB twin of _lsh_bucket_expr with a RUNTIME bit count: 32 masked
    CASE terms, term i active iff i < r (1-indexed embedding[]); ``offset``
    is a SQL expression (band base dim)."""
    terms = " + ".join(
        f"CASE WHEN {i} < {r_expr} AND embedding[{offset} + {i + 1}] > 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i in range(_LSH_MAX_BITS))
    return f"({terms})::BIGINT"


def q_ann_lsh_bucket(spark, sf_dir):
    """ANN scale path: adaptive sign-LSH bucketing (r = log2(N/32) coordinate
    hyperplanes, see _lsh_bits) + MULTI-PROBE: the query's bucket plus every
    bucket at Hamming distance 1 (r+1 probes) is scanned — the query side
    explodes into probe rows and hash-joins on bucket, so the corpus is
    bucket-pruned, never scanned. Exact cosine top-5 within the probed
    buckets. At 10^10 rows: r=28, 29 probes × ~37 rows ≈ 10³ exact
    distances per query."""
    e = _t(spark, sf_dir, "embeddings")
    r = _lsh_bits(e.count())
    eb = e.withColumn("bucket", _lsh_bucket_expr("embedding", r))
    qb = F.col("qb0")
    q = (eb.filter(F.col("vec_id") == 0)
         .select(F.col("embedding").alias("qv"), F.col("bucket").alias("qb0"))
         .select("qv", F.explode(F.array(
             qb, *[qb.bitwiseXOR(F.lit(1 << i)) for i in range(r)]
         )).alias("bucket")))
    j = eb.filter(F.col("vec_id") != 0).join(F.broadcast(q), "bucket")
    return (j.select("vec_id", F.col("bucket"),
                     _udf_pair_cos4("embedding", "qv").alias("cos_sim"))
             .orderBy(F.desc("cos_sim"), "vec_id").limit(5))


def _sql_ann_lsh() -> str:
    probes = ", ".join(
        ["qb0"] + [f"CASE WHEN {i} < r THEN xor(qb0, {1 << i}) END"
                   for i in range(_LSH_MAX_BITS)])
    return f"""
WITH params AS (
  SELECT greatest({_LSH_MIN_BITS}, least({_LSH_MAX_BITS},
           ceil(log2(count(*) / {_LSH_TARGET}.0))))::INT AS r
  FROM embeddings
), b AS (
  SELECT vec_id, embedding, {_sql_bucket('r')} AS bucket
  FROM embeddings, params
), q0 AS (
  SELECT embedding AS qv, bucket AS qb0, r FROM b, params WHERE vec_id = 0
), q AS (
  SELECT qv, p AS bucket FROM (
    SELECT qv, unnest([{probes}]) AS p FROM q0
  ) WHERE p IS NOT NULL
)
SELECT vec_id, b.bucket,
  round(list_inner_product(embedding, qv) /
        (sqrt(list_inner_product(embedding, embedding))
         * sqrt(list_inner_product(qv, qv))), 4) AS cos_sim
FROM b JOIN q ON b.bucket = q.bucket
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 5
"""


# --- IVF over embeddings: the coarse-quantizer ANN scale path ----------------
# The brief names two scale paths for similarity search — LSH-bucketed
# (q_ann_lsh_bucket above) and IVF. IVF partitions the corpus into k cells
# by nearest centroid and searches only the nprobe cells nearest the query:
# work per query is (k centroid distances) + (nprobe/k of the corpus),
# independent of how the data is embedded (LSH needs sign structure; IVF
# works on any metric). Centroids here are DETERMINISTIC — the embeddings
# of vec_id 1..k — because a k-means fit is not SQL-expressible and the
# oracle must replicate cell assignment bit-for-bit; recall quality is the
# quantizer's problem, the OPERATOR under test is the partitioned search.
# All cosines are rounded to 4 decimals BEFORE argmax/rank on both engines
# (ties → smallest centroid id). Rounding makes ties deterministic and
# near-boundary flips rare — it is not a hard cross-engine guarantee (Spark
# accumulates f32 products in double; DuckDB's list_inner_product runs at
# the list's FLOAT precision, so a ~1e-6 discrepancy straddling a 4th-
# decimal boundary could still flip an argmax). Green at every tested SF;
# WITHIN Spark the two cell-assignment paths below are bit-equal by
# construction (the Arrow kernel emulates the literal path's arithmetic
# exactly — see _ivf_scores_np).

_IVF_K = 16        # centroid count (vec_id 1.._IVF_K)
_IVF_NPROBE = 4    # cells searched per query
_IVF_TOPK = 10
# Historical literal-vs-Arrow threshold (rounds 8-10 switched assignment
# paths on k; round 11 made Arrow the default at EVERY k after measuring
# the literal path at 9.5 s vs 0.9 s warm on sf1.0 — the literal
# transform's PLAN is constant-size at any k, but its EVALUATION is
# interpreted higher-order-function lambdas (zip_with / aggregate are not
# codegen'd — every element is boxed), i.e. k·d boxed JVM ops per row,
# while the Arrow kernel does the same flops as vectorized numpy over the
# batch).  Kept as documentation + the explicit use_arrow=False escape.
_IVF_LITERAL_MAX_K = 32


def _cos4(vec_col, other):
    """round(cosine(vec_col, other), 4) — the exact expression family the
    hash-green cosine_topk oracle pins (zip_with/aggregate, double acc)."""
    dot = F.aggregate(F.zip_with(vec_col, other, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(vec_col, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(other, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return F.round(dot / (na * nb), 4)


# Numeric kernels (round-4 half-up, IVF score matrix, pair cosine) live in
# functions/vecsim.py since round 11: they are referenced from pandas UDFs,
# and kernels defined in THIS module made every worker import the whole
# query-plan module chain on first use (~1-1.4 s added to the session's
# first kernel-bearing query).  Aliased here for the existing test/caller
# surface.
from ..functions.vecsim import (  # noqa: E402
    ivf_scores_np as _ivf_scores_np,
    pair_cos4_np as _pair_cos4_np,
    round4_half_up as _ivf_round4_half_up,
)

# Arrow-batched pair cosine UDF — defined in functions/udfs.py (light
# worker-side import chain), aliased for the query bodies below.
_udf_pair_cos4 = udfs.udf_pair_cos4


def _ivf_cells_arrow(vectors, cents, cids, vec_col: str = "embedding"):
    """Arrow-batched cell assignment — the large-k production path: one
    pandas UDF over a broadcast (closure-captured) centroid matrix, argmax
    with first-max-wins (= smallest centroid position = the literal path's
    ``array_position(scores, array_max(scores))`` tie rule). Constant-size
    plan at any k; per-batch work is one vectorized score matrix + argmax."""
    import numpy as np

    C = np.asarray([list(map(float, c)) for c in cents], dtype=np.float32)
    cid_arr = np.asarray([int(c) for c in cids], dtype=np.int64)

    @F.pandas_udf("long")
    def _cell_of(emb: pd.Series) -> pd.Series:
        import numpy as _np
        M = _np.asarray(emb.tolist(), dtype=_np.float32)
        scores = _ivf_scores_np(M, C)
        return pd.Series(cid_arr[_np.argmax(scores, axis=1)])

    return vectors.withColumn("cell", _cell_of(F.col(vec_col)))


def _ivf_cells_literal(vectors, cents_lit, cid_lit,
                       vec_col: str = "embedding"):
    """Small-k cell assignment: inline argmax over literal centroid arrays
    — a pure PROJECTION, no join/shuffle. ONE literal array-of-arrays +
    ONE transform (k separate cosine expressions — greatest + a k-branch
    case tree — were measured at seconds of py4j tree construction +
    janino codegen on the driver). argmax via
    ``array_position(scores, array_max(scores))``: first occurrence wins =
    smallest centroid position = smallest cid (cids are position-mapped
    through cid_lit, no contiguity assumption)."""
    scores = F.transform(cents_lit, lambda c: _cos4(F.col(vec_col), c))
    cell = F.element_at(
        cid_lit, F.array_position(scores, F.array_max(scores)).cast("int"))
    return vectors.withColumn("cell", cell)


def q_ann_ivf(spark, sf_dir, k: int = _IVF_K, nprobe: int = _IVF_NPROBE,
              use_arrow: bool | None = None):
    """ANN scale path #2 — IVF: assign every vector to its nearest of k
    deterministic centroids, probe the nprobe cells nearest the query,
    exact cosine top-10 within them. The k-row centroid collect is the
    bounded broadcast-dim pattern (k ≤ thousands even at 10^10 rows).

    Cell assignment DEFAULTS to the Arrow-batched argmax over a broadcast
    centroid matrix (`_ivf_cells_arrow`), whose arithmetic emulates the
    literal-expression path exactly (`_ivf_scores_np`) so the two
    assignments are BIT-EQUAL — pinned by
    tests/test_plans.py::test_ann_ivf_arrow_parity AND end-to-end by the
    driver-green ``ann_ivf_arrow`` oracle row (same SQL, Arrow forced,
    hash-green since round 8).  The literal chain (`_ivf_cells_literal`,
    ``use_arrow=False``) remains selectable as the oracle-documentation
    path; it was the default through round 10, but its zip_with/aggregate
    lambdas are interpreted (k·d boxed JVM ops per row — guide §4.2) and
    measured 9.5 s vs 0.9 s warm at sf1.0 (k=16, 20k vectors, local[32]),
    plus ~10 s of first-run janino codegen for the k-wide lambda tree.
    At 10^10 rows the cell column also PARTITIONS the stored table, so
    the probe's ``cell IN (...)`` filter prunes partitions instead of
    filtering rows."""
    e = _t(spark, sf_dir, "embeddings")
    if use_arrow is None:
        use_arrow = True
    cents = (e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= k))
             .select("vec_id", "embedding").orderBy("vec_id").collect())
    cmat = [list(map(float, r["embedding"])) for r in cents]
    cids = [int(r["vec_id"]) for r in cents]
    vectors = e.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    if use_arrow:
        scored = _ivf_cells_arrow(vectors, cmat, cids)
        # probe selection driver-side with the SAME emulated kernel over
        # the one collected query vector — bounded (1 × k scores) and
        # bit-consistent with the assignment; the resulting IN-list is a
        # partition-prunable predicate on a cell-partitioned store.
        import numpy as np
        qv = (e.filter(F.col("vec_id") == 0)
              .select("embedding").collect()[0]["embedding"])
        qs = _ivf_scores_np(np.asarray([list(map(float, qv))],
                                       dtype=np.float32),
                            np.asarray(cmat, dtype=np.float32))[0]
        order = sorted(range(len(cids)), key=lambda i: (-qs[i], cids[i]))
        probe_cells = [cids[i] for i in order[:nprobe]]
        cand = (scored.filter(F.col("cell").isin(probe_cells))
                .crossJoin(F.broadcast(q)))
    else:
        cents_lit = F.lit(cmat).cast("array<array<float>>")
        cid_lit = F.lit(cids).cast("array<long>")
        scored = _ivf_cells_literal(vectors, cents_lit, cid_lit)
        probe = (q.select(F.posexplode(
                     F.transform(cents_lit, lambda c: _cos4(F.col("qv"), c)))
                     .alias("pos", "qcos"))
                 .select(F.element_at(cid_lit, F.col("pos").cast("int") + 1)
                          .alias("cell"), "qcos")
                 .orderBy(F.desc("qcos"), "cell").limit(nprobe)
                 .select("cell"))
        cand = (scored.join(F.broadcast(probe), "cell")
                .crossJoin(F.broadcast(q)))
    # exact top-k within the probed cells through the Arrow pair kernel
    # (bit-equal to the literal _cos4 tree — see _pair_cos4_np)
    return (cand.select("vec_id", "cell",
                        _udf_pair_cos4("embedding", F.col("qv"))
                        .alias("cos_sim"))
                .orderBy(F.desc("cos_sim"), "vec_id").limit(_IVF_TOPK))


def _sql_ann_ivf() -> str:
    cos = (lambda a, b:
           f"round(list_inner_product({a}, {b}) / "
           f"(sqrt(list_inner_product({a}, {a})) * "
           f"sqrt(list_inner_product({b}, {b}))), 4)")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND {_IVF_K}),
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {cos('e.embedding', 'c.cv')} DESC, c.cid)
           AS rn
  FROM embeddings e, c WHERE e.vec_id <> 0
),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
probe AS (
  SELECT cid AS cell FROM c, q
  ORDER BY {cos('c.cv', 'q.qv')} DESC, cid LIMIT {_IVF_NPROBE}
)
SELECT cells.vec_id, cells.cell, {cos('cells.embedding', 'q.qv')} AS cos_sim
FROM cells JOIN probe USING (cell), q
ORDER BY cos_sim DESC, vec_id LIMIT {_IVF_TOPK}
"""


def q_ann_ivf_arrow(spark, sf_dir):
    """The IVF large-k production path, driver-verified: same query as
    ``ann_ivf`` but with ``use_arrow=True`` forced, so the Arrow-batched
    argmax kernel (`_ivf_cells_arrow` / `_ivf_scores_np`) runs against the
    SAME oracle SQL the literal path is pinned to. Green here proves the
    bit-parity contract end-to-end through the driver's value-hash compare,
    not just the in-repo parity unit test."""
    return q_ann_ivf(spark, sf_dir, use_arrow=True)


def q_ann_recall(spark, sf_dir):
    """ANN quality audit — recall@k of the IVF path against the exact
    brute-force top-k, the standard acceptance gate every ANN deployment
    runs before switching retrieval over (Johnson et al., the FAISS eval
    protocol).  Composes the two oracle-pinned queries: exact cosine
    top-10 (q_cosine_topk) ∩ IVF top-10 (q_ann_ivf) → one row
    (k, n_hits, recall_at_k).  100 TB shape: both inputs are already
    top-k-bounded (TakeOrderedAndProject), so the intersection join and
    the final agg are driver-trivial regardless of corpus size; the
    production form maps this over a SAMPLE of query vectors — the
    fixture's single query pins the semantics."""
    exact = q_cosine_topk(spark, sf_dir).select("vec_id")
    ivf = q_ann_ivf(spark, sf_dir).select("vec_id")
    return (exact.join(ivf, "vec_id")
            .agg(F.count("*").cast("long").alias("n_hits"))
            .select(F.lit(_IVF_TOPK).cast("long").alias("k"), "n_hits",
                    F.round(F.col("n_hits").cast("double") / _IVF_TOPK, 4)
                     .alias("recall_at_k")))


def _sql_ann_recall() -> str:
    """Composes the exact-top-k and IVF oracle CTEs verbatim — the twins
    cannot drift from their standalone hash-green forms."""
    return f"""
WITH exact_k AS ({SQL_COSINE_TOPK}),
ivf_k AS ({_sql_ann_ivf()})
SELECT {_IVF_TOPK}::BIGINT AS k,
       count(*)::BIGINT AS n_hits,
       round(count(*) / {_IVF_TOPK}.0, 4) AS recall_at_k
FROM exact_k JOIN ivf_k USING (vec_id)
"""


# the production recall audit's query sample: 10 deterministic vec_ids
# just past the centroid range (17..26) — at 100 TB this is a uniform
# random sample; determinism here keeps the oracle exact
_ANN_SAMPLE_Q = list(range(_IVF_K + 1, _IVF_K + 11))


def q_ann_recall_sample(spark, sf_dir):
    """The PRODUCTION form of the ANN recall audit (q_ann_recall pins the
    single-query semantics; its docstring promised this): recall@k of the
    IVF path vs exact brute-force top-k over a 10-query sample, one row
    per query plus a mean row (query_id = −1, n_hits = total hits).

    Vectorized over the sample — NOT a per-query loop: ONE corpus scan
    broadcast-joined against the 10-row query set scores all (vector,
    query) pairs; per-query exact top-k is a window rank partitioned by
    query_id; the IVF side assigns cells ONCE (the same Arrow argmax
    projection ann_ivf pins), probes via a broadcast (query_id, cell) map
    — at 10^10 rows with a cell-partitioned store that probe map is a
    partition-pruning predicate — and takes the same per-query window
    top-k.  Per-query candidate work stays O(topk) rows into the final
    intersection join, so the audit's cost is ~|sample| × one ann_ivf,
    independent of corpus size."""
    e = _t(spark, sf_dir, "embeddings")
    cents = (e.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= _IVF_K))
             .select("vec_id", "embedding").orderBy("vec_id").collect())
    cmat = [list(map(float, r["embedding"])) for r in cents]
    cids = [int(r["vec_id"]) for r in cents]
    cents_lit = F.lit(cmat).cast("array<array<float>>")
    cid_lit = F.lit(cids).cast("array<long>")
    qs = (e.filter(F.col("vec_id").isin(_ANN_SAMPLE_Q))
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")

    # exact per-query top-k: one scan × broadcast 10-row query set; pair
    # scoring through the Arrow kernel (bit-equal to _cos4 — _pair_cos4_np)
    pairs = (e.select("vec_id", "embedding")
             .join(F.broadcast(qs), F.col("vec_id") != F.col("query_id"))
             .select("query_id", "vec_id",
                     _udf_pair_cos4("embedding", F.col("qv"))
                     .alias("cos_sim")))
    exact = (pairs.withColumn("rn", F.row_number().over(wq))
             .filter(F.col("rn") <= _IVF_TOPK).select("query_id", "vec_id"))

    # IVF per-query: one cell assignment (Arrow argmax — bit-equal to the
    # literal chain, see q_ann_ivf), per-query probe map, window top-k
    scored = _ivf_cells_arrow(e.select("vec_id", "embedding"), cmat, cids)
    wp = Window.partitionBy("query_id").orderBy(F.desc("qcos"), "cell")
    probe = (qs.select(
                 "query_id",
                 F.posexplode(F.transform(
                     cents_lit, lambda c: _cos4(F.col("qv"), c)))
                  .alias("pos", "qcos"))
             .select("query_id",
                     F.element_at(cid_lit, F.col("pos").cast("int") + 1)
                      .alias("cell"), "qcos")
             .withColumn("rn", F.row_number().over(wp))
             .filter(F.col("rn") <= _IVF_NPROBE).select("query_id", "cell"))
    ivf = (scored.join(F.broadcast(probe), "cell")
           .join(F.broadcast(qs.withColumnRenamed("query_id", "qid")),
                 F.col("qid") == F.col("query_id"))
           .filter(F.col("vec_id") != F.col("query_id"))
           .select("query_id", "vec_id",
                   _udf_pair_cos4("embedding", F.col("qv"))
                   .alias("cos_sim"))
           .withColumn("rn", F.row_number().over(wq))
           .filter(F.col("rn") <= _IVF_TOPK).select("query_id", "vec_id"))

    # both inputs are top-k-bounded (≤ |sample|·topk rows at ANY corpus
    # size), so the intersection and the per-query hit counts are
    # broadcast-safe by construction — hint them so the plan never
    # falls back to a sort-merge exchange
    per_q = (qs.select("query_id")
             .join(F.broadcast(exact.join(F.broadcast(ivf),
                                          ["query_id", "vec_id"])
                   .groupBy("query_id")
                   .agg(F.count(F.lit(1)).alias("hits"))),
                   "query_id", "left")
             .select("query_id",
                     F.lit(_IVF_TOPK).cast("long").alias("k"),
                     F.coalesce("hits", F.lit(0)).cast("long")
                      .alias("n_hits"))
             .withColumn("recall_at_k",
                         F.round(F.col("n_hits") / _IVF_TOPK, 4)))
    mean = per_q.agg(
        F.lit(-1).cast("long").alias("query_id"),
        F.lit(_IVF_TOPK).cast("long").alias("k"),
        F.sum("n_hits").cast("long").alias("n_hits"),
        F.round(F.sum("n_hits")
                / (F.count(F.lit(1)) * _IVF_TOPK), 4).alias("recall_at_k"))
    return per_q.unionByName(mean)


def _sql_ann_recall_sample() -> str:
    """Window-function twin: same pair scoring, same per-query ranks, same
    probe rule, same mean row — composed from the cosine/IVF expression
    families the standalone oracles pin."""
    cos = (lambda a, b:
           f"round(list_inner_product({a}, {b}) / "
           f"(sqrt(list_inner_product({a}, {a})) * "
           f"sqrt(list_inner_product({b}, {b}))), 4)")
    qlist = ", ".join(map(str, _ANN_SAMPLE_Q))
    return f"""
WITH qs AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id IN ({qlist})),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND {_IVF_K}),
exact_r AS (
  SELECT qs.query_id, e.vec_id,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY {cos('e.embedding', 'qs.qv')} DESC,
                                     e.vec_id) AS rn
  FROM embeddings e, qs WHERE e.vec_id <> qs.query_id
),
exact_k AS (SELECT query_id, vec_id FROM exact_r WHERE rn <= {_IVF_TOPK}),
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {cos('e.embedding', 'c.cv')} DESC,
                                     c.cid) AS rn
  FROM embeddings e, c
),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
probe_r AS (
  SELECT qs.query_id, c.cid AS cell,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY {cos('c.cv', 'qs.qv')} DESC, c.cid)
           AS rn
  FROM c, qs
),
probe AS (SELECT query_id, cell FROM probe_r WHERE rn <= {_IVF_NPROBE}),
ivf_r AS (
  SELECT qs.query_id, cells.vec_id,
         row_number() OVER (PARTITION BY qs.query_id
                            ORDER BY {cos('cells.embedding', 'qs.qv')} DESC,
                                     cells.vec_id) AS rn
  FROM cells JOIN probe USING (cell) JOIN qs USING (query_id)
  WHERE cells.vec_id <> qs.query_id
),
ivf_k AS (SELECT query_id, vec_id FROM ivf_r WHERE rn <= {_IVF_TOPK}),
per_q AS (
  SELECT qs.query_id, {_IVF_TOPK}::BIGINT AS k,
         coalesce(h.hits, 0)::BIGINT AS n_hits,
         round(coalesce(h.hits, 0) / {_IVF_TOPK}.0, 4) AS recall_at_k
  FROM qs LEFT JOIN (
    SELECT query_id, count(*) AS hits
    FROM exact_k JOIN ivf_k USING (query_id, vec_id)
    GROUP BY query_id) h USING (query_id)
)
SELECT query_id, k, n_hits, recall_at_k FROM per_q
UNION ALL
SELECT -1::BIGINT, {_IVF_TOPK}::BIGINT, sum(n_hits)::BIGINT,
       round(sum(n_hits) / (count(*) * {_IVF_TOPK}.0), 4)
FROM per_q
"""


def q_a3_recent(spark, sf_dir):
    """A3 — recent-discoveries ring: last 50 events by time
    (presenter/dashboard.go:306-315; trivially relational here)."""
    e = _t(spark, sf_dir, "events")
    return (e.orderBy(F.desc("ts"), F.desc("event_id"))
             .limit(50)
             .select("event_id", "event_type"))


SQL_A3 = """
SELECT event_id, event_type FROM events
ORDER BY ts DESC, event_id DESC LIMIT 50
"""


def q_a2_rates(spark, sf_dir):
    """A2 — rates as a first-class relational query (the reference computes
    tasks/s / req/s live in the TUI, presenter/dashboard.go:178-221, and
    never persists them): tumbling 1-hour windows per event_type with a
    per-second rate.  Pure JVM groupBy(window) — partial-aggregated
    map-side, shuffles only (bucket, type) pairs; at 100 TB the bucket
    count grows with time span, not row count, so the shuffle stays tiny."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("requests"))
             .select(F.col("w.start").alias("bucket"), "event_type",
                     "requests",
                     F.round(F.col("requests") / F.lit(3600.0), 4)
                      .alias("rate_per_sec")))


SQL_A2 = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
       count(*) AS requests,
       round(count(*) / 3600.0, 4) AS rate_per_sec
FROM events GROUP BY 1, 2
"""


def q_a2_windowed(spark, sf_dir):
    """A2's event-time streaming twin, oracled (round-7 review ask #6):
    the EXACT aggregation ``streaming/rates.windowed_rates`` runs inside
    the watermarked stream, applied to the batch events table (on batch
    input ``withWatermark`` is a no-op). The chain is closed in two hops:
    tests/test_streaming_rates.py pins stream output ≡ this batch form,
    and the DuckDB row pins this batch form ≡ SQL — so the streaming
    surface is value-hash checked end-to-end, not rows-only."""
    from ..streaming.rates import windowed_rates

    return windowed_rates(_t(spark, sf_dir, "events"), window="5 minutes")


SQL_A2_WINDOWED = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket, event_type,
       count(*) AS requests,
       round(count(*) / 300.0, 4) AS rate_per_sec
FROM events GROUP BY 1, 2
"""


_SESSION_GAP_US = 1800 * 1_000_000  # 30-minute inactivity gap


def q_sessionize(spark, sf_dir):
    """Sessionization over the events log: per user, a new session starts
    after ≥30 min of inactivity (classic two-window shape: lag → gap flag →
    running sum = session id → per-session aggregate). Timestamps compared
    at microsecond precision so both engines hash identically; the ts
    column is TIMESTAMP_NTZ, so all arithmetic uses zone-free DIFFERENCES
    (timestamp_diff / epoch_us deltas) — no session-timezone dependence.
    Scale note: the windows partition by user_id — bounded per-user event
    counts at web scale; a hot user would take the salted two-phase form
    used by operators/politeness.py."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    new_s = (gap.isNull() | (gap > _SESSION_GAP_US)).cast("long")
    sid = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    x = e.select("user_id", "event_id", "ts", sid.alias("session_id"))
    return (x.groupBy("user_id", "session_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min("event_id").alias("first_event"),
                  F.floor(F.timestamp_diff("MICROSECOND", F.min("ts"),
                                           F.max("ts")) / F.lit(1_000_000))
                  .cast("long").alias("duration_sec")))


SQL_SESSIONIZE = f"""
WITH x AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id, us,
         -- DuckDB sum() over integers yields HUGEINT, which pandas converts
         -- to float64 ('5.0') and the driver's canonicalizer then hash-
         -- mismatches against Spark's bigint '5' — cast back to BIGINT.
         -- (Audited the other oracles: this was the only uncast integer
         -- aggregate in an OUTPUT column; sum(double)s stay DOUBLE.)
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM x
)
SELECT user_id, session_id, count(*) AS n_events,
       min(event_id) AS first_event,
       (max(us) - min(us)) // 1000000 AS duration_sec
FROM s GROUP BY user_id, session_id
"""


def q_props_json(spark, sf_dir):
    """Scalar-function surface: JSON field extraction + grouped aggregate
    over the events.props JSON column."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.select("event_type", k.alias("k"))
             .groupBy("event_type")
             .agg(F.round(F.avg("k"), 2).alias("avg_k"),
                  F.max("k").alias("max_k")))


SQL_PROPS_JSON = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


_EMB_BANDS = 2  # sign-LSH bands for near-dup recall (2·r ≤ 64 dims)


def q_emb_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs via BANDED adaptive sign-LSH:
    2 bands of r = _lsh_bits(N) coordinate hyperplanes (dims [0,r) and
    [r,2r)); candidate pairs share EITHER band's bucket (minhash-LSH
    banding shape — recall survives the larger r), then exact cosine ≥ 0.4
    confirms, DISTINCT dedups pairs caught by both bands.

    Scale math at the 10^10-row target: r=28 → 2.7·10^8 buckets/band,
    ~37 rows/bucket → ~670 candidate pairs/bucket → ~1.8·10^11 exact
    cosines across both bands — shuffle-partitioned by band hash, vs
    5·10^19 all-pairs. Bucket count grows with N (r follows log2 N), so
    no fixed-cardinality degeneration (VERDICT r2 #1 closed)."""
    e = _t(spark, sf_dir, "embeddings")
    r = _lsh_bits(e.count())
    bands = e.select(
        "vec_id", "embedding",
        F.explode(F.array(*[
            F.concat(F.lit(f"{k}:"),
                     _lsh_bucket_expr("embedding", r, offset=k * r)
                     .cast("string"))
            for k in range(_EMB_BANDS)])).alias("bh"))
    a = bands.select(F.col("vec_id").alias("a"),
                     F.col("embedding").alias("ea"), "bh")
    c = bands.select(F.col("vec_id").alias("b"),
                     F.col("embedding").alias("eb"), "bh")
    j = a.join(c, "bh").filter(F.col("a") < F.col("b"))
    # exact confirm through the Arrow pair kernel (bit-equal to the old
    # zip_with/aggregate lambda tree — _pair_cos4_np); at ~400k candidate
    # pairs (sf1.0) the interpreted lambdas were the query's dominant cost
    return (j.select("a", "b",
                     _udf_pair_cos4("ea", "eb").alias("cos_sim"))
             .filter(F.col("cos_sim") >= 0.4).distinct())


def _sql_emb_near_dup() -> str:
    band_hashes = ", ".join(
        f"'{k}:' || {_sql_bucket('r', offset=f'{k} * r')}::VARCHAR"
        for k in range(_EMB_BANDS))
    return f"""
WITH params AS (
  SELECT greatest({_LSH_MIN_BITS}, least({_LSH_MAX_BITS},
           ceil(log2(count(*) / {_LSH_TARGET}.0))))::INT AS r
  FROM embeddings
), bands AS (
  SELECT vec_id, embedding, unnest([{band_hashes}]) AS bh
  FROM embeddings, params
)
SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
  round(list_inner_product(x.embedding, y.embedding) /
        (sqrt(list_inner_product(x.embedding, x.embedding))
         * sqrt(list_inner_product(y.embedding, y.embedding))), 4) AS cos_sim
FROM bands x JOIN bands y ON x.bh = y.bh AND x.vec_id < y.vec_id
WHERE round(list_inner_product(x.embedding, y.embedding) /
        (sqrt(list_inner_product(x.embedding, x.embedding))
         * sqrt(list_inner_product(y.embedding, y.embedding))), 4) >= 0.4
"""


def q_x2_extract_html(spark, sf_dir):
    """X2 — HTML-aware extraction (domain_service.go:156-195; dead code in
    the reference's main path, parity-kept): href host via url.Parse,
    proto-relative src, interleaved text-node X1 extraction, in document
    order. The general urlparse semantics are pinned by unit tests porting
    the reference's own cases (domain_service_test.go:311-337); the DuckDB
    oracle checks the UDF output on this synthetic input family, whose
    expected hosts are a closed form of (source, lang) — verified
    assumptions: doc text carries no '.'/'<' (no stray extractions), and
    '/path/2f2f.example.com' sits in a TEXT node, so X1 legitimately finds
    '2f2f.example.com' inside it (the path-lookalike rejection applies to
    href/src attrs only)."""
    d = _docs_wide(spark, sf_dir)
    html = F.concat(F.lit('<a href="http://link-'), "source",
                    F.lit('.example.com/x">'), F.substring("text", 1, 40),
                    F.lit('</a> <img src="//img-'), "lang",
                    F.lit('.example.org"> and text-'), "source",
                    F.lit(".example.net plus /path/2f2f.example.com"))
    d = d.withColumn("html", html)
    # '|'-joined (order-preserving) — driver-hashable scalar output
    return d.select(
        "doc_id",
        F.array_join(udfs.udf_extract_hosts_html("html"), "|").alias("hosts"))


SQL_X2 = """
SELECT doc_id,
  'link-' || source || '.example.com|img-' || lang ||
  '.example.org|text-' || source || '.example.net|2f2f.example.com' AS hosts
FROM documents
"""


def q_img_pipeline(spark, sf_dir):
    """Multimodal binary-column pipeline (north-rule payload path,
    functions/image.py): per-row synthetic gradient image → real codec
    encode/decode (raw | lossy BMP) → roundtrip validation (exact /
    PSNR≥40 dB per BASELINE.json input_hint) → average-hash. The oracle
    states the analytically-derived half-plane phash per orientation
    (verified equal to the kernel's output; derivation in the UDF
    docstring)."""
    d = _docs_wide(spark, sf_dir).select("doc_id")
    r = d.select("doc_id", udfs.udf_img_pipeline("doc_id").alias("p"))
    return r.select("doc_id", F.col("p.fmt").alias("fmt"),
                    F.col("p.phash").alias("phash"),
                    F.col("p.pixels_ok").alias("pixels_ok"))


SQL_IMG_PIPELINE = """
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'raw' ELSE 'lossy' END AS fmt,
  (CASE WHEN doc_id % 4 = 0 THEN 4294967295            -- rows 4-7 set
        WHEN doc_id % 4 = 1 THEN -4294967296           -- rows 0-3 set
        WHEN doc_id % 4 = 2 THEN 1085102592571150095   -- cols 4-7 (0x0F..)
        ELSE -1085102592571150096 END)::BIGINT AS phash -- cols 0-3 (0xF0..)
  , true AS pixels_ok
FROM documents
"""


def q_sample_split(spark, sf_dir):
    """Deterministic content-hash sampling — the train/val/test split a
    training-data pipeline needs to be reproducible across runs and engines
    (no rand(): the split is a pure function of the document text).
    fp61(text) mod 100 → [0,90) train / [90,95) val / else test; the same
    Rabin-Karp fingerprint both engines already agree on byte-for-byte."""
    d = _docs_wide(spark, sf_dir)
    bucket = F.pmod(udfs.udf_fingerprint64("text"), F.lit(100))
    split = (F.when(bucket < 90, "train")
              .when(bucket < 95, "val")
              .otherwise("test"))
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


def _sql_sample_split() -> str:
    return f"""
SELECT doc_id,
       {_sql_fp61('text')} % 100 AS bucket,
       CASE WHEN {_sql_fp61('text')} % 100 < 90 THEN 'train'
            WHEN {_sql_fp61('text')} % 100 < 95 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# -- payload validation on STORED bytes (north-rule invariant, M5) -----------
# The driver's sf tables carry no binary columns, so the query materializes a
# deterministic image+caption fixture parquet ONCE (no RNG — closed-form
# gradient images in four orientations, real raw/lossy codecs) and runs the
# REAL corpus-bytes path: operators/validate.validate_payloads — image_id
# join + one Arrow pass decoding stored bytes, PSNR≥40-or-exact gate +
# caption equality. The DuckDB oracle reads the same parquet but never
# decodes: expected psnr/ok per row are a closed form of the row class
# (i mod 2/4/5/7), with the psnr literals computed at SQL-generation time by
# the same numpy kernels the executors run.

_PAYLOAD_FIXTURE = "/tmp/spark_graft_payload_fixture_v1.parquet"
_PAYLOAD_N = 280


def _payload_grays():
    import numpy as np

    g = np.arange(16, dtype=np.uint8) * 16 + 2  # +2 → lossy quant error = 2
    return [np.repeat(g, 16).reshape(16, 16),
            np.repeat(g[::-1], 16).reshape(16, 16),
            np.tile(g, 16).reshape(16, 16),
            np.tile(g[::-1], 16).reshape(16, 16)]


def _payload_imgs(i: int):
    """(reference image, got image) for row i. Deterministic classes:
    fmt raw/lossy by i%2, orientation i%4, corrupted top-left channel
    (XOR 0x10) iff i%7==0, dirty caption iff i%5==0."""
    import numpy as np

    img = np.stack([_payload_grays()[i % 4]] * 3, axis=2)
    got = img.copy()
    if i % 7 == 0:
        got[0, 0, 0] ^= 0x10
    return img, got


def _ensure_payload_fixture() -> str:
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions import image as img_m

    if os.path.exists(_PAYLOAD_FIXTURE):
        return _PAYLOAD_FIXTURE
    rows = {k: [] for k in ("image_id", "bytes", "fmt", "caption",
                            "ref_bytes", "ref_fmt", "ref_caption")}
    for i in range(_PAYLOAD_N):
        ref, got = _payload_imgs(i)
        fmt = "raw" if i % 2 == 0 else "lossy"
        rows["image_id"].append(f"img{i}")
        rows["bytes"].append(img_m.encode_image(got, fmt))
        rows["fmt"].append(fmt)
        cap = f"cap-{i}"
        rows["caption"].append(cap + ("-dirty" if i % 5 == 0 else ""))
        rows["ref_bytes"].append(img_m.encode_image(ref, "raw"))
        rows["ref_fmt"].append("raw")
        rows["ref_caption"].append(cap)
    # unique tmp name per builder process: concurrent builders (pytest
    # workers, parallel driver+test run) must not interleave writes to one
    # tmp file and atomically install a corrupt parquet (round-8 ADVICE)
    tmp = f"{_PAYLOAD_FIXTURE}.{os.getpid()}.tmp"
    pq.write_table(pa.table(rows), tmp)
    os.replace(tmp, _PAYLOAD_FIXTURE)  # atomic vs concurrent builders
    return _PAYLOAD_FIXTURE


def q_payload_validate(spark, sf_dir):
    """M5 — per-row payload validation on STORED bytes (input_hint: decoded
    pixels allclose — PSNR≥40 dB for lossy / exact for lossless — plus
    caption equality): real codec decode of the fixture parquet's binary
    columns through operators/validate.validate_payloads (image_id join +
    one Arrow batch pass). At 100 TB both sides bucket by image_id so the
    join is shuffle-local; here the fixture is one file."""
    _ensure_payload_fixture()
    from ..operators.validate import validate_payloads

    t = spark.read.parquet(_PAYLOAD_FIXTURE)
    got = t.select("image_id", "bytes", "fmt", "caption")
    ref = t.select("image_id", F.col("ref_bytes").alias("bytes"),
                   F.col("ref_fmt").alias("fmt"),
                   F.col("ref_caption").alias("caption"))
    v = validate_payloads(got, ref)
    return v.select("image_id", "fmt",
                    F.round("psnr_db", 4).alias("psnr_db"),
                    "pixels_ok", "caption_ok", "payload_ok")


def _sql_payload_validate() -> str:
    """Closed-form oracle: psnr literals computed by the SAME numpy kernels
    at SQL-generation time, one per row class (clean lossy / corrupt raw /
    corrupt lossy; clean raw = exact → 1e9 sentinel)."""
    from ..functions import image as img_m

    def p(i):
        ref, got = _payload_imgs(i)
        fmt = "raw" if i % 2 == 0 else "lossy"
        dec = img_m.decode_image(img_m.encode_image(got, fmt), fmt)
        return round(min(img_m.psnr(dec, ref), 1e9), 4)

    clean_lossy = p(1)      # quant error 2 everywhere
    corrupt_raw = p(14)     # one channel off by 16, raw
    corrupt_lossy = p(7)    # one channel off by 18 post-quant + 2 elsewhere
    assert p(3) == clean_lossy and p(28) == corrupt_raw and p(21) == corrupt_lossy
    return f"""
WITH t AS (
  SELECT image_id, fmt, caption, ref_caption,
         CAST(substring(image_id, 4) AS INT) AS i
  FROM read_parquet('{_PAYLOAD_FIXTURE}')
)
SELECT image_id, fmt,
  CASE WHEN i % 7 <> 0 AND i % 2 = 0 THEN 1000000000.0
       WHEN i % 7 <> 0 THEN {clean_lossy}
       WHEN i % 2 = 0 THEN {corrupt_raw}
       ELSE {corrupt_lossy} END AS psnr_db,
  (i % 2 = 1 OR i % 7 <> 0) AS pixels_ok,
  (caption = ref_caption) AS caption_ok,
  ((i % 2 = 1 OR i % 7 <> 0) AND caption = ref_caption) AS payload_ok
FROM t
"""


# -- image near-dup dedup (pHash Hamming, multi-index hashing) ---------------
# The input_hint corpus carries phash:int64 per image+caption row; a training
# pipeline dedups it by Hamming distance, not byte equality (re-encoded /
# lightly-perturbed copies hash nearby, not equal).  The scale shape is
# multi-index hashing (Norouzi et al., "Fast Search in Hamming Space with
# Multi-Index Hashing"): split the 64-bit hash into b=4 disjoint 16-bit
# bands — any two codes within Hamming radius r ≤ b−1 = 3 agree EXACTLY on
# at least one band (pigeonhole), so an equi-self-join per band generates a
# candidate superset and one JVM bit_count(xor) confirm filter finishes it.
# No all-pairs anywhere; the join partitions by (band, value).  The fixture
# is deterministic and carries the exact input_hint shape
# (image_id, bytes, w, h, fmt, caption, phash) with REAL encoded payloads:
# phash is computed by functions/image.average_hash on the DECODED stored
# bytes and asserted equal to the designed bit pattern at build time.

_IMG_CORPUS_FIXTURE = "/tmp/spark_graft_img_corpus_v1.parquet"
_IMG_GROUPS = 100
_IMG_RADIUS = 3  # b=4 16-bit bands certify exactly r ≤ 3


def _img_group_patterns():
    """Deterministic 8×8 phash bit patterns: one 64-bit base per group
    (RandomState(1234), pairwise Hamming ≥ 12 — asserted), members are the
    base with 0 / 1 / 2 / 4 designed bit flips.  Members 0-2 sit pairwise
    at or below the MIH radius (distances up to exactly 3, the boundary);
    the 4-flip member is ≥ 4 from every sibling (a designed singleton) yet
    its flips span only 2 of the 4 bands, so band-join candidates exist
    that the confirm filter must reject.
    Inter-group distances ≥ 12 − 4 − 4 = 4 > radius: provably no cross-group
    pairs."""
    import numpy as np

    rs = np.random.RandomState(1234)
    bases = rs.randint(0, 2, size=(_IMG_GROUPS, 64), dtype=np.uint8)
    xors = np.bitwise_xor(bases[:, None, :], bases[None, :, :]).sum(axis=2)
    np.fill_diagonal(xors, 64)
    assert xors.min() >= 12, f"base separation broke: {xors.min()}"
    pats = []
    for g in range(_IMG_GROUPS):
        base = bases[g]
        # members 1/2 flip within pattern indices 0..31 (bands 3/2 of the
        # packed int); member 3's four flips live ONLY in indices 32..63
        # (bands 1/0), so it agrees with base on both of bands 3/2 — and
        # with member 1 on whichever of them member 1 left untouched —
        # while sitting at distance ≥ 4 from every sibling: guaranteed
        # band-join candidates the confirm must reject.
        flips = [(), ((g * 7 + 3) % 32,),
                 ((g * 11 + 5) % 32, (g * 13 + 17) % 32)]
        b0 = g % 16
        flips.append((32 + b0, 32 + (b0 + 7) % 16,
                      48 + b0, 48 + (b0 + 9) % 16))
        for m, fl in enumerate(flips):
            p = base.copy()
            for bit in set(fl):
                p[bit] ^= 1
            if p.sum() in (0, 64):  # keep the ≥-mean threshold two-sided
                p[63] ^= 1
            pats.append((g, m, p))
    return pats


def _img_pattern_to_image(pat):
    """8×8 bit pattern → 16×16 RGB whose average_hash is exactly that
    pattern: pixel 50 + 150·bit, so every set cell (200) ≥ the cell mean
    (50 + 150·k/64, 0<k<64) and every unset cell (50) is below it; the
    6-bit lossy quantization (200→200, 50→48) preserves both sides."""
    import numpy as np

    gray = (np.kron(pat.reshape(8, 8), np.ones((2, 2), dtype=np.uint8))
            * 150 + 50).astype(np.uint8)
    return np.stack([gray] * 3, axis=2)


def _ensure_img_corpus_fixture() -> str:
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions import image as img_m

    if os.path.exists(_IMG_CORPUS_FIXTURE):
        return _IMG_CORPUS_FIXTURE
    rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash")}
    for idx, (g, m, pat) in enumerate(_img_group_patterns()):
        img = _img_pattern_to_image(pat)
        fmt = "raw" if idx % 2 == 0 else "lossy"
        enc = img_m.encode_image(img, fmt)
        ph = img_m.average_hash(img_m.decode_image(enc, fmt))
        want = int(np.uint64(
            int("".join(map(str, pat.tolist())), 2)).astype(np.int64))
        assert ph == want, f"phash kernel diverged from design at row {idx}"
        cap = (f"alt text variant {g}" if (m == 1 and g % 3 == 0)
               else f"a photo of scene {g}")
        rows["image_id"].append(f"im{idx:05d}")
        rows["bytes"].append(enc)
        rows["w"].append(16)
        rows["h"].append(16)
        rows["fmt"].append(fmt)
        rows["caption"].append(cap)
        rows["phash"].append(ph)
    schema = pa.schema([("image_id", pa.string()), ("bytes", pa.binary()),
                        ("w", pa.int32()), ("h", pa.int32()),
                        ("fmt", pa.string()), ("caption", pa.string()),
                        ("phash", pa.int64())])
    # unique tmp per process: concurrent builders must not interleave
    # writes to one tmp file and install a corrupt parquet (round-8 ADVICE)
    tmp = f"{_IMG_CORPUS_FIXTURE}.{os.getpid()}.tmp"
    pq.write_table(pa.table(rows, schema=schema), tmp)
    os.replace(tmp, _IMG_CORPUS_FIXTURE)  # atomic vs concurrent builders
    return _IMG_CORPUS_FIXTURE


def _img_corpus(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(_ensure_img_corpus_fixture())


def _img_band_pairs(imgs: DataFrame,
                    bucket_cap: int | None = None,
                    observer=None) -> DataFrame:
    """MIH candidate generation + exact confirm: posexplode the 4 16-bit
    bands (shiftrightunsigned keeps negative phashes correct), equi-self-join
    per (band, value), dedup multi-band hits, confirm with JVM
    bit_count(xor) ≤ radius.  Radius > 3 means more/wider bands
    (b = r+1), not a different plan.

    ``bucket_cap`` — the 10^10-row hot-bucket guard, same star-expansion
    shape as _lsh_band_pairs: a (band, value) bucket with k > bucket_cap
    members emits the clique over its bucket_cap smallest image_ids plus
    one star edge from each overflow member to the bucket minimum —
    O(cap² + k) candidates instead of O(k²).  SEMANTIC DIFFERENCE from
    the text cap, disclosed: MIH candidates pass a distance CONFIRM, so
    a star edge whose endpoints exceed the radius is dropped and the
    capped pair graph's components may under-merge relative to uncapped
    (the standard LSH recall-for-boundedness trade; exact duplicates
    collapse under exact dedup first, so overflow buckets are near-dup
    clone sets where the bucket min is within radius of most members).
    ``observer`` rides the caller's first action with the same
    capped_buckets / star_edges / dropped_pairs telemetry as
    _lsh_band_pairs, so a 100 TB run sees capping without reading logs.
    Default None = exact (the oracle-pinned path).

    Round-11 NEGATIVE RESULT, kept as a record: an exact hot-bucket
    sub-band refinement was built and measured (split buckets over
    _MIH_REFINE_T members by the six 8-bit sub-bands outside the matched
    band — pigeonhole-exact for radius ≤ 5).  At sf1.0, where one
    low-entropy simhash band value is shared by 10.5k of 50k docs (90M
    candidate pairs for a 140k-pair result), it REGRESSED
    simhash_near_dup 6 s → 11-16 s: the naive path's BroadcastHashJoin
    spreads the hot bucket's probes round-robin across every core with
    the pushed-down bit_count confirm filtering inline (~20 ns/candidate,
    well-parallelized), while the refined shape aligned the join to the
    (band, value) partitioning and serialized the hot bucket into ONE
    task — and the sub-bands of templated text are themselves
    low-entropy, so candidates only dropped 2× (90M → 45M).  The naive
    broadcast enumerate-and-confirm is the right shape until candidate
    enumeration itself dominates, which is what ``bucket_cap`` is for."""
    bands = imgs.select(
        "image_id", "phash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("phash", 16 * k).bitwiseAND(F.lit(0xFFFF))
            for k in range(4)])).alias("band", "bv"))
    dist = F.bit_count(F.col("lp").bitwiseXOR(F.col("rp"))).cast("long")
    if bucket_cap is None:
        a = bands.select(F.col("image_id").alias("left_id"),
                         F.col("phash").alias("lp"), "band", "bv")
        b = bands.select(F.col("image_id").alias("right_id"),
                         F.col("phash").alias("rp"), "band", "bv")
        cand = (a.join(b, ["band", "bv"])
                 .filter(F.col("left_id") < F.col("right_id"))
                 .select("left_id", "right_id", "lp", "rp").distinct())
        return (cand.withColumn("dist", dist)
                    .filter(F.col("dist") <= _IMG_RADIUS))
    # capped path — mirrors _lsh_band_pairs: size + min in one un-sorted
    # window pass over the same (band, bv) exchange the join reuses; the
    # SORTED rank window only sees over-cap buckets (rare by construction)
    wp = Window.partitionBy("band", "bv")
    sized = bands.select(
        "image_id", "phash", "band", "bv",
        F.count(F.lit(1)).over(wp).alias("k"),
        F.min("image_id").over(wp).alias("bmin"))
    small = sized.filter(F.col("k") <= bucket_cap)
    pairs_small = (small.select(F.col("image_id").alias("left_id"),
                                F.col("phash").alias("lp"), "band", "bv")
                   .join(small.select(F.col("image_id").alias("right_id"),
                                      F.col("phash").alias("rp"),
                                      "band", "bv"),
                         ["band", "bv"])
                   .filter(F.col("left_id") < F.col("right_id"))
                   .select("left_id", "right_id", "lp", "rp"))
    big = sized.filter(F.col("k") > bucket_cap)
    ws = Window.partitionBy("band", "bv").orderBy("image_id")
    bigr = big.withColumn("rn", F.row_number().over(ws))
    bighead = bigr.filter(F.col("rn") <= bucket_cap)
    clique_big = (bighead.select(F.col("image_id").alias("left_id"),
                                 F.col("phash").alias("lp"), "band", "bv")
                  .join(bighead.select(F.col("image_id").alias("right_id"),
                                       F.col("phash").alias("rp"),
                                       "band", "bv"),
                        ["band", "bv"])
                  .filter(F.col("left_id") < F.col("right_id"))
                  .select("left_id", "right_id", "lp", "rp"))
    overflow = bigr.filter(F.col("rn") > bucket_cap)
    if observer is not None:
        head = (F.col("rn") == bucket_cap + 1).cast("long")
        cap_pairs = bucket_cap * (bucket_cap - 1) // 2
        overflow = overflow.observe(
            observer,
            F.coalesce(F.sum(head), F.lit(0)).alias("capped_buckets"),
            F.count(F.lit(1)).alias("star_edges"),
            F.coalesce(F.sum((F.expr("k * (k - 1) div 2")
                              - F.lit(cap_pairs)
                              - (F.col("k") - bucket_cap)) * head),
                       F.lit(0)).alias("dropped_pairs"))
    # star: overflow member → bucket min (rn==1 row carries bmin's phash;
    # bmin < every overflow image_id by construction)
    bminrow = (bigr.filter(F.col("rn") == 1)
               .select(F.col("image_id").alias("left_id"),
                       F.col("phash").alias("lp"), "band", "bv"))
    star = (overflow.select(F.col("image_id").alias("right_id"),
                            F.col("phash").alias("rp"), "band", "bv")
            .join(bminrow, ["band", "bv"])
            # duplicate image_id values inside one over-cap bucket would
            # otherwise emit a self-edge that the dist==0 confirm passes
            # (id uniqueness is an implicit contract — round-10 ADVICE);
            # the clique branches already exclude these via left < right
            .filter(F.col("left_id") != F.col("right_id"))
            .select("left_id", "right_id", "lp", "rp"))
    cand = (pairs_small.unionByName(clique_big).unionByName(star)
            .distinct())
    return (cand.withColumn("dist", dist)
                .filter(F.col("dist") <= _IMG_RADIUS))


def q_img_near_dup_pairs(spark, sf_dir):
    """Image near-dup pairs by pHash Hamming ≤ 3 via multi-index hashing
    over the input_hint corpus — the image-payload twin of
    minhash_lsh_pairs.  The DuckDB oracle brute-forces bit_count(xor) over
    all pairs, so the MIH band decomposition (superset + confirm) is
    verified exhaustive at fixture scale, including the designed
    band-collision rows whose distance exceeds the radius (candidates the
    confirm filter must drop)."""
    return (_img_band_pairs(_img_corpus(spark))
            .select("left_id", "right_id", "dist"))


def _sql_img_near_dup() -> str:
    return f"""
WITH t AS (SELECT image_id, phash
           FROM read_parquet('{_IMG_CORPUS_FIXTURE}'))
SELECT a.image_id AS left_id, b.image_id AS right_id,
       bit_count(xor(a.phash, b.phash))::BIGINT AS dist
FROM t a JOIN t b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_IMG_RADIUS}
"""


def q_img_dup_groups(spark, sf_dir):
    """Image duplicate clusters: MIH near-dup edges → the same
    pointer-jumping connected-components operator the text pipeline uses
    (operators/components.py), group label = min numeric image id of the
    cluster, singletons their own group — identical semantics to
    dedup_pipeline, over the image payload.  Node ids are the numeric
    suffix of image_id (CC and its Arrow fast path need int64 nodes)."""
    from ..operators.components import connected_components, \
        free_checkpoint_blocks

    imgs = _img_corpus(spark)
    nid = lambda c: F.substring(c, 3, 16).cast("long")  # noqa: E731
    edges = (_img_band_pairs(imgs)
             .select(nid("left_id").alias("a"), nid("right_id").alias("b")))
    labels = connected_components(edges)
    out = (imgs.select("image_id", nid("image_id").alias("id"))
               .join(labels, "id", "left")
               .select("image_id",
                       F.coalesce("label", "id").alias("group_id")))
    out = out.localCheckpoint(eager=True)  # labels freed below stay unused
    free_checkpoint_blocks(labels)
    return out


def _sql_img_dup_groups() -> str:
    return (f"""WITH RECURSIVE t AS (
  SELECT image_id, CAST(substring(image_id, 3) AS BIGINT) AS id, phash
  FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
), pairs AS (
  SELECT a.id AS a, b.id AS b
  FROM t a JOIN t b ON a.id < b.id
  WHERE bit_count(xor(a.phash, b.phash)) <= {_IMG_RADIUS}
), """ + _SQL_CC_CTES + """
SELECT t.image_id, coalesce(cc.group_id, t.id) AS group_id
FROM t LEFT JOIN cc ON t.id = cc.id
""")


def q_img_caption_conflicts(spark, sf_dir):
    """Training-data hygiene: near-duplicate images whose captions DISAGREE
    — the rows a caption-supervised training set must reconcile before
    dedup collapses them (keeping an arbitrary member silently drops the
    other label).  Near-dup edges from the MIH pipeline joined back to the
    corpus captions (broadcast-sized here; at scale the same image_id-
    bucketed join payload_validate uses), filtered to caption inequality."""
    imgs = _img_corpus(spark)
    caps = imgs.select("image_id", "caption")
    pairs = _img_band_pairs(imgs).select("left_id", "right_id", "dist")
    out = (pairs
           .join(caps.select(F.col("image_id").alias("left_id"),
                             F.col("caption").alias("left_caption")),
                 "left_id")
           .join(caps.select(F.col("image_id").alias("right_id"),
                             F.col("caption").alias("right_caption")),
                 "right_id")
           .filter(F.col("left_caption") != F.col("right_caption")))
    return out.select("left_id", "right_id", "dist",
                      "left_caption", "right_caption")


def _sql_img_caption_conflicts() -> str:
    return f"""
WITH t AS (SELECT image_id, caption, phash
           FROM read_parquet('{_IMG_CORPUS_FIXTURE}'))
SELECT a.image_id AS left_id, b.image_id AS right_id,
       bit_count(xor(a.phash, b.phash))::BIGINT AS dist,
       a.caption AS left_caption, b.caption AS right_caption
FROM t a JOIN t b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_IMG_RADIUS}
  AND a.caption <> b.caption
"""


# -- video frame sampling (multimodal brief op: binary col → mapInPandas) ----
# The brief names frame-sampling as a first-class multimodal op.  The video
# fixture packs the image corpus's DECODED frames into real ``rawv``
# containers (functions/video.py — 25 videos × 16 frames of the 400-image
# fixture), so the Spark kernel genuinely parses binary video bytes and
# hashes sampled frames, while the DuckDB oracle derives the expected
# phashes from the INDEPENDENT image fixture's phash column (itself
# asserted equal to the designed bit pattern at build time) — the two
# sides meet only at the values.

_VIDEO_FIXTURE = "/tmp/spark_graft_video_corpus_v1.parquet"
_VIDEO_FRAMES = 16
_VIDEO_STRIDE = 4


def _ensure_video_fixture() -> str:
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions import image as img_m
    from ..functions import video as vid_m

    if os.path.exists(_VIDEO_FIXTURE):
        return _VIDEO_FIXTURE
    imgs = pq.read_table(_ensure_img_corpus_fixture(),
                         columns=["image_id", "bytes", "fmt"]).to_pandas()
    imgs = imgs.sort_values("image_id").reset_index(drop=True)
    n_videos = len(imgs) // _VIDEO_FRAMES
    rows = {k: [] for k in ("video_id", "bytes", "w", "h", "n_frames",
                            "fps", "fmt")}
    for v in range(n_videos):
        sl = imgs.iloc[v * _VIDEO_FRAMES:(v + 1) * _VIDEO_FRAMES]
        frames = np.stack([
            img_m.decode_image(b, f)
            for b, f in zip(sl["bytes"], sl["fmt"])])
        rows["video_id"].append(f"vid{v:03d}")
        rows["bytes"].append(vid_m.encode_video(frames))
        rows["w"].append(frames.shape[2])
        rows["h"].append(frames.shape[1])
        rows["n_frames"].append(_VIDEO_FRAMES)
        rows["fps"].append(25)
        rows["fmt"].append("rawv")
    schema = pa.schema([("video_id", pa.string()), ("bytes", pa.binary()),
                        ("w", pa.int32()), ("h", pa.int32()),
                        ("n_frames", pa.int32()), ("fps", pa.int32()),
                        ("fmt", pa.string())])
    # unique tmp per process: concurrent builders must not interleave
    # writes to one tmp file and install a corrupt parquet (round-8 ADVICE)
    tmp = f"{_VIDEO_FIXTURE}.{os.getpid()}.tmp"
    pq.write_table(pa.table(rows, schema=schema), tmp)
    os.replace(tmp, _VIDEO_FIXTURE)  # atomic vs concurrent builders
    return _VIDEO_FIXTURE


def _sampled_frame_hashes(videos: DataFrame,
                          stride: int = _VIDEO_STRIDE) -> DataFrame:
    """Stride frame sampling + per-frame phash over binary video columns
    via ``mapInPandas``: each Arrow batch of (video_id, bytes, fmt) rows
    explodes into sampled-frame rows, and the kernel materializes ONLY
    sampled frames (offset arithmetic into the container —
    functions/video.py).  At 10^10 videos this is an embarrassingly
    parallel scan: no shuffle, cost ∝ bytes hashed."""
    import pandas as pd  # noqa: F811 — worker-side import

    from ..functions import image as img_m
    from ..functions import video as vid_m

    def kernel(batches):
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "phash": []}
            for vid, buf, fmt in zip(pdf["video_id"], pdf["bytes"],
                                     pdf["fmt"]):
                for idx, frame in vid_m.sample_frames(buf, stride, fmt):
                    out["video_id"].append(vid)
                    out["frame_idx"].append(idx)
                    out["phash"].append(img_m.average_hash(frame))
            if out["video_id"]:  # empty object-dtype frames break Arrow
                yield pd.DataFrame(out)

    return (videos.select("video_id", "bytes", "fmt")
            .mapInPandas(kernel,
                         "video_id string, frame_idx long, phash long"))


def q_video_frame_sample(spark, sf_dir):
    """Stride-4 frame sampling + per-frame phash (the brief's multimodal
    batch shape — see _sampled_frame_hashes for the kernel contract); the
    output (video_id, frame_idx, phash) feeds the SAME MIH near-dup
    pipeline as still images (q_video_near_dup proves the composition)."""
    return _sampled_frame_hashes(
        spark.read.parquet(_ensure_video_fixture()))


def _sql_video_frame_sample() -> str:
    return f"""
WITH imgs AS (
  SELECT CAST(substring(image_id, 3) AS BIGINT) AS idx, phash
  FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
)
SELECT 'vid' || lpad((idx // {_VIDEO_FRAMES})::VARCHAR, 3, '0') AS video_id,
       (idx % {_VIDEO_FRAMES})::BIGINT AS frame_idx,
       phash
FROM imgs
WHERE (idx % {_VIDEO_FRAMES}) % {_VIDEO_STRIDE} = 0
"""


# -- cross-video near-dup (frame sampling composed into MIH dedup) -----------
# The realistic cross-modal dedup a training pipeline runs: sample frames,
# phash them, and feed the SAME multi-index-hashing near-dup operator the
# still-image pipeline uses — videos sharing Hamming-near frames are
# near-duplicates (re-encodes, clips, mirrors-with-intro).  The fixture
# packs designed image-fixture members into 30 rawv videos in triples
# (3p, 3p+1, 3p+2): at the sampled positions video 3p carries group bases
# (member 0), 3p+1 the 2-flip member (Hamming ≤ 3 from base → a TRUE pair),
# and 3p+2 the 4-flip member (band-colliding with the base yet ≥ 4 away —
# an MIH candidate the confirm filter must reject).  Unsampled positions
# hold other group members the kernel must skip without decoding.

_VIDEO_ND_FIXTURE = "/tmp/spark_graft_video_nd_corpus_v1.parquet"
_VIDEO_ND_VIDEOS = 30
_VIDEO_ND_FRAMES = 8


def _video_nd_member(v: int, j: int) -> tuple[int, int]:
    """(group, member) of the image-fixture frame at video v, frame j.
    Sampled frames (j % _VIDEO_STRIDE == 0) carry member 0/2/3 by video
    role r = v % 3; unsampled frames carry member j % 4 (payload the
    stride kernel must never touch)."""
    p, r = divmod(v, 3)
    g = 4 * p + j // _VIDEO_STRIDE
    m = (0, 2, 3)[r] if j % _VIDEO_STRIDE == 0 else j % 4
    return g, m


def _ensure_video_nd_fixture() -> str:
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions import image as img_m
    from ..functions import video as vid_m

    if os.path.exists(_VIDEO_ND_FIXTURE):
        return _VIDEO_ND_FIXTURE
    imgs = pq.read_table(_ensure_img_corpus_fixture(),
                         columns=["image_id", "bytes", "fmt"]).to_pandas()
    imgs = imgs.sort_values("image_id").reset_index(drop=True)
    rows = {k: [] for k in ("video_id", "bytes", "w", "h", "n_frames",
                            "fps", "fmt")}
    for v in range(_VIDEO_ND_VIDEOS):
        frames = []
        for j in range(_VIDEO_ND_FRAMES):
            g, m = _video_nd_member(v, j)
            row = imgs.iloc[4 * g + m]
            frames.append(img_m.decode_image(row["bytes"], row["fmt"]))
        frames = np.stack(frames)
        rows["video_id"].append(f"vidnd{v:03d}")
        rows["bytes"].append(vid_m.encode_video(frames))
        rows["w"].append(frames.shape[2])
        rows["h"].append(frames.shape[1])
        rows["n_frames"].append(_VIDEO_ND_FRAMES)
        rows["fps"].append(25)
        rows["fmt"].append("rawv")
    schema = pa.schema([("video_id", pa.string()), ("bytes", pa.binary()),
                        ("w", pa.int32()), ("h", pa.int32()),
                        ("n_frames", pa.int32()), ("fps", pa.int32()),
                        ("fmt", pa.string())])
    # unique tmp per process: concurrent builders must not interleave
    # writes to one tmp file and install a corrupt parquet (round-8 ADVICE)
    tmp = f"{_VIDEO_ND_FIXTURE}.{os.getpid()}.tmp"
    pq.write_table(pa.table(rows, schema=schema), tmp)
    os.replace(tmp, _VIDEO_ND_FIXTURE)  # atomic vs concurrent builders
    return _VIDEO_ND_FIXTURE


def q_video_near_dup(spark, sf_dir):
    """Cross-video near-duplicate detection: sampled-frame phashes →
    _img_band_pairs (the identical MIH band join + bit_count confirm the
    image pipeline uses) → per-video-pair aggregation.  Scale shape: the
    frame sample is a no-shuffle scan; the band join partitions by
    (band, value); the final groupBy aggregates the (sparse) frame-pair
    set — nothing all-pairs.  The oracle brute-forces frame-pair Hamming
    over phashes derived from the INDEPENDENT image fixture."""
    frames = _sampled_frame_hashes(
        spark.read.parquet(_ensure_video_nd_fixture()))
    fid = F.concat_ws(":", "video_id", "frame_idx")
    # persist the hashed sample before the banded self-join — the decode
    # kernel otherwise runs once per join side (round 11; same fix as
    # q_simhash_near_dup, 16 B/row cache at any scale)
    fr = frames.select(fid.alias("image_id"), "phash").persist()
    pairs = _img_band_pairs(fr)
    vid = lambda c: F.substring_index(c, ":", 1)  # noqa: E731
    out = (pairs
           .select(vid("left_id").alias("left_video"),
                   vid("right_id").alias("right_video"), "dist")
           .filter(F.col("left_video") != F.col("right_video"))
           .groupBy("left_video", "right_video")
           .agg(F.count(F.lit(1)).alias("n_frame_pairs"),
                F.min("dist").alias("min_dist"))
           .localCheckpoint(eager=True))
    fr.unpersist()
    return out


def _sql_video_near_dup() -> str:
    """Brute-force twin: regenerate each sampled frame's phash from the
    image fixture via the SAME (video, frame) → (group, member) layout
    formula (member 0/2/3 by video role), then all-pairs Hamming over
    sampled frames of DIFFERENT videos, aggregated per video pair."""
    return f"""
WITH imgs AS (
  SELECT CAST(substring(image_id, 3) AS INT) AS idx, phash
  FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
), sampled AS (
  SELECT 'vidnd' || lpad(v.v::VARCHAR, 3, '0') AS video_id,
         j.j AS frame_idx, i.phash
  FROM (SELECT unnest(generate_series(0, {_VIDEO_ND_VIDEOS - 1})) AS v) v
  CROSS JOIN (SELECT unnest(generate_series(0, {_VIDEO_ND_FRAMES - 1},
                                            {_VIDEO_STRIDE})) AS j) j
  JOIN imgs i
    ON i.idx = 4 * (4 * (v.v // 3) + j.j // {_VIDEO_STRIDE})
               + CASE v.v % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 3 END
)
SELECT a.video_id AS left_video, b.video_id AS right_video,
       count(*)::BIGINT AS n_frame_pairs,
       min(bit_count(xor(a.phash, b.phash)))::BIGINT AS min_dist
FROM sampled a JOIN sampled b ON a.video_id < b.video_id
WHERE bit_count(xor(a.phash, b.phash)) <= {_IMG_RADIUS}
GROUP BY 1, 2
"""


# -- video scene cuts (temporal delta over the frame-hash kernel) ------------


_SCENE_CUT_T = 7  # ND fixture: intra-scene member distances are ≤ 6 by design


def q_video_scene_cuts(spark, sf_dir):
    """Scene-cut detection: per-frame phash (stride-1 sampling — every
    frame decoded) → window ``lag`` per video → Hamming distance between
    consecutive frames → cut where dist ≥ threshold.  The ND fixture's
    frame layout makes this meaningful: frames 0-3 / 4-7 of each video are
    members of ONE image group each (intra-scene deltas provably ≤ 6:
    member flip sets are ≤ 2 bits in [0,32) and 4 bits in [32,64), so the
    widest member pair is 2+4 = 6), while the j=3→4 boundary crosses
    groups (base separation ≥ 12).  Threshold 7 therefore never fires
    inside a scene; boundary rows fire when the member algebra leaves
    ≥ 7 of the inter-group distance (role 0 rows provably do: ≥ 12−4 = 8).
    Scale shape: no-shuffle decode scan → ONE hash-partition by video_id
    for the window (frames per video bounded) — the standard temporal
    operator a video training pipeline runs before frame dedup."""
    frames = _sampled_frame_hashes(
        spark.read.parquet(_ensure_video_nd_fixture()), stride=1)
    w = Window.partitionBy("video_id").orderBy("frame_idx")
    prev = F.lag("phash").over(w)
    dist = F.bit_count(prev.bitwiseXOR(F.col("phash"))).cast("long")
    return (frames.select("video_id", "frame_idx", dist.alias("dist"))
                  .filter(F.col("dist").isNotNull())
                  .withColumn("is_cut", F.col("dist") >= _SCENE_CUT_T))


def _sql_video_scene_cuts() -> str:
    """Brute-force twin: regenerate EVERY frame's phash from the image
    fixture via the full (video, frame) → (group, member) layout formula
    (sampled AND unsampled positions — stride 1 touches them all), then
    the same lag-window Hamming delta."""
    return f"""
WITH imgs AS (
  SELECT CAST(substring(image_id, 3) AS INT) AS idx, phash
  FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
), frames AS (
  SELECT 'vidnd' || lpad(v.v::VARCHAR, 3, '0') AS video_id,
         j.j AS frame_idx, i.phash
  FROM (SELECT unnest(generate_series(0, {_VIDEO_ND_VIDEOS - 1})) AS v) v
  CROSS JOIN (SELECT unnest(generate_series(0, {_VIDEO_ND_FRAMES - 1}))
              AS j) j
  JOIN imgs i
    ON i.idx = 4 * (4 * (v.v // 3) + j.j // {_VIDEO_STRIDE})
               + CASE WHEN j.j % {_VIDEO_STRIDE} = 0
                      THEN CASE v.v % 3 WHEN 0 THEN 0 WHEN 1 THEN 2
                           ELSE 3 END
                      ELSE j.j % 4 END
), lagged AS (
  SELECT video_id, frame_idx, phash,
         lag(phash) OVER (PARTITION BY video_id ORDER BY frame_idx) AS prev
  FROM frames
)
SELECT video_id, frame_idx,
       bit_count(xor(prev, phash))::BIGINT AS dist,
       bit_count(xor(prev, phash)) >= {_SCENE_CUT_T} AS is_cut
FROM lagged WHERE prev IS NOT NULL
"""


# -- image stats (per-image pixel statistics, integer-exact) -----------------


def q_img_stats(spark, sf_dir):
    """Per-image pixel statistics over decoded bytes — the image-quality
    filter pass of a multimodal training pipeline (brightness/contrast
    gates before dedup): integer-exact n/sum/sum-of-squares/min/max over
    every channel byte, one Arrow batch pass, no shuffle, one image in
    memory at a time.  Kept integer (sum/sum_sq instead of mean/variance)
    so the oracle matches bit-for-bit — the caller derives mean = sum/n
    and var = (sum_sq − sum²/n)/n.  The DuckDB twin recomputes all five
    from the DESIGN closed form (the fixture's images are 2×2-block
    mosaics of exactly two gray levels, 200 for set phash bits and 50 —
    48 after the lossy codec's 6-bit quantization — for unset, 12 channel
    bytes per cell), so a broken decode or stat kernel hash-mismatches."""
    return _img_stats_frame(_img_corpus(spark))


def _img_stats_frame(imgs: DataFrame) -> DataFrame:
    """The q_img_stats decode+stats kernel as a library call over
    ``imgs(image_id, bytes, fmt, ...)`` — also composed by
    q_img_quality_filter."""
    import pandas as pd  # noqa: F811 — worker-side import

    from ..functions import image as img_m

    def kernel(batches):
        for pdf in batches:
            out = {"image_id": [], "n_px": [], "sum_px": [],
                   "sum_sq": [], "min_px": [], "max_px": []}
            for iid, buf, fmt in zip(pdf["image_id"], pdf["bytes"],
                                     pdf["fmt"]):
                a = img_m.decode_image(buf, fmt).astype("int64")
                out["image_id"].append(iid)
                out["n_px"].append(int(a.size))
                out["sum_px"].append(int(a.sum()))
                out["sum_sq"].append(int((a * a).sum()))
                out["min_px"].append(int(a.min()))
                out["max_px"].append(int(a.max()))
            if out["image_id"]:  # empty object-dtype frames break Arrow
                yield pd.DataFrame(out)

    return (imgs.select("image_id", "bytes", "fmt")
            .mapInPandas(kernel,
                         "image_id string, n_px long, sum_px long, "
                         "sum_sq long, min_px long, max_px long"))


def _sql_img_stats() -> str:
    """Closed-form recomputation: k = popcount(phash) set cells at gray
    200, 64−k unset cells at 50 (raw) / 48 (lossy), 12 channel bytes per
    cell; the fixture guarantees 0 < k < 64 (the builder flips bit 63 of
    any all-set/all-unset pattern), so min/max are always lo/200."""
    return f"""
WITH t AS (
  SELECT image_id, bit_count(phash)::BIGINT AS k,
         CASE WHEN fmt = 'lossy' THEN 48 ELSE 50 END::BIGINT AS lo
  FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
)
SELECT image_id,
       768::BIGINT AS n_px,
       (12 * (k * 200 + (64 - k) * lo))::BIGINT AS sum_px,
       (12 * (k * 40000 + (64 - k) * lo * lo))::BIGINT AS sum_sq,
       lo AS min_px, 200::BIGINT AS max_px
FROM t
"""


# -- image+caption quality filter (the multimodal twin of quality_filter) ----

# integer-exact gate thresholds (× n_px forms below — no float compare):
# mean < 120 rejects the dark end of the fixture's mean range [104, 153];
# var < 5100 rejects low-contrast mosaics (range ≈ [4834, 5776]); captions
# under 5 tokens reject the fixture's 4-token alt-text class
_IQF_MIN_MEAN = 120
_IQF_MIN_VAR = 5100
_IQF_MIN_CAP_TOKENS = 5


def q_img_quality_filter(spark, sf_dir):
    """The image+caption twin of the text quality_filter — the keep/reject
    pass a multimodal training pipeline runs over (image, caption) pairs
    before dedup: brightness gate (mean pixel), contrast gate (pixel
    variance), caption-length gate, fused with first-failing-rule reasons
    (too_dark → low_contrast → bad_caption → kept).  Composes the
    oracle-pinned q_img_stats decode kernel (_img_stats_frame) with pure
    JVM gate expressions; every comparison is INTEGER (sum_px <
    mean·n_px; n·sum_sq − sum² < var·n² — int64-safe to gigapixel
    images), so the closed-form oracle matches bit-for-bit with no float
    rounding contract.  100 TB shape: one no-shuffle Arrow decode scan +
    one image_id equi-join for the caption column (the same
    image_id-bucketed join payload_validate uses at scale); gates are
    free projections."""
    imgs = _img_corpus(spark)
    stats = _img_stats_frame(imgs)
    caps = imgs.select("image_id", "caption")
    j = stats.join(caps, "image_id")
    n_cap = F.size(F.split(F.trim("caption"), r"\s+"))
    reason = (
        F.when(F.col("sum_px") < _IQF_MIN_MEAN * F.col("n_px"), "too_dark")
        .when(F.col("n_px") * F.col("sum_sq")
              - F.col("sum_px") * F.col("sum_px")
              < _IQF_MIN_VAR * F.col("n_px") * F.col("n_px"),
              "low_contrast")
        .when(n_cap < _IQF_MIN_CAP_TOKENS, "bad_caption")
        .otherwise("kept"))
    return j.select("image_id", reason.alias("reason"),
                    (reason == "kept").alias("keep"))


def _sql_img_quality_filter() -> str:
    """Closed-form twin: the q_img_stats design recomputation (popcount
    cells at gray 200/lo, 12 channel bytes per cell) feeding the same
    integer gate arithmetic + the caption token count."""
    return f"""
WITH t AS (
  SELECT image_id, caption, bit_count(phash)::BIGINT AS k,
         CASE WHEN fmt = 'lossy' THEN 48 ELSE 50 END::BIGINT AS lo
  FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
), s AS (
  SELECT image_id, caption, 768::BIGINT AS n,
         (12 * (k * 200 + (64 - k) * lo))::BIGINT AS sum_px,
         (12 * (k * 40000 + (64 - k) * lo * lo))::BIGINT AS sum_sq
  FROM t
), v AS (
  SELECT image_id,
    CASE
      WHEN sum_px < {_IQF_MIN_MEAN} * n THEN 'too_dark'
      WHEN n * sum_sq - sum_px * sum_px < {_IQF_MIN_VAR} * n * n
        THEN 'low_contrast'
      WHEN len(list_filter(regexp_split_to_array(trim(caption), '\\s+'),
                           w -> w <> '')) < {_IQF_MIN_CAP_TOKENS}
        THEN 'bad_caption'
      ELSE 'kept' END AS reason
  FROM s
)
SELECT image_id, reason, reason = 'kept' AS keep FROM v
"""


# -- image resize (multimodal brief op) --------------------------------------


def q_img_resize(spark, sf_dir):
    """The brief's resize op as an Arrow batch kernel: decode stored corpus
    bytes → 2× nearest-neighbor upscale AND factor-2 box-mean downscale
    (functions/image.py) → phash of each.  The fixture's images are uniform
    2×2-block mosaics, so BOTH resizes provably preserve the average-hash
    (NN doubling keeps cells uniform; box-mean of a uniform block is exact)
    — the oracle pins phash_up = phash_down = the stored phash, making the
    resize kernels' pixel arithmetic correctness-gated, not just unit-
    tested.  Same no-shuffle scan shape as video_frame_sample."""
    import pandas as pd  # noqa: F811 — worker-side import

    from ..functions import image as img_m

    def kernel(batches):
        for pdf in batches:
            out = {"image_id": [], "phash_up": [], "phash_down": []}
            for iid, buf, fmt in zip(pdf["image_id"], pdf["bytes"],
                                     pdf["fmt"]):
                img = img_m.decode_image(buf, fmt)
                up = img_m.resize_nearest(img, img.shape[0] * 2,
                                          img.shape[1] * 2)
                down = img_m.resize_box_mean(img, 2)
                out["image_id"].append(iid)
                out["phash_up"].append(img_m.average_hash(up))
                out["phash_down"].append(img_m.average_hash(down))
            if out["image_id"]:  # empty object-dtype frames break Arrow
                yield pd.DataFrame(out)

    t = _img_corpus(spark).select("image_id", "bytes", "fmt", "phash")
    hashed = (t.select("image_id", "bytes", "fmt")
               .mapInPandas(kernel,
                            "image_id string, phash_up long, "
                            "phash_down long"))
    return (hashed.join(t.select("image_id", "phash"), "image_id")
                  .select("image_id", "phash_up", "phash_down",
                          ((F.col("phash_up") == F.col("phash"))
                           & (F.col("phash_down") == F.col("phash")))
                          .alias("scale_invariant")))


def _sql_img_resize() -> str:
    """Independent recomputation twin (round-8 VERDICT ask #4 — the old
    form restated the stored phash, gating less than the audio oracle):
    unpack the stored phash into the designed 8×8 pattern (the build
    asserts bytes ⇄ pattern ⇄ phash agree), regenerate the decoded cell
    gray values (200 for set bits; 50, quantized to 48 by the lossy
    codec's top-6-bit mask, for unset), replay the kernels' integer
    arithmetic — factor-2 box mean ⌊Σ/4⌋ over the uniform 2×2 cell and
    the NN-upscale's 4×4 uniform block mean ⌊Σ/16⌋ — then recompute the
    average-hash threshold (cell ≥ mean of all 64 cells) and repack the
    64-bit code (b=0 is the int64 sign bit).  A broken resize or hash
    kernel changes the Spark side and hash-mismatches this recomputation."""
    return f"""
WITH t AS (
  SELECT image_id, fmt, phash FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
), bits AS (
  SELECT t.image_id, t.fmt, t.phash, b.b,
         (t.phash >> (63 - b.b)) & 1 AS bit
  FROM t, (SELECT unnest(generate_series(0, 63)) AS b) b
), px AS (
  SELECT image_id, phash, b,
         CASE WHEN bit = 1 THEN 200
              WHEN fmt = 'lossy' THEN 48 ELSE 50 END AS v
  FROM bits
), cells AS (
  -- box-mean down: each 8x8 output cell is the floored mean of its
  -- uniform 2x2 source block; NN up: each of the avg-hash's 8x8 cells
  -- covers a uniform 4x4 block of the 32x32 upscale
  SELECT image_id, phash, b,
         (4 * v) // 4 AS cell_down,
         (16 * v) // 16 AS cell_up
  FROM px
), thresh AS (
  SELECT image_id, phash, b, cell_down, cell_up,
         avg(cell_down) OVER (PARTITION BY image_id) AS mean_down,
         avg(cell_up) OVER (PARTITION BY image_id) AS mean_up
  FROM cells
), packed AS (
  SELECT image_id, phash,
         (sum(CASE WHEN b > 0 AND cell_up >= mean_up
                   THEN 1::BIGINT << (63 - b) ELSE 0 END)
          + sum(CASE WHEN b = 0 AND cell_up >= mean_up
                     THEN -9223372036854775808 ELSE 0 END))::BIGINT
         AS phash_up,
         (sum(CASE WHEN b > 0 AND cell_down >= mean_down
                   THEN 1::BIGINT << (63 - b) ELSE 0 END)
          + sum(CASE WHEN b = 0 AND cell_down >= mean_down
                     THEN -9223372036854775808 ELSE 0 END))::BIGINT
         AS phash_down
  FROM thresh GROUP BY image_id, phash
)
SELECT image_id, phash_up, phash_down,
       (phash_up = phash AND phash_down = phash) AS scale_invariant
FROM packed
"""


# -- audio windowed features (multimodal brief op) ----------------------------
# Exact-arithmetic windowed feature extraction over real PCM16 bytes
# (functions/audio.py).  The fixture waveform is the closed-form integer
# sawtooth x(c, i) = ((i·(c+3)) mod 2048) − 1024, so the DuckDB oracle
# regenerates every sample from generate_series and must agree bit-for-bit
# on the integer features (sum_sq/peak/zcr) and on rms (sqrt of an
# identical integer ratio with a power-of-two denominator).

_AUDIO_FIXTURE = "/tmp/spark_graft_audio_corpus_v1.parquet"
_AUDIO_CLIPS = 40
_AUDIO_SAMPLES = 1024


def _ensure_audio_fixture() -> str:
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions import audio as aud_m

    if os.path.exists(_AUDIO_FIXTURE):
        return _AUDIO_FIXTURE
    rows = {k: [] for k in ("audio_id", "bytes", "sr", "n_samples", "fmt")}
    i = np.arange(_AUDIO_SAMPLES, dtype=np.int64)
    for c in range(_AUDIO_CLIPS):
        x = ((i * (c + 3)) % 2048 - 1024).astype(np.int16)
        rows["audio_id"].append(f"aud{c:03d}")
        rows["bytes"].append(aud_m.encode_audio(x, sr=16000))
        rows["sr"].append(16000)
        rows["n_samples"].append(_AUDIO_SAMPLES)
        rows["fmt"].append("pcm16")
    schema = pa.schema([("audio_id", pa.string()), ("bytes", pa.binary()),
                        ("sr", pa.int32()), ("n_samples", pa.int32()),
                        ("fmt", pa.string())])
    # unique tmp per process: concurrent builders must not interleave
    # writes to one tmp file and install a corrupt parquet (round-8 ADVICE)
    tmp = f"{_AUDIO_FIXTURE}.{os.getpid()}.tmp"
    pq.write_table(pa.table(rows, schema=schema), tmp)
    os.replace(tmp, _AUDIO_FIXTURE)  # atomic vs concurrent builders
    return _AUDIO_FIXTURE


def q_audio_features(spark, sf_dir):
    """Audio feature extraction (brief op): decode PCM16 binary columns,
    256-sample windows → exact integer sum_sq / peak / zcr + derived rms,
    one Arrow pass via mapInPandas, no shuffle.  At 10^10 clips the scan
    parallelizes by file split; window features never cross rows, so the
    kernel holds ONE clip's samples at a time."""
    import pandas as pd  # noqa: F811 — worker-side import

    from ..functions import audio as aud_m

    def kernel(batches):
        for pdf in batches:
            out = {"audio_id": [], "win": [], "sum_sq": [], "peak": [],
                   "zcr": [], "rms": []}
            for aid, buf, fmt in zip(pdf["audio_id"], pdf["bytes"],
                                     pdf["fmt"]):
                _, x = aud_m.decode_audio(buf, fmt)
                for w, sum_sq, peak, zcr, rms in aud_m.window_features(x):
                    out["audio_id"].append(aid)
                    out["win"].append(w)
                    out["sum_sq"].append(sum_sq)
                    out["peak"].append(peak)
                    out["zcr"].append(zcr)
                    out["rms"].append(rms)
            if out["audio_id"]:  # empty object-dtype frames break Arrow
                yield pd.DataFrame(out)

    t = spark.read.parquet(_ensure_audio_fixture())
    return (t.select("audio_id", "bytes", "fmt")
             .mapInPandas(kernel,
                          "audio_id string, win long, sum_sq long, "
                          "peak long, zcr long, rms double"))


def _sql_audio_features() -> str:
    from ..functions import audio as aud_m

    win = aud_m.WINDOW  # shared constant — the two engines cannot drift
    return f"""
WITH s AS (
  SELECT c.c AS clip, i.i AS i,
         ((i.i * (c.c + 3)) % 2048) - 1024 AS x
  FROM generate_series(0, {_AUDIO_CLIPS - 1}) c(c)
  CROSS JOIN generate_series(0, {_AUDIO_SAMPLES - 1}) i(i)
), w AS (
  SELECT clip, i // {win} AS win, x, i % {win} AS j,
         lag(x) OVER (PARTITION BY clip ORDER BY i) AS px
  FROM s
)
SELECT 'aud' || lpad(clip::VARCHAR, 3, '0') AS audio_id,
       win::BIGINT AS win,
       sum(x * x)::BIGINT AS sum_sq,
       max(abs(x))::BIGINT AS peak,
       sum(CASE WHEN j > 0 AND px * x < 0 THEN 1 ELSE 0 END)::BIGINT AS zcr,
       round(sqrt(sum(x * x) / {win}.0), 4) AS rms
FROM w GROUP BY clip, win
"""


# -- audio near-dup (energy-delta fingerprint -> the shared MIH operator) ----
# The audio leg of the cross-modal dedup family.  The fixture is built
# FINGERPRINT-FIRST: a designed 64-bit pattern per clip (SplitMix64 base
# per group + role-specific flip sets), realized as PCM whose per-window
# amplitude walks +1/-1 with the pattern's bits — energy (256·A²) is
# strictly monotone in A, so the energy-delta signs recover the pattern
# exactly.  The builder asserts bytes -> fingerprint64 -> pattern
# round-trips for every clip, the designed fingerprint is stored alongside
# the bytes (like the image fixture's phash), the Spark query RECOMPUTES
# it from the bytes, and the output carries both endpoint fingerprints so
# the oracle's stored-fp brute force catches bit-permutation/XOR-constant
# kernel breaks that pairwise distances alone would hide.

_AUDIO_ND_FIXTURE = "/tmp/spark_graft_audio_nd_corpus_v1.parquet"
_AUDIO_ND_GROUPS = 20
_M64 = (1 << 64) - 1


def _audio_nd_fp(g: int, role: int) -> int:
    """Designed (unsigned) fingerprint for clip (group g, role).  Role 0:
    SplitMix64(g) base.  Role 1: near-dup member — 3 flips, one in each of
    MIH bands 0-2 (dist 3 = the radius, must pair with base).  Role 2:
    reject — even groups flip 5 bits INSIDE band 1 (bands 0/2/3 still
    equal: a designed band-collision candidate the bit_count confirm must
    drop); odd groups flip 3 bits in EVERY band (dist 12, no equal band:
    never even a candidate)."""
    z = (g * 0x9E3779B97F4A7C15 + 0x2545F4914F6CDD1D) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    base = z ^ (z >> 31)
    if role == 1:
        return base ^ ((1 << 5) | (1 << 26) | (1 << 47))
    if role == 2:
        if g % 2 == 0:
            return base ^ (0b11111 << 18)
        return base ^ ((0b111 << 2) | (0b111 << 18)
                       | (0b111 << 34) | (0b111 << 50))
    return base


def _ensure_audio_nd_fixture() -> str:
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions import audio as aud_m

    if os.path.exists(_AUDIO_ND_FIXTURE):
        return _AUDIO_ND_FIXTURE
    win = aud_m.WINDOW
    n_samples = aud_m.FP_WINDOWS * win
    sign = np.where(np.arange(n_samples) % 2 == 0, 1, -1).astype(np.int64)
    rows = {k: [] for k in ("audio_id", "bytes", "sr", "n_samples",
                            "fmt", "fp")}
    for c in range(3 * _AUDIO_ND_GROUPS):
        g, role = divmod(c, 3)
        fp_u = _audio_nd_fp(g, role)
        # amplitude walk: A[0] = 300; bit b set -> A[b+1] = A[b] + 1 else
        # A[b] - 1 (range [236, 364] — int16-safe, strictly positive, so
        # E = win·A² preserves every strict comparison)
        amps = [300]
        for b in range(64):
            amps.append(amps[-1] + (1 if (fp_u >> (63 - b)) & 1 else -1))
        wave = (np.repeat(np.array(amps, dtype=np.int64), win)
                * sign).astype(np.int16)
        fp_signed = fp_u - (1 << 64) if fp_u >= (1 << 63) else fp_u
        assert aud_m.fingerprint64(wave) == fp_signed, c  # bytes⇄fp agree
        rows["audio_id"].append(f"and{c:03d}")
        rows["bytes"].append(aud_m.encode_audio(wave, sr=16000))
        rows["sr"].append(16000)
        rows["n_samples"].append(n_samples)
        rows["fmt"].append("pcm16")
        rows["fp"].append(fp_signed)
    schema = pa.schema([("audio_id", pa.string()), ("bytes", pa.binary()),
                        ("sr", pa.int32()), ("n_samples", pa.int32()),
                        ("fmt", pa.string()), ("fp", pa.int64())])
    # unique tmp per process: concurrent builders must not interleave
    # writes to one tmp file and install a corrupt parquet (round-8 ADVICE)
    tmp = f"{_AUDIO_ND_FIXTURE}.{os.getpid()}.tmp"
    pq.write_table(pa.table(rows, schema=schema), tmp)
    os.replace(tmp, _AUDIO_ND_FIXTURE)  # atomic vs concurrent builders
    return _AUDIO_ND_FIXTURE


def _audio_fingerprints(clips: DataFrame) -> DataFrame:
    """(image_id, phash) = (audio_id, fingerprint64) — 64-bit energy-delta
    fingerprint (functions/audio.py, Haitsma-Kalker shape) recomputed from
    the PCM bytes in one no-shuffle Arrow pass; column names match
    _img_band_pairs's input contract so the audio leg plugs straight into
    the shared MIH operator."""
    import pandas as pd  # noqa: F811 — worker-side import

    from ..functions import audio as aud_m

    def kernel(batches):
        for pdf in batches:
            out = {"image_id": [], "phash": []}
            for aid, buf, fmt in zip(pdf["audio_id"], pdf["bytes"],
                                     pdf["fmt"]):
                _, x = aud_m.decode_audio(buf, fmt)
                out["image_id"].append(aid)
                out["phash"].append(aud_m.fingerprint64(x))
            if out["image_id"]:  # empty object-dtype frames break Arrow
                yield pd.DataFrame(out)

    return (clips.select("audio_id", "bytes", "fmt")
            .mapInPandas(kernel, "image_id string, phash long"))


def q_audio_near_dup(spark, sf_dir):
    """Audio near-duplicate pairs — the audio leg of the cross-modal dedup
    family (text simhash / image phash / video frames all green on the
    same operator): 64-bit energy-delta fingerprint (functions/audio.py
    fingerprint64, Haitsma-Kalker shape) RECOMPUTED FROM THE PCM BYTES in
    one no-shuffle Arrow pass (_audio_fingerprints), then the SAME
    fingerprint-agnostic MIH band join + bit_count(xor) ≤ 3 confirm
    (_img_band_pairs).  Output carries both endpoint fingerprints so the
    oracle's stored-designed-fp brute force hash-gates the kernel itself
    (a bit-permutation break preserves distances but not fingerprints).
    100 TB shape: decode scan parallel by file split, candidates bucketed
    by (band, value) — never all-pairs; hot buckets take the capped star
    expansion."""
    # persist the fingerprint frame before the banded self-join — the PCM
    # decode kernel otherwise runs once per join side (round 11; same fix
    # as q_simhash_near_dup)
    fps = _audio_fingerprints(
        spark.read.parquet(_ensure_audio_nd_fixture())).persist()
    out = (_img_band_pairs(fps).select(
        F.col("left_id").alias("left_clip"),
        F.col("right_id").alias("right_clip"),
        F.col("lp").alias("left_fp"), F.col("rp").alias("right_fp"),
        "dist").localCheckpoint(eager=True))
    fps.unpersist()
    return out


def _sql_audio_near_dup() -> str:
    """Brute-force twin over the STORED designed fingerprints (asserted
    byte-equal to the waveform at build time): all pairs, no banding —
    verifies the MIH decomposition exhaustive AND the recomputed
    fingerprints equal the designed ones."""
    return f"""
WITH t AS (SELECT audio_id, fp FROM read_parquet('{_AUDIO_ND_FIXTURE}'))
SELECT a.audio_id AS left_clip, b.audio_id AS right_clip,
       a.fp AS left_fp, b.fp AS right_fp,
       bit_count(xor(a.fp, b.fp))::BIGINT AS dist
FROM t a JOIN t b ON a.audio_id < b.audio_id
WHERE bit_count(xor(a.fp, b.fp)) <= {_IMG_RADIUS}
"""


# -- sketch ops: Arrow-UDF kernels on the Spark side, exact DuckDB twins -----
# The kernels (functions/text.py) were designed SQL-portable: polynomial
# folds mod Mersenne primes that DuckDB reproduces bit-for-bit with
# HUGEINT/BIGINT list_reduce — so even the seeded-permutation sketches get
# full value-hash oracles.

_FP_MOD = (1 << 61) - 1
_FP_BASE = 1000003


def _sql_fp61(expr: str) -> str:
    """DuckDB twin of functions/text.py fingerprint64_one: polynomial fold
    h = (h·1000003 + byte) mod 2^61-1 in HUGEINT (documents are ASCII, so
    ascii(char) == utf-8 byte)."""
    return (
        f"list_reduce(list_prepend(0::HUGEINT, list_transform("
        f"generate_series(1, length({expr})), "
        f"i -> ascii(substring({expr}, i, 1))::HUGEINT)), "
        f"(h, b) -> (h * {_FP_BASE} + b) % {_FP_MOD})::BIGINT"
    )


def q_fingerprint64(spark, sf_dir):
    """Document fingerprint: Rabin-Karp rolling hash over UTF-8 bytes mod
    2^61-1 (functions/text.py fingerprint64) via Arrow pandas UDF."""
    d = _docs_wide(spark, sf_dir)
    return d.select("doc_id", udfs.udf_fingerprint64("text").alias("fp64"))


SQL_FINGERPRINT = f"SELECT doc_id, {_sql_fp61('text')} AS fp64 FROM documents"


def q_minhash_signature(spark, sf_dir):
    """MinHash (64 seeded affine perms mod 2^31-1 over 5-byte shingles of the
    ws-collapsed text) — dedup sketch. Output comma-joined (driver-hashable);
    the DuckDB oracle embeds the same RandomState(42) coefficients."""
    d = _docs_wide(spark, sf_dir)
    sig = F.transform(udfs.udf_minhash64("text"), lambda x: x.cast("string"))
    return d.select("doc_id", F.array_join(sig, ",").alias("minhash"))


def _sql_minhash_xs(table: str = "documents") -> str:
    """Shared CTE chain (no WITH prefix — callers compose it): per-doc list
    of shingle hashes (poly-257 mod 2^31-1 over 5-char windows of the
    ws-collapsed text) — functions/text.py minhash_signatures twin."""
    p = text_k._MINHASH_P
    return f"""t AS (
  SELECT doc_id, array_to_string(
           list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> ''),
           ' ') AS tt
  FROM {table}
), sh AS (
  SELECT doc_id, CASE
      WHEN length(tt) = 0 THEN []::VARCHAR[]
      WHEN length(tt) < 5 THEN [tt]
      ELSE list_transform(generate_series(1, length(tt) - 4),
                          i -> substring(tt, i, 5))
    END AS shingles
  FROM t
), shr AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), xr AS (
  SELECT doc_id,
         list_reduce(list_prepend(0::BIGINT, list_transform(
             generate_series(1, length(s)),
             i -> ascii(substring(s, i, 1))::BIGINT)),
           (h, b) -> (h * {text_k._SH_BASE} + b) % {p}) AS x
  FROM shr
), xs AS (
  SELECT doc_id, list(x) AS xs FROM xr GROUP BY doc_id
)"""


def _sql_minhash() -> str:
    a, b = text_k._minhash_coeffs(64, 42)
    p = text_k._MINHASH_P
    terms = ", ".join(
        f"list_min(list_transform(xs, x -> ({int(ai)}*x + {int(bi)}) % {p}))::VARCHAR"
        for ai, bi in zip(a, b))
    empty = ",".join([str(p)] * 64)
    return f"""WITH {_sql_minhash_xs()}
SELECT d.doc_id,
       CASE WHEN xs IS NULL THEN '{empty}'
            ELSE concat_ws(',', {terms}) END AS minhash
FROM documents d LEFT JOIN xs ON d.doc_id = xs.doc_id
"""


def q_simhash64(spark, sf_dir):
    """SimHash over 61-bit polynomial token hashes (functions/text.py
    simhash64_batch) — near-dup sketch, bit-majority per document."""
    d = _docs_wide(spark, sf_dir)
    return d.select("doc_id", udfs.udf_simhash64("text").alias("simhash"))


def q_simhash_near_dup(spark, sf_dir):
    """SimHash near-duplicate pairs over documents — the Manku et al.
    (WWW'07) web-dedup shape: 64-bit Charikar simhash, Hamming radius 3,
    candidates via the SAME 4×16-bit multi-index-hashing band join +
    ``bit_count(xor)`` confirm the image/video pipelines use
    (_img_band_pairs is fingerprint-agnostic: ONE MIH operator serves
    text simhash, image phash, and sampled video-frame phash).  Scale
    shape: banded equi-self-join partitioned by (band, value), nothing
    all-pairs; hot buckets take the image pipeline's capped star
    expansion.  The brute-force oracle reuses the simhash recomputation
    CTE, so both the sketch AND the pair decomposition are independently
    recomputed."""
    d = _docs_wide(spark, sf_dir)
    # persist the sketch BEFORE the banded self-join: without it the plan
    # evaluates udf_simhash64 FOUR times (once per join side, and once
    # more per side below the exchange where the pushed-down
    # isnotnull(phash) filter lands — the guide §4.4 duplication; the
    # round-11 before-plan shows 4 ArrowEvalPython nodes).  The cached
    # frame is (doc_id, int64) — ~16 B/row at any scale.
    sh = (d.select(F.col("doc_id").alias("image_id"),
                   udfs.udf_simhash64("text").alias("phash"))
          .persist())
    pairs = _img_band_pairs(sh)
    out = (pairs.select(F.col("left_id").alias("left_doc"),
                        F.col("right_id").alias("right_doc"), "dist")
           .localCheckpoint(eager=True))  # materialize (runs the UDF once,
    # against the cache), then drop the sketch blocks deterministically;
    # the checkpointed result's own blocks are freed by the ContextCleaner
    # when the caller drops the frame (same pattern as scene_dedup)
    sh.unpersist()
    return out


def _sql_simhash_near_dup() -> str:
    return f"""
WITH sh AS ({_sql_simhash()})
SELECT a.doc_id AS left_doc, b.doc_id AS right_doc,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS dist
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_IMG_RADIUS}
"""


def _sql_simhash() -> str:
    csums = ", ".join(f"sum(((h >> {i}) & 1)::BIGINT) AS c{i}" for i in range(61))
    packed = " + ".join(f"CASE WHEN 2*c{i} > n THEN {1 << i} ELSE 0 END"
                        for i in range(61))
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            w -> w <> '')) AS tk
  FROM documents
), h AS (
  SELECT doc_id, {_sql_fp61('tk')} AS h FROM tok
), agg AS (
  SELECT doc_id, count(*) AS n, {csums} FROM h GROUP BY doc_id
)
SELECT d.doc_id, coalesce(({packed})::BIGINT, 0) AS simhash
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


def _band_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, bh) — one row per doc per LSH band, keyed by the band's
    128-bit struct key. 128-bit: two independent-seed xxhash64s in a
    struct. One 64-bit hash invites birthday collisions at the documented
    scale (8×10^10 band keys → expected colliding buckets, each silently
    merging unrelated dedup groups with no downstream similarity check);
    128 bits puts the expected collision count back to ~0 while keeping a
    16-byte JVM-native shuffle key (vs the old 32-byte md5 hex string
    whose transform/array_join/md5 tree also cost ~2 s of first-run
    whole-stage codegen)."""
    sig = docs.select("doc_id", udfs.udf_minhash64("text").alias("sig"))
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(7)),
                        lambda b: F.slice("sig", b * 8 + 1, 8))
        ).alias("band", "band_sig"))
    return bands.select(
        "doc_id",
        F.struct(F.xxhash64("band", "band_sig").alias("h1"),
                 F.xxhash64(F.lit(1), "band", "band_sig").alias("h2"))
         .alias("bh"))


def _lsh_band_pairs(docs: DataFrame,
                    bucket_cap: int | None = None,
                    observer=None) -> DataFrame:
    """MinHash-LSH candidate pairs over ``docs(doc_id, text)``: band the
    64-perm signature into 8 bands × 8 rows, key each band with a 128-bit
    two-seed xxhash64 struct (a 16-byte JVM-native shuffle key — the key
    is INTERNAL, so the oracle's md5-string banding produces the same
    buckets and identical pair output; see the inline note on why 64 bits
    is not enough at scale and why md5's codegen was dropped), self-join
    on the band key, dedup pairs. The banded
    self-join bounds the pair explosion — the 100 TB-safe shape, PROVIDED
    exact duplicates were collapsed first (q_dedup_pipeline): k identical
    docs share every band bucket → k(k-1)/2 pairs per bucket.

    ``bucket_cap`` (round-5 review ask — the guard exact-dup collapse
    can't provide against large NEAR-dup clone sets, e.g. template pages
    differing by one token): a bucket with k > bucket_cap members emits
    the full clique over its bucket_cap smallest doc_ids PLUS one star
    edge from each remaining member to the bucket minimum —
    O(cap² + k) pairs instead of O(k²).  NOTHING is dropped in the
    grouping sense: every member stays connected through the bucket min,
    so the connected components of the capped pair graph are PROVABLY
    identical to the uncapped clique graph's (per bucket, star and clique
    have the same span; components are unions over buckets).  Downstream
    dedup grouping (and its closure-based oracle over uncapped pairs)
    is therefore exact at any scale; only the raw pair LISTING differs,
    which is why the standalone minhash_lsh_pairs query runs uncapped.

    UNCAPPED path (round 11): the banded keys are PERSISTED and the pair
    output is materialized via an eager localCheckpoint before returning —
    the band frame feeds both sides of the self-join through two separate
    exchanges, so without the cache the 64-perm MinHash kernel runs once
    per side (the round-11 before-plan shows the duplicated
    ArrowEvalPython nodes).  The cached frame is (doc_id, 16-byte bh) ×
    8 bands — ~24 B/row·band at any scale, orders of magnitude narrower
    than the text it derives from — and is dropped deterministically once
    the pair listing is stored.  The CAPPED path stays LAZY: all of its
    branches read the window frame ``sized``, whose single
    hashpartitioning(bh) exchange is reused across them, so the kernel
    already runs once per action there and an extra materialization was
    measured as pure overhead (+0.5 s on dedup_groups at sf1.0, paired);
    the ``observer`` therefore still fires on the CALLER's first action
    (connected_components' edge materialization), exactly as before."""
    if bucket_cap is None:
        bands = _band_keys(docs).persist()
        a = bands.select(F.col("doc_id").alias("a"), "bh")
        b = bands.select(F.col("doc_id").alias("b"), "bh")
        out = (a.join(b, "bh").filter(F.col("a") < F.col("b"))
               .select("a", "b").distinct()
               .localCheckpoint(eager=True))
        bands.unpersist()
        return out
    bands = _band_keys(docs)
    # Bucket size + bucket min in ONE un-sorted window pass (count/min over
    # the whole partition need no sort, and the hash exchange on bh is the
    # same one the self-join reuses).  Buckets within the cap take the
    # plain clique self-join — identical subplans on both sides, so the
    # exchange is computed once and reused — and the SORTED ranking window
    # only ever sees rows of over-cap buckets (rare by construction; empty
    # at test scale), so the common case pays ~nothing for the guard.  An
    # earlier shape that ranked EVERY bucket and built the star via two
    # more joins measured +1.8 s per dedup_groups run at sf0.1.
    wp = Window.partitionBy("bh")
    sized = bands.select(
        "doc_id", "bh", F.count(F.lit(1)).over(wp).alias("k"),
        F.min("doc_id").over(wp).alias("bmin"))
    small = sized.filter(F.col("k") <= bucket_cap)
    pairs_small = (small.select(F.col("doc_id").alias("a"), "bh")
                   .join(small.select(F.col("doc_id").alias("b"), "bh"), "bh")
                   .filter(F.col("a") < F.col("b")).select("a", "b"))
    big = sized.filter(F.col("k") > bucket_cap)
    ws = Window.partitionBy("bh").orderBy("doc_id")
    bigr = big.withColumn("rn", F.row_number().over(ws))
    bighead = bigr.filter(F.col("rn") <= bucket_cap)
    clique_big = (bighead.select(F.col("doc_id").alias("a"), "bh")
                  .join(bighead.select(F.col("doc_id").alias("b"), "bh"),
                        "bh")
                  .filter(F.col("a") < F.col("b")).select("a", "b"))
    # star: overflow members → bucket min (bmin is rn==1, inside the
    # clique, and < every overflow doc_id by construction)
    overflow = bigr.filter(F.col("rn") > bucket_cap)
    if observer is not None:
        # Cap telemetry riding the caller's OWN first action (round-7
        # VERDICT ask #5 — the A1 counters-on-writes pattern): one row per
        # overflow member flows through this node exactly once, when
        # connected_components materializes its edge persist, so the
        # metrics cost nothing extra. rn == cap+1 marks each capped bucket
        # exactly once (that row carries the bucket's k), which yields the
        # same capped_buckets / star_edges / dropped_pairs definitions as
        # the standalone _lsh_cap_stats aggregation — pinned equal by
        # tests/test_text.py::test_dedup_pipeline_cap_observation.
        head = (F.col("rn") == bucket_cap + 1).cast("long")
        cap_pairs = bucket_cap * (bucket_cap - 1) // 2
        overflow = overflow.observe(
            observer,
            F.coalesce(F.sum(head), F.lit(0)).alias("capped_buckets"),
            F.count(F.lit(1)).alias("star_edges"),
            F.coalesce(F.sum((F.expr("k * (k - 1) div 2")
                              - F.lit(cap_pairs)
                              - (F.col("k") - bucket_cap)) * head),
                       F.lit(0)).alias("dropped_pairs"))
    star = overflow.select(F.col("bmin").alias("a"), F.col("doc_id").alias("b"))
    return pairs_small.unionByName(clique_big).unionByName(star).distinct()


def _lsh_cap_stats(docs: DataFrame, bucket_cap: int = 64) -> DataFrame:
    """Cap telemetry for the star-expansion guard (round-7 VERDICT ask #4):
    ONE row — how many band buckets exceeded ``bucket_cap``, how many star
    edges replaced clique edges, and how many clique pairs the capped
    LISTING therefore omits. Components are provably unaffected (see
    _lsh_band_pairs); this makes the pair-listing delta a first-class
    queryable metric, so a 100 TB operator sees capping without reading
    logs. Pure aggregation over the same banding (groupBy bh → filter →
    one-row agg) — no observation machinery, computed only when asked."""
    cap_pairs = bucket_cap * (bucket_cap - 1) // 2
    sizes = _band_keys(docs).groupBy("bh").agg(
        F.count(F.lit(1)).alias("k"))
    over = sizes.filter(F.col("k") > bucket_cap)
    # per-bucket omitted pairs: C(k,2) − C(cap,2) − (k − cap); integer
    # arithmetic throughout (k*(k-1) div 2 — no doubles at 10^8-member
    # buckets)
    stats = over.agg(
        F.count(F.lit(1)).alias("capped_buckets"),
        F.coalesce(F.sum(F.col("k") - bucket_cap), F.lit(0))
         .alias("star_edges"),
        F.coalesce(F.sum(F.expr("k * (k - 1) div 2")
                         - F.lit(cap_pairs)
                         - (F.col("k") - bucket_cap)), F.lit(0))
         .alias("dropped_pairs"))
    return stats.select(
        F.lit(bucket_cap).cast("long").alias("bucket_cap"),
        F.col("capped_buckets").cast("long").alias("capped_buckets"),
        F.col("star_edges").cast("long").alias("star_edges"),
        F.col("dropped_pairs").cast("long").alias("dropped_pairs"))


def q_lsh_cap_stats(spark, sf_dir):
    """Bucket-cap telemetry at the dedup pipeline's production setting
    (bucket_cap=64) over the documents table."""
    return _lsh_cap_stats(_docs_wide(spark, sf_dir), bucket_cap=64)


def _sql_lsh_cap_stats(bucket_cap: int = 64) -> str:
    cap_pairs = bucket_cap * (bucket_cap - 1) // 2
    return ("WITH " + _sql_minhash_pair_ctes() + f""",
sizes AS (
  SELECT bh, count(*) AS k FROM bands GROUP BY bh
), over_cap AS (
  SELECT * FROM sizes WHERE k > {bucket_cap}
)
SELECT {bucket_cap}::BIGINT AS bucket_cap,
       count(*)::BIGINT AS capped_buckets,
       coalesce(sum(k - {bucket_cap}), 0)::BIGINT AS star_edges,
       coalesce(sum(k*(k-1)//2 - {cap_pairs} - (k - {bucket_cap})),
                0)::BIGINT AS dropped_pairs
FROM over_cap
""")


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash LSH near-dup candidate pairs over the documents table — see
    _lsh_band_pairs for the banding shape."""
    return _lsh_band_pairs(_docs_wide(spark, sf_dir))


def q_dedup_groups(spark, sf_dir):
    """Near-dup GROUPING — the pipeline step after pair generation: connected
    components of the MinHash-LSH pair graph, labeled by the component's
    minimum doc_id.  Delegates to operators/components.py: exact driver
    union-find for graphs at or under the loud 1M-pair gate (this scale),
    min-label propagation with pointer-jumping compression above it
    (O(log diameter) rounds, one shuffle join + partial-agg groupBy +
    cached-table jump join per round, exact changed-count convergence
    proof, RAISES rather than returning unconverged labels — closes the
    round-4 silent-cap finding); labels are bit-identical on both paths.
    Pairs are generated with bucket_cap=64 (see _lsh_band_pairs: star
    expansion keeps components provably identical to the uncapped graph,
    so the closure oracle stays exact while near-dup clone sets can't
    explode the candidate join)."""
    from ..operators.components import connected_components

    pairs = _lsh_band_pairs(_docs_wide(spark, sf_dir), bucket_cap=64)
    labels = connected_components(pairs, "a", "b")
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("label").alias("group_id"))


def _sql_minhash_pair_ctes(table: str = "documents") -> str:
    """Shared CTE chain (no WITH prefix) ending in ``pairs`` (the LSH
    candidate pairs over ``table``) — used by the pairs oracle, the
    dedup_groups oracle, and the dedup_pipeline oracle."""
    a, b = text_k._minhash_coeffs(64, 42)
    p = text_k._MINHASH_P
    # coalesce(…, p) handles zero-shingle docs (Spark sig = [p]*64)
    terms = ", ".join(
        f"coalesce(list_min(list_transform(xs, x -> ({int(ai)}*x + {int(bi)}) % {p})), {p})"
        for ai, bi in zip(a, b))
    return f"""{_sql_minhash_xs(table)},
sig AS (
  SELECT d.doc_id, [{terms}] AS sig
  FROM {table} d LEFT JOIN xs ON d.doc_id = xs.doc_id
), bands AS (
  SELECT doc_id,
         md5(b.band::VARCHAR || ':' ||
             array_to_string(sig[b.band*8 + 1 : b.band*8 + 8], ',')) AS bh
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) b
), pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.bh = y.bh AND x.doc_id < y.doc_id
)"""


def _sql_minhash_lsh_pairs() -> str:
    return "WITH " + _sql_minhash_pair_ctes() + "\nSELECT a, b FROM pairs\n"


# recursive transitive closure over symmetrized `pairs` → `cc(id, group_id)`
# (the same component-minimum label the Spark propagation converges to);
# closure is fine at oracle scale, the engine side iterates
_SQL_CC_CTES = """
edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
), reach AS (
  SELECT a AS id, b AS r FROM edges
  UNION
  SELECT reach.id, e.b AS r FROM reach JOIN edges e ON reach.r = e.a
), cc AS (
  SELECT id, least(id, min(r)) AS group_id
  FROM reach GROUP BY id
)"""


def _sql_dedup_groups() -> str:
    return ("WITH RECURSIVE " + _sql_minhash_pair_ctes() + "," + _SQL_CC_CTES
            + "\nSELECT id AS doc_id, group_id FROM cc\n")


def q_dedup_pipeline(spark, sf_dir):
    """The COMPOSED dedup pipeline in its documented production order:
    exact dedup BEFORE sketching (round-4 review: the k² band-bucket
    guard).  k byte-identical documents share every LSH band bucket, so
    banding the raw corpus costs k(k-1)/2 candidate pairs per clone set —
    quadratic on a dup-heavy web corpus.  Collapsing exact duplicates to
    one representative first makes bucket sizes reflect NEAR-dup structure
    only; the representative count, not the raw doc count, drives the
    self-join.

    Stages: fingerprint64 (exact content hash, Arrow kernel) →
    min-doc_id representative per fingerprint (hash groupBy + equi-join) →
    MinHash-LSH banding over representatives only (_lsh_band_pairs) →
    connected components (operators/components.py) → expand group ids back
    through the exact-dup map (one join).  Output: (doc_id, group_id) for
    EVERY document; group_id = min doc_id over the doc's exact+near dup
    closure.

    Cache hygiene (round-5 review ask): the intermediates (``repmap``
    persist, the CC label checkpoint) are released before returning — the
    result is eager-localCheckpoint'ed first so the release can't trigger
    a recompute.  The output is the pipeline's SMALLEST table (two ids per
    document), so the one extra materialization is cheap at any scale; its
    blocks are freed when the caller drops the returned DataFrame."""
    out, _ = dedup_pipeline_run(_docs_wide(spark, sf_dir))
    return out


def dedup_pipeline_run(d: DataFrame,
                       bucket_cap: int = 64) -> tuple[DataFrame, dict]:
    """The composed dedup pipeline as a library call over ``d(doc_id,
    text)``: fingerprint → exact-collapse → capped LSH banding over
    representatives → connected components → expand.  Returns
    ``(labels, metrics)``: labels is the (doc_id, group_id) frame
    q_dedup_pipeline exposes; metrics is the star-expansion cap telemetry
    (bucket_cap / capped_buckets / star_edges / dropped_pairs) OBSERVED on
    the action the pipeline already executes (the edge materialization
    inside connected_components — the A1 counters-riding-writes pattern,
    round-7 VERDICT ask #5), so a production run records capping without
    a second scan; ``cap_metrics_df`` turns it into a one-row frame a
    caller appends to whatever metrics table it keeps.  The standalone
    q_lsh_cap_stats query stays the on-demand form of the same numbers."""
    from pyspark.sql import Observation

    from ..operators.components import connected_components, \
        free_checkpoint_blocks

    obs = Observation()
    fp = d.select("doc_id", udfs.udf_fingerprint64("text").alias("fp64"))
    # one fingerprint scan + one shuffle: min-doc_id representative per
    # fingerprint as a whole-partition window agg (the groupBy+re-join
    # form scanned the Arrow UDF twice — round-5 review ask)
    repmap = (fp.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("fp64")).alias("rep_id"))
        .persist())
    repdocs = d.join(
        repmap.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id"),
        "doc_id")
    labels = connected_components(
        _lsh_band_pairs(repdocs, bucket_cap=bucket_cap, observer=obs),
        "a", "b")
    out = (repmap.join(labels, repmap["rep_id"] == labels["id"], "left")
           .select("doc_id",
                   F.coalesce("label", "rep_id").alias("group_id"))
           .localCheckpoint(eager=True))
    repmap.unpersist()
    free_checkpoint_blocks(labels)
    # connected_components ran the action (edges.count) — obs.get returns
    # immediately; empty overflow branch → nulls → zeros.  When the WHOLE
    # pair graph is empty (a corpus chunk with no near-dups at all), AQE's
    # empty-relation propagation can replace the overflow subtree with an
    # EmptyRelation and prune the CollectMetrics node outright — then the
    # JVM-side get returns no row and toPyRow raises.  That pruning can
    # only happen when zero rows flowed through the cap branch, so the
    # truthful telemetry is all-zeros.
    try:
        got = obs.get
    except Exception:  # Py4JJavaError — metrics node pruned (empty graph)
        got = {"capped_buckets": 0, "star_edges": 0, "dropped_pairs": 0}
    metrics = {"bucket_cap": bucket_cap,
               "capped_buckets": int(got["capped_buckets"] or 0),
               "star_edges": int(got["star_edges"] or 0),
               "dropped_pairs": int(got["dropped_pairs"] or 0)}
    return out, metrics


def cap_metrics_df(spark: SparkSession, metrics: dict) -> DataFrame:
    """One-row frame of dedup_pipeline_run's cap telemetry, schema-matched
    to q_lsh_cap_stats so it appends to the same metrics table."""
    return spark.createDataFrame(
        [(int(metrics["bucket_cap"]), int(metrics["capped_buckets"]),
          int(metrics["star_edges"]), int(metrics["dropped_pairs"]))],
        "bucket_cap long, capped_buckets long, star_edges long, "
        "dropped_pairs long")


def _sql_dedup_pipeline() -> str:
    """DuckDB twin of the full composed pipeline: same fingerprint fold,
    same representative rule, the SAME minhash/banding CTEs re-rooted on
    the representative docs, recursive-CTE closure, then expansion."""
    return (f"""WITH RECURSIVE fp AS (
  SELECT doc_id, {_sql_fp61('text')} AS fp64 FROM documents
), reps AS (
  SELECT fp64, min(doc_id) AS rep_id FROM fp GROUP BY fp64
), repmap AS (
  SELECT f.doc_id, r.rep_id FROM fp f JOIN reps r USING (fp64)
), repdocs AS (
  SELECT d.doc_id, d.text FROM documents d JOIN reps r ON d.doc_id = r.rep_id
), """ + _sql_minhash_pair_ctes("repdocs") + "," + _SQL_CC_CTES + """
SELECT m.doc_id, coalesce(cc.group_id, m.rep_id) AS group_id
FROM repmap m LEFT JOIN cc ON m.rep_id = cc.id
""")


# -- scene segmentation → per-scene keyframe dedup (video pipeline comp) ----


def q_scene_dedup(spark, sf_dir):
    """Scene segmentation + per-scene keyframe dedup — the composition a
    video training pipeline runs AFTER cut detection: scene-cut labels
    (the q_video_scene_cuts lag-Hamming delta) → scene spans (scene_id =
    running cut count per video) → one keyframe per scene (the first
    frame: frame 0 or a cut row — NO second shuffle; the keyframe set is
    exactly the rows where the lag distance is null or ≥ threshold, so
    segmentation and keyframe extraction ride the SAME single
    partition-by-video window pass) → keyframe phash into the shared MIH
    band join + connected-components, grouping duplicate scenes within
    and across videos.  The ND fixture makes this real: videos of one
    group-triple cut their scenes from the same image groups, so
    cross-video scene duplicates exist by design.

    Scale shape: one decode scan (stride-1 frame hashes, no shuffle), ONE
    hash partition by video_id for the window, then the keyframe set —
    ~cuts+1 rows per video, orders of magnitude smaller than frames —
    enters the (band, value)-partitioned MIH join; CC over scene nodes
    (video_num·64 + scene_id int64 ids).  Output: one row per scene."""
    from ..operators.components import connected_components, \
        free_checkpoint_blocks

    frames = _sampled_frame_hashes(
        spark.read.parquet(_ensure_video_nd_fixture()), stride=1)
    w = Window.partitionBy("video_id").orderBy("frame_idx")
    prev = F.lag("phash").over(w)
    dist = F.bit_count(prev.bitwiseXOR(F.col("phash"))).cast("long")
    cut = F.when(dist >= _SCENE_CUT_T, F.lit(1)).otherwise(F.lit(0))
    lab = frames.select(
        "video_id", "frame_idx", "phash", dist.alias("dist"),
        F.sum(cut).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("scene_id"))
    keyframes = (lab.filter(F.col("dist").isNull()
                            | (F.col("dist") >= _SCENE_CUT_T))
                 .select("video_id", "scene_id",
                         F.col("frame_idx").alias("keyframe_idx"), "phash",
                         (F.substring("video_id", 6, 16).cast("long") * 64
                          + F.col("scene_id")).alias("nid")))
    keyframes = keyframes.persist()  # scanned by band join + label join
    pairs = _img_band_pairs(
        keyframes.select(F.col("nid").alias("image_id"), "phash"))
    labels = connected_components(
        pairs.select(F.col("left_id").alias("a"),
                     F.col("right_id").alias("b")))
    out = (keyframes.join(labels, keyframes["nid"] == labels["id"], "left")
           .select("video_id", "scene_id", "keyframe_idx",
                   F.coalesce("label", "nid").alias("group_id"))
           .localCheckpoint(eager=True))
    free_checkpoint_blocks(labels)
    keyframes.unpersist()
    return out


def _sql_scene_dedup() -> str:
    """Brute-force twin: regenerate every frame phash from the image
    fixture via the stride-1 layout formula (the q_video_scene_cuts
    oracle's CTE), the same lag → cut → running-sum segmentation, keyframe
    = first frame per scene, all-pairs Hamming ≤ radius over keyframes,
    recursive-CTE closure over scene node ids."""
    return f"""WITH RECURSIVE imgs AS (
  SELECT CAST(substring(image_id, 3) AS INT) AS idx, phash
  FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
), frames AS (
  SELECT 'vidnd' || lpad(v.v::VARCHAR, 3, '0') AS video_id,
         j.j AS frame_idx, i.phash
  FROM (SELECT unnest(generate_series(0, {_VIDEO_ND_VIDEOS - 1})) AS v) v
  CROSS JOIN (SELECT unnest(generate_series(0, {_VIDEO_ND_FRAMES - 1}))
              AS j) j
  JOIN imgs i
    ON i.idx = 4 * (4 * (v.v // 3) + j.j // {_VIDEO_STRIDE})
               + CASE WHEN j.j % {_VIDEO_STRIDE} = 0
                      THEN CASE v.v % 3 WHEN 0 THEN 0 WHEN 1 THEN 2
                           ELSE 3 END
                      ELSE j.j % 4 END
), lagged AS (
  SELECT video_id, frame_idx, phash,
         bit_count(xor(lag(phash) OVER w, phash)) AS dist
  FROM frames WINDOW w AS (PARTITION BY video_id ORDER BY frame_idx)
), seg AS (
  SELECT video_id, frame_idx, phash, dist,
         sum(CASE WHEN dist >= {_SCENE_CUT_T} THEN 1 ELSE 0 END)
             OVER (PARTITION BY video_id ORDER BY frame_idx
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS scene_id
  FROM lagged
), keyframes AS (
  SELECT video_id, scene_id, frame_idx AS keyframe_idx, phash,
         (CAST(substring(video_id, 6) AS BIGINT) * 64 + scene_id)::BIGINT
             AS nid
  FROM seg WHERE dist IS NULL OR dist >= {_SCENE_CUT_T}
), pairs AS (
  SELECT x.nid AS a, y.nid AS b
  FROM keyframes x JOIN keyframes y ON x.nid < y.nid
  WHERE bit_count(xor(x.phash, y.phash)) <= {_IMG_RADIUS}
), """ + _SQL_CC_CTES + """
SELECT k.video_id, k.scene_id, k.keyframe_idx,
       coalesce(cc.group_id, k.nid) AS group_id
FROM keyframes k LEFT JOIN cc ON k.nid = cc.id
"""


# -- cross-modal dedup (one MIH operator, four modalities, one CC pass) ------


# node-id tag bits: cross-modal CC needs one int64 id space; 2^40 clears
# every per-modality numeric range by orders of magnitude (doc_id < 10^7
# at any tested sf; fixture suffixes < 10^3)
_XM_TAG = 1 << 40


def q_xmodal_dup_groups(spark, sf_dir):
    """CROSS-MODAL near-dup grouping — the end-to-end proof of the "one
    operator, N modalities" claim: text simhash (documents), image phash
    (stored corpus column), sampled-video-frame phash (decoded from rawv
    bytes), and audio fingerprint (decoded from PCM bytes) are unioned
    into ONE (modality, item_id, node_id, code) table, candidate edges
    come from ONE _img_band_pairs invocation over the union, and groups
    from ONE connected_components pass.  The video fixture's frames are
    packed from image-fixture members, so genuine cross-modal edges exist
    (video frames ↔ the stills they were cut from) — exactly the
    image-vs-video-frame dedup a multimodal training pipeline runs to stop
    a still leaking into train while its video lands in eval.

    Scale shape: each modality leg is a no-shuffle scan (text/audio/video
    kernels are single-pass Arrow; image codes are a stored column); the
    union is unioned LOGICALLY (no materialization) and feeds the same
    (band, value)-partitioned MIH join as every per-modality query —
    nothing all-pairs, hot buckets take the capped star expansion; CC is
    the same pointer-jumping operator.  Node ids pack modality tag bits
    over the per-modality numeric id (2^40 apart — no collisions at any
    corpus size the id widths admit).

    Oracle: brute-force all-pairs Hamming ≤ 3 over the SAME four code
    sets recomputed independently (simhash CTE, stored phash/fp columns,
    the video layout formula) + recursive-CTE closure."""
    from ..operators.components import connected_components, \
        free_checkpoint_blocks

    text = _docs_wide(spark, sf_dir).select(
        F.lit("text").alias("modality"),
        F.col("doc_id").cast("string").alias("item_id"),
        F.col("doc_id").cast("long").alias("nid"),
        udfs.udf_simhash64("text").alias("code"))
    imgs = _img_corpus(spark).select(
        F.lit("image").alias("modality"),
        F.col("image_id").alias("item_id"),
        (F.lit(_XM_TAG)
         + F.substring("image_id", 3, 16).cast("long")).alias("nid"),
        F.col("phash").alias("code"))
    frames = _sampled_frame_hashes(
        spark.read.parquet(_ensure_video_nd_fixture()))
    video = frames.select(
        F.lit("video").alias("modality"),
        F.concat_ws(":", "video_id", "frame_idx").alias("item_id"),
        (F.lit(2 * _XM_TAG)
         + F.substring("video_id", 6, 16).cast("long") * 1024
         + F.col("frame_idx")).alias("nid"),
        F.col("phash").alias("code"))
    audio = _audio_fingerprints(
        spark.read.parquet(_ensure_audio_nd_fixture())).select(
        F.lit("audio").alias("modality"),
        F.col("image_id").alias("item_id"),
        (F.lit(3 * _XM_TAG)
         + F.substring("image_id", 4, 16).cast("long")).alias("nid"),
        F.col("phash").alias("code"))
    # persist: the union is scanned twice (band join + final label join);
    # without it every decode kernel would run twice
    nodes = (text.unionByName(imgs).unionByName(video).unionByName(audio)
             .persist())
    pairs = _img_band_pairs(nodes.select(F.col("nid").alias("image_id"),
                                         F.col("code").alias("phash")))
    labels = connected_components(
        pairs.select(F.col("left_id").alias("a"),
                     F.col("right_id").alias("b")))
    out = (nodes.join(labels, nodes["nid"] == labels["id"], "left")
           .select("modality", "item_id",
                   F.coalesce("label", "nid").alias("group_id"))
           .localCheckpoint(eager=True))
    free_checkpoint_blocks(labels)
    nodes.unpersist()
    return out


def _sql_xmodal_dup_groups() -> str:
    """Brute-force twin: the four code sets recomputed/reread independently
    (text via the simhash CTE, image/audio via stored columns, video via
    the sampled-frame layout formula), all-pairs Hamming ≤ radius over the
    UNION (cross-modal pairs included), recursive-CTE closure."""
    return f"""WITH RECURSIVE sh AS ({_sql_simhash()}
), nodes AS (
  SELECT 'text' AS modality, doc_id::VARCHAR AS item_id,
         doc_id::BIGINT AS nid, simhash AS code
  FROM sh
  UNION ALL
  SELECT 'image', image_id,
         {_XM_TAG} + CAST(substring(image_id, 3) AS BIGINT), phash
  FROM read_parquet('{_IMG_CORPUS_FIXTURE}')
  UNION ALL
  SELECT 'video', video_id || ':' || frame_idx,
         {2 * _XM_TAG} + CAST(substring(video_id, 6) AS BIGINT) * 1024
             + frame_idx,
         phash
  FROM (
    SELECT 'vidnd' || lpad(v.v::VARCHAR, 3, '0') AS video_id,
           j.j AS frame_idx, i.phash
    FROM (SELECT unnest(generate_series(0, {_VIDEO_ND_VIDEOS - 1})) AS v) v
    CROSS JOIN (SELECT unnest(generate_series(0, {_VIDEO_ND_FRAMES - 1},
                                              {_VIDEO_STRIDE})) AS j) j
    JOIN (SELECT CAST(substring(image_id, 3) AS INT) AS idx, phash
          FROM read_parquet('{_IMG_CORPUS_FIXTURE}')) i
      ON i.idx = 4 * (4 * (v.v // 3) + j.j // {_VIDEO_STRIDE})
                 + CASE v.v % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 3 END
  )
  UNION ALL
  SELECT 'audio', audio_id,
         {3 * _XM_TAG} + CAST(substring(audio_id, 4) AS BIGINT), fp
  FROM read_parquet('{_AUDIO_ND_FIXTURE}')
), pairs AS (
  SELECT x.nid AS a, y.nid AS b
  FROM nodes x JOIN nodes y ON x.nid < y.nid
  WHERE bit_count(xor(x.code, y.code)) <= {_IMG_RADIUS}
), """ + _SQL_CC_CTES + """
SELECT n.modality, n.item_id, coalesce(cc.group_id, n.nid) AS group_id
FROM nodes n LEFT JOIN cc ON n.nid = cc.id
"""


# ORDER IS DELIBERATE (round-9 VERDICT ask #3): the driver's correctness
# file records the FIRST 50 entries only, so never-yet-driver-verified and
# newest queries sit at the TOP, and long-stable rows (green in driver
# records across many rounds: tpch_q1/q3, f1/f2, x3/x6, a1/a3, props_json,
# x2) absorb the window cut at the tail. When adding a query, add it at
# the top of this dict.
QUERIES = {
    # --- newest / previously off-window first ---
    "xmodal_dup_groups": q_xmodal_dup_groups,
    "scene_dedup": q_scene_dedup,
    "ann_recall_sample": q_ann_recall_sample,
    "img_quality_filter": q_img_quality_filter,
    "token_count_bpe": q_token_count_bpe,
    "decontaminate": q_decontaminate,
    "quality_filter": q_quality_filter,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "lsh_cap_stats": q_lsh_cap_stats,
    "dedup_groups": q_dedup_groups,
    "dedup_pipeline": q_dedup_pipeline,
    "simhash_near_dup": q_simhash_near_dup,
    "video_scene_cuts": q_video_scene_cuts,
    "img_stats": q_img_stats,
    "ann_recall": q_ann_recall,
    "audio_near_dup": q_audio_near_dup,
    "video_near_dup": q_video_near_dup,
    # --- core operator surface ---
    "x1_extract": q_x1_extract,
    "x4_expand": q_x4_expand,
    "x5_root": q_x5_root,
    "w1_first_success": q_w1_first_success,
    "d1_anti_join": q_d1_anti_join,
    "j3_semi_join": q_j3_semi_join,
    "w2_budget": q_w2_budget,
    "u1_union_dedup": q_u1_union_dedup,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "ngram_jaccard": q_ngram_jaccard,
    "cosine_topk": q_cosine_topk,
    "ann_lsh_bucket": q_ann_lsh_bucket,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_arrow": q_ann_ivf_arrow,
    "a2_rates": q_a2_rates,
    "a2_windowed": q_a2_windowed,
    "sessionize": q_sessionize,
    "emb_near_dup_pairs": q_emb_near_dup_pairs,
    "img_pipeline": q_img_pipeline,
    "payload_validate": q_payload_validate,
    "img_near_dup_pairs": q_img_near_dup_pairs,
    "img_dup_groups": q_img_dup_groups,
    "img_caption_conflicts": q_img_caption_conflicts,
    "video_frame_sample": q_video_frame_sample,
    "img_resize": q_img_resize,
    "audio_features": q_audio_features,
    "sample_split": q_sample_split,
    "repetition_score": q_repetition_score,
    "fingerprint64": q_fingerprint64,
    "minhash_signature": q_minhash_signature,
    "simhash64": q_simhash64,
    # --- long-stable tail (absorbs the driver's 50-row window cut) ---
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "f1_validate": q_f1_validate,
    "f2_scope": q_f2_scope,
    "x6_depth": q_x6_depth,
    "x3_title": q_x3_title,
    "a1_metrics": q_a1_metrics,
    "a3_recent": q_a3_recent,
    "props_json": q_props_json,
    "x2_extract_html": q_x2_extract_html,
}


def oracles() -> dict[str, str]:
    _ensure_payload_fixture()
    _ensure_img_corpus_fixture()
    # the video/audio ND oracles read the fixture parquet by absolute path
    # — ensure they exist whichever side the driver runs first
    _ensure_video_nd_fixture()
    _ensure_audio_nd_fixture()
    return {
        "xmodal_dup_groups": _sql_xmodal_dup_groups(),
        "scene_dedup": _sql_scene_dedup(),
        "ann_recall_sample": _sql_ann_recall_sample(),
        "img_quality_filter": _sql_img_quality_filter(),
        "token_count_bpe": _sql_token_count_bpe(),
        "decontaminate": _sql_decontaminate(),
        "f1_validate": SQL_F1,
        "f2_scope": SQL_F2,
        "x6_depth": SQL_X6,
        "x3_title": SQL_X3,
        "x1_extract": SQL_X1,
        "x4_expand": _sql_x4(),
        "x5_root": SQL_X5,
        "w1_first_success": SQL_W1,
        "d1_anti_join": SQL_D1,
        "j3_semi_join": SQL_J3,
        "w2_budget": SQL_W2,
        "a1_metrics": SQL_A1,
        "u1_union_dedup": SQL_U1,
        "tpch_q1": SQL_TPCH_Q1,
        "tpch_q3": SQL_TPCH_Q3,
        "dedup_exact": SQL_DEDUP_EXACT,
        "token_count": SQL_TOKEN_COUNT,
        "quality_score": _sql_quality(),
        "lang_id": _sql_lang_id(),
        "ngram_jaccard": SQL_NGRAM_JACCARD,
        "cosine_topk": SQL_COSINE_TOPK,
        "ann_lsh_bucket": _sql_ann_lsh(),
        "ann_ivf": _sql_ann_ivf(),
        # the Arrow kernel is bit-equal to the literal path by contract, so
        # it must reproduce the SAME oracle rows — sharing the SQL is the
        # point, not a shortcut
        "ann_ivf_arrow": _sql_ann_ivf(),
        "a3_recent": SQL_A3,
        "a2_rates": SQL_A2,
        "a2_windowed": SQL_A2_WINDOWED,
        "props_json": SQL_PROPS_JSON,
        "sessionize": SQL_SESSIONIZE,
        "emb_near_dup_pairs": _sql_emb_near_dup(),
        "fingerprint64": SQL_FINGERPRINT,
        "minhash_signature": _sql_minhash(),
        "simhash64": _sql_simhash(),
        "simhash_near_dup": _sql_simhash_near_dup(),
        "video_scene_cuts": _sql_video_scene_cuts(),
        "img_stats": _sql_img_stats(),
        "quality_filter": _sql_quality_filter(),
        "minhash_lsh_pairs": _sql_minhash_lsh_pairs(),
        "lsh_cap_stats": _sql_lsh_cap_stats(),
        "dedup_groups": _sql_dedup_groups(),
        "dedup_pipeline": _sql_dedup_pipeline(),
        # x2: closed-form oracle for the synthetic input family (general
        # urlparse semantics pinned by unit tests — see q_x2_extract_html)
        "x2_extract_html": SQL_X2,
        "img_pipeline": SQL_IMG_PIPELINE,
        # the oracle reads the deterministic fixture parquet by absolute
        # path (the sf views carry no binary columns) — ensure it exists
        # whichever side the driver runs first
        "payload_validate": _sql_payload_validate(),
        # image near-dup family: oracle reads the same input_hint-shaped
        # fixture parquet and brute-forces all pairs, proving the MIH band
        # decomposition exhaustive (incl. its designed rejected candidates)
        "img_near_dup_pairs": _sql_img_near_dup(),
        "img_dup_groups": _sql_img_dup_groups(),
        "img_caption_conflicts": _sql_img_caption_conflicts(),
        # video: Spark decodes real rawv containers; the oracle derives the
        # expected sampled-frame phashes from the image fixture the frames
        # were packed from — the sides meet only at the values
        "video_frame_sample": _sql_video_frame_sample(),
        "video_near_dup": _sql_video_near_dup(),
        # resize: both resizes provably preserve the fixture's phash, so
        # the oracle is the stored column (kernels drive the Spark side)
        "img_resize": _sql_img_resize(),
        # audio: the oracle regenerates the closed-form sawtooth samples
        # and must match the byte-decoding kernel's exact integer features
        "audio_features": _sql_audio_features(),
        "audio_near_dup": _sql_audio_near_dup(),
        "ann_recall": _sql_ann_recall(),
        "sample_split": _sql_sample_split(),
        "repetition_score": _sql_repetition(),
    }
