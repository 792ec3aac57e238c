"""Supplementary oracle-twinned queries — redundant alternates & demos.

Every operator exercised here is ALREADY certified by a stronger row in
`navi_spark.queries` (the 50-entry registry the grading driver checks
end-to-end against DuckDB): c21_recrawl_order/changes are projections of
the composed `c21_recrawl_e2e`; the BM25F field/overwrite-parity variants
are quirk twins of `r3_bm25` (Ranker.java:218-283); `q4_suggestions`
(fetch) is the read half of `q4_suggestions_insert`; `ev_hourly_rollup`
is the batch twin of `stream_hourly_rollup`; `tpch_q1` is a relational-
coverage demo; `r13_doc_count`/`r14_ordered_multiget` (driver-certified
rounds 2-4, rotated out in round 5 to certify `i5_field_pivot` and
`tpch_q3_shipping_priority`) are one-join/one-agg projections of the
documents table; `curate_corpus` composes the driver-certified text/dedup
operators (langid → quality → fingerprint keep-first → token count) into
one end-to-end curation pipeline with a single-exchange plan (pinned by
tests/test_plans.py). They are kept out of the exported `queries()` registry
so that the driver certifies 100% of the exported surface — nothing rides
uncertified — and validated by the SAME oracle protocol via
`scripts/check_oracle.py --extra` and tests/test_extra_queries.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from navi_spark.queries import _EN_TRIGRAMS, _TOKENS_SQL, _tokens, load

_REGISTRY: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], Optional[str]]
] = {}


def _q(name: str, sql: Optional[str]):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql}


@_q(
    "c21_recrawl_order",
    """
    SELECT doc_id, n_chars FROM documents
    ORDER BY n_chars DESC, doc_id LIMIT 50
    """,
)
def c21_recrawl_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C21: recrawl scheduling — rank-descending scan (DBManager.java:948)."""
    d = load(spark, sf_dir, "documents")
    return d.orderBy(F.desc("n_chars"), "doc_id").limit(50).select("doc_id", "n_chars")


_T_MARKS = ["ta", "tb", "tc", "td", "te", "tf", "tg"]
_U_MARKS = ["ua", "ub", "uc", "ud", "ue"]
_BM25F_TERMS = ("tb", "uc", "ud")

_T_SQL = "[" + ", ".join(f"'{m}'" for m in _T_MARKS) + "]"
_U_SQL = "[" + ", ".join(f"'{m}'" for m in _U_MARKS) + "]"
_AUG_TEXT_SQL = (
    f"text || ' ' || ({_T_SQL})[(doc_id % 7) + 1]"
    f" || ' ' || ({_U_SQL})[(doc_id % 5) + 1]"
)
_BM25F_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25F_TERMS)

_FTOKS_SQL = f"""
    SELECT doc_id, word,
           CASE WHEN pos < 2 THEN 'h1' WHEN pos < 4 THEN 'h2'
                WHEN pos < 6 THEN 'a' ELSE 'other' END AS field
    FROM (SELECT doc_id, w AS word, pos
          FROM (SELECT doc_id,
                       unnest(string_split_regex(
                           regexp_replace(lower({_AUG_TEXT_SQL}),
                                          '[^a-z\\s]', '', 'g'),
                           '\\s+')) AS w,
                       unnest(range(len(string_split_regex(
                           regexp_replace(lower({_AUG_TEXT_SQL}),
                                          '[^a-z\\s]', '', 'g'),
                           '\\s+')))) AS pos
                FROM documents) u
          WHERE w <> '') t
"""

_BM25F_CORE_SQL = f"""
    ftoks AS ({_FTOKS_SQL}),
    n AS (SELECT count(*) AS n FROM documents),
    lens AS (SELECT doc_id,
                    count(*) FILTER (field = 'h1') AS len_h1,
                    count(*) FILTER (field = 'h2') AS len_h2,
                    count(*) FILTER (field = 'a')  AS len_a,
                    count(*) FILTER (field = 'other') AS len_other
             FROM ftoks GROUP BY doc_id),
    avgs AS (SELECT GREATEST(avg(len_h1), 1e-9) AS a_h1,
                    GREATEST(avg(len_h2), 1e-9) AS a_h2,
                    GREATEST(avg(len_a), 1e-9)  AS a_a,
                    GREATEST(avg(len_other), 1e-9) AS a_other FROM lens),
    tf AS (SELECT doc_id, word,
                  count(*) FILTER (field = 'h1') AS tf_h1,
                  count(*) FILTER (field = 'h2') AS tf_h2,
                  count(*) FILTER (field = 'a')  AS tf_a,
                  count(*) FILTER (field = 'other') AS tf_other
           FROM ftoks WHERE word IN ({_BM25F_TERMS_SQL})
           GROUP BY doc_id, word),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM ftoks
           WHERE word IN ({_BM25F_TERMS_SQL}) GROUP BY word),
    idf AS (SELECT word,
                   log10(((SELECT n FROM n) - df + 0.5) / (df + 0.5)) AS idf
            FROM df
            WHERE log10(((SELECT n FROM n) - df + 0.5) / (df + 0.5)) > 0),
    term_scores AS (
        SELECT tf.doc_id, tf.word,
               idf.idf * (
                 2.5 * tf_h1 * 2.5 / (tf_h1 + 1.5 * (0.25 + 0.75 * len_h1 / a_h1))
               + 2.0 * tf_h2 * 2.5 / (tf_h2 + 1.5 * (0.25 + 0.75 * len_h2 / a_h2))
               + 1.5 * tf_a  * 2.5 / (tf_a  + 1.5 * (0.25 + 0.75 * len_a  / a_a))
               + 1.0 * tf_other * 2.5
                     / (tf_other + 1.5 * (0.25 + 0.75 * len_other / a_other))
               ) AS term_score
        FROM tf JOIN idf USING (word) JOIN lens USING (doc_id), avgs)
"""


def _bm25f_spark(spark: SparkSession, sf_dir: str, last_term_overwrite: bool):
    """Shared builder: position-derived fields → pivot postings/lengths →
    the REAL ranker.bm25f (weights 2.5/2.0/1.5/1.0)."""
    from navi_spark.operators.ranker import bm25f

    d = load(spark, sf_dir, "documents")
    n = d.count()
    aug = F.concat(
        F.col("text"), F.lit(" "),
        F.element_at(F.array(*[F.lit(m) for m in _T_MARKS]),
                     (F.col("doc_id") % 7 + 1).cast("int")),
        F.lit(" "),
        F.element_at(F.array(*[F.lit(m) for m in _U_MARKS]),
                     (F.col("doc_id") % 5 + 1).cast("int")),
    )
    words = d.select(
        "doc_id",
        F.posexplode(
            F.split(F.regexp_replace(F.lower(aug), "[^a-z\\s]", ""), "\\s+")
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    field = F.when(F.col("pos") < 2, "h1").when(F.col("pos") < 4, "h2")
    field = field.when(F.col("pos") < 6, "a").otherwise("other")
    ft = words.withColumn("field", field)
    fields = ["h1", "h2", "a", "other"]
    postings = (
        ft.groupBy("doc_id", "word")
        .pivot("field", fields)
        .agg(F.count(F.lit(1)))
        .fillna(0)
        .select("doc_id", "word",
                *[F.col(f_).alias(f"tf_{f_}") for f_ in fields])
    )
    lengths = (
        ft.groupBy("doc_id")
        .pivot("field", fields)
        .agg(F.count(F.lit(1)))
        .fillna(0)
        .select("doc_id", *[F.col(f_).alias(f"len_{f_}") for f_ in fields])
    )
    rel = bm25f(postings, lengths, _BM25F_TERMS, n,
                last_term_overwrite=last_term_overwrite)
    return rel.select("doc_id", F.round("relevance", 6).alias("score"))


@_q(
    "r3_bm25f_fields",
    f"""
    WITH {_BM25F_CORE_SQL}
    SELECT doc_id, ROUND(SUM(term_score), 6) AS score
    FROM term_scores GROUP BY doc_id
    """,
)
def r3_bm25f_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 multi-field BM25F with the reference's field weights 2.5/2.0/
    1.5/1.0 (Ranker.java:133,136), summed over terms (the documented-fix
    default). Exercises ranker.bm25f's weighted path; the oracle recomputes
    every per-field term from the same position-derived fields."""
    return _bm25f_spark(spark, sf_dir, last_term_overwrite=False)


@_q(
    "r3_bm25f_overwrite_parity",
    f"""
    WITH {_BM25F_CORE_SQL}
    SELECT doc_id,
           ROUND(arg_max(term_score,
                         CASE word WHEN 'tb' THEN 1 WHEN 'uc' THEN 2
                              WHEN 'ud' THEN 3 END), 6) AS score
    FROM term_scores GROUP BY doc_id
    """,
)
def r3_bm25f_overwrite_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 in reference-bug parity mode: Ranker.java:268 OVERWRITES the
    per-doc score on each query term, so only the LAST term present counts.
    The oracle's arg_max over the term order states that semantics
    independently — a green row proves the parity flag reproduces the bug
    exactly, and (vs r3_bm25f_fields) that the flag actually changes
    results."""
    return _bm25f_spark(spark, sf_dir, last_term_overwrite=True)


@_q(
    "ev_hourly_rollup",
    """
    SELECT strftime(ts, '%Y-%m-%d %H') AS hour_bucket,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def ev_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed rollup over the event stream (micro-batch analog of the
    crawl wave metrics)."""
    e = load(spark, sf_dir, "events")
    # optimization round 6 (guide §2.3): group on date_trunc (integer
    # microsecond arithmetic, 8-byte shuffle key) and run the formatter
    # once per GROUP after the aggregation instead of once per row —
    # hour-truncated timestamp ↔ "yyyy-MM-dd HH" is a bijection (UTC
    # session), so groups and results are identical
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("_h"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("_h", "yyyy-MM-dd HH").alias("hour_bucket"),
            "event_type", "n", "sum_value",
        )
    )


@_q(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational coverage: TPC-H Q1-style pricing summary."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2001-01-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                    ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "q4_suggestions",
    """
    SELECT doc_id, text AS suggestion FROM documents
    WHERE lower(text) LIKE '%spark window%'
    ORDER BY doc_id LIMIT 5
    """,
)
def q4_suggestions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: suggestion fetch — case-insensitive contains, limit 5
    (DBManager.java:705-728; deterministic tiebreak added)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.lower("text").contains("spark window"))
        .orderBy("doc_id")
        .limit(5)
        .select("doc_id", F.col("text").alias("suggestion"))
    )


@_q(
    "r5_candidate_union",
    f"""
    SELECT DISTINCT doc_id FROM ({_TOKENS_SQL})
    WHERE word IN ('spark', 'merge', 'window')
    """,
)
def r5_candidate_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 `commonDocs`: UNION of per-term doc sets (Ranker.java:174-216 —
    a union despite the name). Demoted from the certified registry in
    favor of c7_budget_topk_scale (round-5 rotation); R5 remains
    driver-certified inside r3_bm25's candidate stage."""
    return (
        _tokens(spark, sf_dir)
        .filter(F.col("word").isin("spark", "merge", "window"))
        .select("doc_id")
        .distinct()
    )


@_q(
    "r13_doc_count",
    "SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents",
)
def r13_doc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13: countDocuments (DBManager.java:184-193)."""
    return load(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))


@_q(
    "r14_ordered_multiget",
    """
    WITH ids AS (
        SELECT unnest([7, 3, 11, 5]) AS doc_id,
               unnest(range(4)) AS pos
    )
    SELECT CAST(ids.pos AS INT) AS pos, d.doc_id, d.source
    FROM ids JOIN documents d USING (doc_id)
    """,
)
def r14_ordered_multiget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14: fetch docs by id list, re-ordered to the ranked position
    (DBManager.java:169-182) — posexplode of the id list + join."""
    d = load(spark, sf_dir, "documents")
    ids = spark.range(1).select(
        F.posexplode(F.array(F.lit(7), F.lit(3), F.lit(11), F.lit(5)))
        .alias("pos", "doc_id")
    )
    return ids.join(d, "doc_id").select("pos", "doc_id", "source")


@_q(
    "c21_recrawl_changes",
    """
    WITH base AS (
        SELECT 'https://doc.test/' || doc_id AS url, doc_id % 10 AS m
        FROM documents
    )
    SELECT url,
           CASE WHEN m <= 5 THEN 'touched'
                WHEN m <= 7 THEN 'unchanged'
                ELSE 'changed' END AS status,
           (m = 9) AS link_structure_changed,
           (m > 5) AS budget_consumed
    FROM base
    """,
)
def c21_recrawl_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13+C21: conditional-GET recrawl classification through the real
    operator (fetch.classify_recrawl). The synthetic server state makes all
    three reference outcomes occur: m∈0-5 → validator match → 304 'touched'
    (budget refunded, WebCrawler.java:697); m∈6-7 → validator rotated but
    content hash equal → 'unchanged' (:709-718); m∈8-9 → 'changed', with
    link structure changing only at m=9 (:745-747). The oracle states the
    expected class per row directly."""
    from navi_spark.operators.fetch import classify_recrawl

    d = load(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://doc.test/"), F.col("doc_id").cast("string"))
    m = F.col("doc_id") % 10
    old_children = F.array((F.col("doc_id") + 1).cast("string"),
                           (F.col("doc_id") + 2).cast("string"))
    old = d.select(
        url.alias("url"), F.col("n_chars").alias("phash"),
        old_children.alias("children"),
        F.concat(F.lit("v"), (F.col("doc_id") % 5).cast("string")).alias("etag"),
    )
    new = d.select(
        url.alias("url"),
        F.when(m >= 8, F.col("n_chars") + 1).otherwise(F.col("n_chars"))
        .alias("phash"),
        F.when(m == 9, F.array((F.col("doc_id") + 3).cast("string")))
        .otherwise(old_children).alias("children"),
        F.when(m <= 5,
               F.concat(F.lit("v"), (F.col("doc_id") % 5).cast("string")))
        .otherwise(F.concat(F.lit("w"), (F.col("doc_id") % 5).cast("string")))
        .alias("etag"),
    )
    return classify_recrawl(old, new).select(
        "url", "status", "link_structure_changed", "budget_consumed"
    )




_CURATE_TRI_IN = ", ".join("'" + t + "'" for t in _EN_TRIGRAMS)


@_q(
    "curate_corpus",
    f"""
    WITH tri AS (
      SELECT doc_id,
             ROUND(CAST(SUM(CASE WHEN tg IN ({_CURATE_TRI_IN})
                            THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS tri_score
      FROM (SELECT doc_id, substr(lower(text), CAST(j AS INT) + 1, 3) AS tg
            FROM (SELECT doc_id, text,
                         unnest(range(0, length(text) - 2)) AS j
                  FROM documents WHERE length(text) >= 3))
      GROUP BY doc_id
    ), feat AS (
      SELECT d.doc_id,
             tri.tri_score,
             ROUND(
               0.5 * LEAST(d.n_chars / 500.0, 1.0)
               + 0.5 * (len(string_split_regex(d.text, '\\s+'))
                        - len(list_filter(string_split_regex(d.text, '\\s+'),
                              w -> w = 'the' OR w = 'a' OR w = 'of'
                                   OR w = 'and' OR w = 'to')))
                     / len(string_split_regex(d.text, '\\s+')), 6) AS quality,
             md5(regexp_replace(lower(d.text), '\\s+', ' ', 'g'))
               AS fingerprint,
             CAST(len(string_split_regex(d.text, '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents d JOIN tri ON d.doc_id = tri.doc_id
      WHERE tri.tri_score >= 0.08
    )
    SELECT doc_id, tri_score, quality, n_tokens
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint
                                       ORDER BY doc_id) AS rn
          FROM feat WHERE quality >= 0.55)
    WHERE rn = 1
    """,
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data operators COMPOSED as one curation pipeline:
    language-ID gate (tri_score >= 0.08, the text_langid kernel) →
    quality gate (>= 0.55, the text_quality_score blend) → exact
    near-dup drop (keep lowest doc_id per text_fingerprint) → per-doc
    token count. Each stage is individually driver-certified; this row
    certifies the composition end-to-end against one DuckDB twin.

    Scale shape: ALL per-doc features (trigram score, quality,
    fingerprint, token count) come out of ONE narrow pass over the
    corpus — no joins between feature stages — and the only exchange in
    the plan is the fingerprint window for the dedup keep-first (the
    same C15 shape). At 100 TB this is a single map over the documents
    plus one hash-partitioned window."""
    @F.pandas_udf("long")
    def hits_udf(low: pd.Series) -> pd.Series:
        return low.map(
            lambda s: 0 if s is None
            else sum(s.count(t) for t in _EN_TRIGRAMS)
        ).astype("int64")

    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    low = F.lower(F.col("text"))
    tri = F.round(
        hits_udf(low).cast("double") / (F.length("text") - 2), 6)
    words = F.split(F.col("text"), "\\s+")
    n_stop = F.size(
        F.filter(words, lambda w: w.isin("the", "a", "of", "and", "to")))
    quality = F.round(
        0.5 * F.least(F.col("n_chars") / 500.0, F.lit(1.0))
        + 0.5 * (F.size(words) - n_stop) / F.size(words), 6)
    fp = F.md5(
        F.regexp_replace(low, "\\s+", " ").cast("binary"))
    feat = (
        d.select(
            "doc_id",
            tri.alias("tri_score"),
            quality.alias("quality"),
            fp.alias("fingerprint"),
            F.size(words).cast("long").alias("n_tokens"),
        )
        .filter((F.col("tri_score") >= 0.08) & (F.col("quality") >= 0.55))
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        feat.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "tri_score", "quality", "n_tokens")
    )
