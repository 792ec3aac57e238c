"""Capture .explain("formatted") for the headline queries into plans/r06/.

Usage:
    python scripts/capture_plans.py <suffix> [only_csv]

Writes plans/r06/<query>_<suffix>.txt for every headline registry query,
plus search_terms/search_phrase (the serving plan over the bench's
served-index layout). Session config mirrors bench.py so the captured
plans are the ones the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")

REGISTRY_QUERIES = (
    "crawl_wave_schedule",
    "c23_pagerank",
    "i3_tokenize",
    "r3_bm25",
    "r8_hybrid_topk",
    "sim_cosine_brute",
    "c15_content_dedup",
    "tpch_q1_pricing_summary",
    "ev_hourly_rollup",
)


def explain_str(df) -> str:
    qe = df._jdf.queryExecution()  # noqa: SLF001
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    os.makedirs(OUT, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from navi_spark import extra_queries as xq
    from navi_spark import queries as q

    registry = {**q.queries(), **xq.queries()}
    for name in REGISTRY_QUERIES:
        if only and name not in only:
            continue
        df = registry[name](spark, SF_DIR)
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df))
        print(f"wrote {name}_{suffix}.txt")

    if only is None or {"search_terms", "search_phrase"} & only:
        # replicate the bench's served-index setup (bench.py:456-535)
        from navi_spark.operators import indexer
        from navi_spark.operators import ranker

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        t_marks = F.array(*[F.lit(m) for m in
                            ("ta", "tb", "tc", "td", "te", "tf", "tg")])
        u_marks = F.array(*[F.lit(m) for m in ("ua", "ub", "uc", "ud", "ue")])
        pages = d.select(
            F.col("doc_id").cast("string").alias("url"),
            ((F.col("doc_id") % 100) / 100.0).alias("rank"),
            F.regexp_extract(F.lower("text"), r"^(\S+ \S+ \S+)", 1).alias("h1"),
            F.concat(
                F.regexp_replace(F.lower("text"), r"^(\S+ \S+ \S+)\s*", ""),
                F.lit(" "),
                F.element_at(t_marks, (F.col("doc_id") % 7 + 1).cast("int")),
                F.lit(" "),
                F.element_at(u_marks, (F.col("doc_id") % 5 + 1).cast("int")),
            ).alias("other"),
        ).repartition(8).cache()
        fields = {"h1": "h1", "other": "other"}
        postings = indexer.build_postings(pages, "url", fields, stem=False).cache()
        lengths = indexer.field_lengths(pages, "url", fields, stem=False).cache()
        phrase_idx = ranker.build_phrase_index(
            pages, "url", list(fields.values()), parts=8)
        n_docs = pages.count()
        avgs = ranker.avg_field_lengths(lengths, list(fields))
        served = (indexer.embed_field_lengths(postings, lengths)
                  .repartition(8, "word").cache())
        idf_tab = ranker.idf(postings, n_docs).coalesce(1).cache()
        served.count(), idf_tab.count()
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true")

        # terms query plan: relevance -> hybrid -> top-k -> text join
        relevance = ranker.bm25f(
            served, None, ["tb", "uc", "ud"], n_docs, fields=list(fields),
            avg_lengths=avgs, idf_table=idf_tab)
        ranked = ranker.hybrid_rank(relevance, pages, limit=10)
        top = F.broadcast(ranked).join(
            pages.select(F.col("url").alias("doc_id"),
                         F.col("h1").alias("_text")), "doc_id")
        with open(os.path.join(OUT, f"search_terms_{suffix}.txt"), "w") as f:
            f.write(explain_str(top))
        print(f"wrote search_terms_{suffix}.txt")

        words = ["hash", "join"]
        rx = ranker.phrase_regex(words)
        pruned = ranker.phrase_prune(pages, phrase_idx, words, id_col="url",
                                     n_docs=n_docs)
        rel_p = ranker.phrase_scores(pruned, rx, fields).withColumnRenamed(
            "phrase_score", "relevance")
        ranked_p = ranker.hybrid_rank(rel_p, pages, limit=10)
        top_p = F.broadcast(ranked_p).join(
            pages.select(F.col("url").alias("doc_id"),
                         F.col("h1").alias("_text")), "doc_id")
        with open(os.path.join(OUT, f"search_phrase_{suffix}.txt"), "w") as f:
            f.write(explain_str(top_p))
        print(f"wrote search_phrase_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
