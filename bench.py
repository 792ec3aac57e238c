"""Benchmark harness — north metric: frontier throughput (URLs
scheduled+deduped/sec) plus headline operator timings.

Run:  python bench.py
Env:  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
      SPARK_GRAFT_CPUS    (default 32)
      NAVI_BENCH_URLS     (default 500000) — synthetic frontier size

Prints ONE JSON line:
  {"metric": "frontier_urls_per_sec", "value": <headline wall sec>,
   "unit": "sec", "queries": {...per-query sec...}, "sf": ...,
   "frontier": {...throughput detail...}}

The frontier job is the engine's wave-scheduling core on a synthetic
Zipf-skewed URL universe: dirty-URL generation → vectorized canonicalization
(C3) → within-batch dedup (C15 window) → anti-join against a pre-seeded seen
table (C9) → two-level politeness window (C8) → global TakeOrdered (C7).
Scaling evidence (local[8] vs local[32]) is produced by
scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession, Window  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_URLS = int(os.environ.get("NAVI_BENCH_URLS", "500000"))
N_HOSTS = max(N_URLS // 500, 10)

HEADLINE_QUERIES = (
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


def build_session(cpus: int) -> SparkSession:
    # Executor-fleet runs pin the JVM's own thread pools (GC/JIT/netty) to
    # the granted cores — the cpuset analog of a real cluster manager. A
    # co-resident JVM that sizes pools for all 32 host CPUs oversubscribes
    # 4× and slows the whole fleet ~18× (measured).
    java_opts = "-XX:+UseParallelGC"
    if os.environ.get("NAVI_PIN_CORES"):
        java_opts += f" -XX:ActiveProcessorCount={cpus}"
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("navi-bench")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        # keep 64 post-shuffle partitions at every parallelism level: AQE
        # coalescing would shrink the mid-stages to ~6 partitions (sized for
        # 64MB), starving >8-core runs and corrupting the scaling comparison
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # shuffle spill to tmpfs: the sandbox's overlay disk has multi-second
        # writeback stalls that add ±60s noise to otherwise-4s runs
        .config("spark.local.dir", "/dev/shm/spark-local")
        # with shuffle dirs on a RAM disk, lz4-compressing shuffle blocks
        # is pure CPU spent shrinking bytes that never touch disk or
        # network: measured 24.8 → 17.2 s best-of-3 on the 8M-url frontier
        # at local[32]. (A real cluster keeps compression ON for the
        # network hop — this is local-mode measurement hygiene, same
        # category as the tmpfs choice itself.)
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 12g + ParallelGC measured fastest for this shuffle-heavy profile
        # (48g G1 paid large-heap GC overhead: 6.6s vs 3.8s at local[32])
        .config("spark.driver.memory", "12g")
        .config("spark.driver.extraJavaOptions", java_opts)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def frontier_throughput(
    spark: SparkSession, n_urls: int, n_hosts: int, parts: int = 64
) -> dict:
    """The north-metric job: schedule + dedup a synthetic frontier.

    `parts` is FIXED (not derived from cores) so the job is byte-identical
    across parallelism levels — the scaling-efficiency protocol compares
    the same plan on the same input, varying only executor slots."""
    from navi_spark.functions.urlnorm import host_expr, normalize_url_udf
    from navi_spark.sources.datagen import generate_urls
    raw = generate_urls(
        spark, n_urls, n_hosts=n_hosts, parts=parts, dirty=True,
        with_children=False,
    ).select("url")
    # pre-seeded seen set: ~30% of the canonical universe (forces a real
    # anti-join against a table of the same magnitude as the frontier)
    seen = (
        generate_urls(spark, n_urls, n_hosts=n_hosts, parts=parts,
                      dirty=False, with_children=False)
        .filter(F.pmod(F.xxhash64("url"), F.lit(10)) < 3)
        .select("url")
    )
    seen.cache().count()  # materialize outside the timed section

    t0 = time.monotonic()
    cand = raw.select(normalize_url_udf("url").alias("url")).filter(
        F.col("url").isNotNull()
    )
    # within-batch dedup (first spelling wins) — hash agg, not a window:
    # per-url windows pay per-group sort overhead (41s vs ~3s at 500k urls).
    # rank and host are pure functions of the CANONICAL url (identical for
    # every dup spelling), so both are derived AFTER the exchange: the
    # dedup shuffle carries the bare url string and nothing else
    cand = cand.distinct()
    cand = cand.withColumn(
        "rank", (F.pmod(F.xxhash64("url"), F.lit(1000)) / 1000.0)
    ).withColumn("host", host_expr(F.col("url")))
    new = cand.join(seen, "url", "left_anti").persist()
    # politeness: window ONLY the over-cap (hot) hosts. In a Zipf host
    # distribution almost every host is under cap — rows of under-cap hosts
    # all survive, so sorting them in a window is pure waste (and the
    # per-host sort was the worst-scaling stage in round 1: two full-data
    # window shuffles → now one tiny count agg + a window over the hot
    # sliver). The hot-host row set still goes through the two-level salted
    # window so no single task ever owns a whole hot host.
    cap = 10_000
    # one tiny aggregation drives BOTH the hot-host split and the budget
    # threshold: |selected| = Σ min(n_h, cap) exactly, so no second pass
    # (round-1's persist+count+approxQuantile over the survivors cost two
    # extra full materializations and erased the window savings)
    host_rows = new.groupBy("host").agg(F.count("*").alias("_n")).collect()
    hot_set = [r["host"] for r in host_rows if r["_n"] > cap]
    r_total = sum(min(r["_n"], cap) for r in host_rows)
    if hot_set:
        # a handful of Zipf-hot hosts → literal isin predicate; with an
        # adversarially large hot set this becomes a broadcast semi-join,
        # same plan shape
        is_hot = F.col("host").isin(*hot_set)
        salted = new.filter(is_hot).withColumn(
            "_salt", F.pmod(F.xxhash64("url"), F.lit(16))
        )
        w1 = Window.partitionBy("host", "_salt").orderBy("rank", "url")
        pre = salted.withColumn("_r1", F.row_number().over(w1)).filter(
            F.col("_r1") <= cap
        ).drop("_r1", "_salt")
        w2 = Window.partitionBy("host").orderBy("rank", "url")
        sel_hot = pre.withColumn("_r2", F.row_number().over(w2)).filter(
            F.col("_r2") <= cap
        ).drop("_r2")
        sel = new.filter(~is_hot).unionByName(sel_hot)
    else:
        sel = new
    # global budget: for large k a plain orderBy().limit(k) makes the driver
    # single-threadedly merge 64 × k rows (a flat ~20s that kills scaling).
    # Scalable form: rank is a uniform hash, so a threshold of 1.5·k/|sel|
    # bounds the head at ~1.5k rows (hot-host trimming only biases kept
    # ranks LOW, adding head rows — never losing top-k ones); TakeOrdered
    # runs on the head only, with an exact-path guard if the head ever
    # came up short.
    k = 100_000
    if k < r_total:
        head = sel.filter(F.col("rank") <= min(1.0, 1.5 * k / r_total))
    else:
        head = sel
    scheduled = head.orderBy("rank", "url").limit(k).count()
    if scheduled < min(k, r_total):  # statistical guard (P ≈ e^-3000)
        # the head filter assumes rank ~ uniform[0,1]; a skewed/constant
        # rank distribution empties the head and this run silently measures
        # the exact full-orderBy path instead — make that visible
        print(
            f"[bench] WARNING: uniform-rank head filter kept {scheduled} "
            f"< {min(k, r_total)} rows; falling back to exact full orderBy "
            "(rank distribution is not uniform[0,1] — the measured path "
            "changed)",
            file=sys.stderr,
        )
        scheduled = sel.orderBy("rank", "url").limit(k).count()
    wall = time.monotonic() - t0
    new.unpersist()
    seen.unpersist()
    return {
        "n_urls": n_urls,
        "scheduled": scheduled,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(n_urls / wall, 1),
    }


def main() -> None:
    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    from navi_spark import extra_queries as xq
    from navi_spark import queries as q

    # warmup: fork the python workers + JIT the codegen paths once, so the
    # measurement is steady-state throughput, not process cold-start;
    # min-of-N rides out the shared-host noise (±2× on identical runs).
    # Warmup is two-step (small, then FULL-SIZE untimed): C2-JIT keeps
    # compiling through the first full-size pass — measured 43s → 13s → 5s
    # across identical consecutive runs — so a small-only warmup leaves the
    # first timed rep paying compilation, wasting one of the min() samples.
    frontier_throughput(spark, 20_000, 50)
    frontier_throughput(spark, N_URLS, N_HOSTS)
    fr = min(
        (frontier_throughput(spark, N_URLS, N_HOSTS) for _ in range(5)),
        key=lambda r: r["wall_sec"],
    )

    qtimes: dict[str, float] = {}
    registry = {**q.queries(), **xq.queries()}
    for name in HEADLINE_QUERIES:
        fn = registry[name]
        best = float("inf")
        for _rep in range(2):  # report steady-state (min of 2)
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            best = min(best, time.monotonic() - t0)
        qtimes[name] = round(best, 3)

    # end-to-end search latency (the reference's headline: ~0.5 s/query on
    # a 6k-doc corpus, README.md:96). Index built once OUTSIDE the timed
    # window (the reference also queries a prebuilt index); the timed span
    # is parse → BM25F → hybrid rank → top-k → snippets.
    from navi_spark.operators import indexer
    from navi_spark.operators.search import search as search_e2e

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = d.select(
        F.col("doc_id").cast("string").alias("url"),
        ((F.col("doc_id") % 100) / 100.0).alias("rank"),
        F.regexp_extract(F.lower("text"), r"^(\S+ \S+ \S+)", 1).alias("h1"),
        F.regexp_replace(F.lower("text"), r"^(\S+ \S+ \S+)\s*", "").alias("other"),
    ).cache()
    fields = {"h1": "h1", "other": "other"}
    postings = indexer.build_postings(pages, "url", fields, stem=False).cache()
    lengths = indexer.field_lengths(pages, "url", fields, stem=False).cache()
    # phrase prune index — prebuilt like the postings (the reference also
    # queries a prebuilt index); phrase queries then regex only candidates
    from navi_spark.operators.ranker import build_phrase_index

    phrase_idx = build_phrase_index(pages, "url", list(fields.values()))
    n_docs = pages.count()
    postings.count(), lengths.count()
    phrase_idx.pairs.count(), phrase_idx.word_df.count()
    for qname, qtext in (("search_terms", "spark merge window"),
                         ("search_phrase", '"hash join"')):
        # same protocol as the frontier: one untimed full warmup pass (C2
        # JIT keeps compiling through the first pass) then min-of-5 — the
        # round-3 search_terms "regression" (0.613 → 0.853 s with a
        # verified-unchanged plan) was the weaker min-of-3/no-warmup
        # protocol sampling host noise
        search_e2e(qtext, pages, postings, lengths, fields, n_docs,
                   k=10, phrase_index=phrase_idx)
        best = float("inf")
        for _rep in range(5):
            t0 = time.monotonic()
            search_e2e(qtext, pages, postings, lengths, fields, n_docs,
                       k=10, phrase_index=phrase_idx)
            best = min(best, time.monotonic() - t0)
        qtimes[qname] = round(best, 3)
    pages.unpersist(), postings.unpersist(), lengths.unpersist()
    phrase_idx.pairs.unpersist(), phrase_idx.word_df.unpersist()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "frontier_urls_per_sec",
        "value": fr["wall_sec"],
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "frontier": fr,
        "parallelism": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
