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
import math
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
    # anti-join against a table of the same magnitude as the frontier).
    # The selector hashes (url, 7) — NOT the bare url — because rank below
    # is pmod(xxhash64(url), 1000)/1000: selecting seen by the same hash
    # empties every rank bucket ≡ 0,1,2 (mod 10) after the anti-join, and
    # at 50M urls the 1.5k/r_total head threshold then spans so few grid
    # values ({0,.001,...,.004}, 2 of 5 non-empty) that the head starves
    # and the guard silently reroutes the run to the slow exact-orderBy
    # path (first tripped on the 100x point; seed 7 decorrelates them)
    seen = (
        generate_urls(spark, n_urls, n_hosts=n_hosts, parts=parts,
                      dirty=False, with_children=False)
        .filter(F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(10)) < 3)
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
    # threshold — and collects a BOUNDED result: hot hosts (> cap rows,
    # ≤ n_urls/cap of them) come back one row each, every under-cap host
    # folds into the single null-key row, and Σ min(n_h, cap) = r_total
    # arrives as the sum of the _m column. The design-point discipline is
    # the engine's own (frontier.py politeness_open_rows broadcasts only
    # the at-cap list): the host relation is unbounded at 10^10 URLs, so
    # the bench must never materialize one row per host on the driver.
    host_stats = (
        new.groupBy("host").agg(F.count("*").alias("_n"))
        .groupBy(F.when(F.col("_n") > cap, F.col("host")).alias("_hot"))
        .agg(F.sum(F.least(F.col("_n"), F.lit(cap))).alias("_m"))
        .collect()
    )
    hot_set = [r["_hot"] for r in host_stats if r["_hot"] is not None]
    r_total = sum(r["_m"] for r in host_stats)
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
        # rank lives on a 1/1000 grid (reference formula: hash%1000/1000),
        # so ceil the threshold to the next grid value — a raw 1.5k/r_total
        # that falls between grid points keeps fewer whole buckets than the
        # uniform[0,1] math assumes once r_total >> 1000*k
        thr = min(1.0, math.ceil(1500.0 * k / r_total) / 1000.0)
        head = sel.filter(F.col("rank") <= thr)
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


# Committed reference wall for the calibration job below, measured as the
# min over an interleaved session at local[32] on this sandbox during a
# known-good window. A run whose calibration deviates >1.5× is sampling a
# host slow window — its absolute walls are NOT comparable across rounds
# (round-4 lesson: the driver's 9.87 s frontier headline vs 3.09 s
# same-code same-session was exactly such a window).
# Measured 2026-08-17 via scripts/calibrate_ref.py, three sessions minutes
# apart: mins 0.925 / 1.830 / 1.003 — the 1.83 session IS a detected slow
# window (the probe's purpose). Reference = quiet-window floor.
CALIBRATION_REF_SEC = 0.93


def calibration(spark: SparkSession, reps: int = 3) -> list[float]:
    """Fixed-size pure-CPU probe: a whole-stage-codegen xxhash64 chain over
    a literal range — no shuffle, no python workers, no I/O — so its wall
    depends only on the host's current CPU availability. Emitting it next
    to every headline number makes each bench JSON self-diagnosing."""
    walls = []
    h = F.col("id")
    for _ in range(24):  # deep chain: per-row work dominates task overhead
        h = F.xxhash64(h)

    def probe():
        # a FRESH DataFrame per rep: re-collecting the same object replays
        # the materialized AQE result (~0.1 s) instead of re-executing
        # (measured 6.4 s for the real job at 1B rows)
        return (
            spark.range(0, 128_000_000, 1, 64)
            .select(h.alias("h"))
            .agg(F.max("h").alias("m"))
        )

    probe().collect()  # untimed JIT warmup
    for _ in range(reps):
        t0 = time.monotonic()
        probe().collect()
        walls.append(round(time.monotonic() - t0, 3))
    return walls


# Quiet-window floor for the shuffle probe below, same protocol as
# CALIBRATION_REF_SEC (min over fresh sessions during a good window).
# Round-5 finding that motivates it: the pure-CPU probe read 0.84-0.86 s
# ("good window") in two sessions 30 min apart while the SAME frontier
# job measured 4.35 s in one and 8.26 s in the other — the slow window
# lived in the shuffle machinery (tmpfs writeback / memory bandwidth),
# which a codegen-only chain never touches. Two probes pin both axes.
# First measured 2026-08-17 in a 1.3-2.7x cpu slow window (mins 6.77 /
# 3.37 / 1.665 — an upper bound only). Refined later the same day when a
# genuinely quiet window arrived: two fresh sessions minutes apart read
# cpu mins 0.859 / 0.895 (≤1.0x of CALIBRATION_REF_SEC) with shuffle
# mins 0.977 / 1.023 — stable, so the quiet floor is ~0.98.
SHUFFLE_CALIBRATION_REF_SEC = 0.98


def shuffle_calibration(spark: SparkSession, reps: int = 3) -> list[float]:
    """Fixed-size shuffle probe: 24M (bigint, bigint) rows through one
    real 64→64 exchange (~24M shuffled rows, key cardinality 1M so
    map-side partial agg cannot collapse it) then a hash agg. Same
    fresh-DataFrame-per-rep discipline as `calibration` (AQE replays a
    re-collected DF). Its wall tracks the host's current shuffle-path
    health — the component of frontier/wave walls the CPU probe is blind
    to."""
    walls = []

    def probe():
        return (
            spark.range(0, 24_000_000, 1, 64)
            .select(F.pmod(F.col("id"), F.lit(1_000_003)).alias("k"),
                    F.xxhash64("id").alias("v"))
            .repartition(64, "k")
            .groupBy("k").agg(F.max("v").alias("m"))
            .agg(F.count("*").alias("n"), F.max("m").alias("mm"))
        )

    probe().collect()  # untimed JIT warmup
    for _ in range(reps):
        t0 = time.monotonic()
        probe().collect()
        walls.append(round(time.monotonic() - t0, 3))
    return walls


def recrawl_throughput(spark: SparkSession) -> dict:
    """C21 headline: crawl a synthetic universe (untimed setup), then time
    one full recrawl of the crawled store against a DRIFTED web — reload →
    conditional GET classify → domain cap → MERGE changed pages → PageRank
    recompute (link structures changed). Reported as pages reconciled/sec.
    The job count is recorded and bounded: the no-drift discipline guard is
    17 (tests/test_frontier.py); drift adds the MERGE of changed rows and
    the bounded 10-iteration PageRank loop on top."""
    import shutil
    import tempfile

    from navi_spark.operators.frontier import CrawlConfig, CrawlEngine
    from navi_spark.sources.datagen import (
        generate_images,
        generate_robots,
        generate_seeds,
        generate_web,
    )

    n_urls, n_hosts = 40_000, 80
    workdir = tempfile.mkdtemp(prefix="navi-bench-recrawl-", dir="/dev/shm")
    try:
        web = generate_web(spark, n_urls, n_hosts)
        images = generate_images(spark, n_urls)
        robots = generate_robots(spark, n_hosts)
        seeds = generate_seeds(100, n_urls, n_hosts)
        eng = CrawlEngine(
            spark, workdir, web, images, robots,
            CrawlConfig(max_pages=20_000, max_pages_per_domain=400,
                        wave_budget=5_000),
        )
        eng.bootstrap(seeds)
        eng.run()
        n_pages = eng.pages().count()
        web_v1 = generate_web(spark, n_urls, n_hosts, version=1).cache()
        web_v1.count()  # drifted web materialized outside the timed span
        sc = spark.sparkContext
        tracker = sc._jsc.sc().statusTracker()  # noqa: SLF001
        sc.setJobGroup("bench-recrawl", "timed drifted recrawl")
        t0 = time.monotonic()
        stats = eng.recrawl(web=web_v1)
        wall = time.monotonic() - t0
        sc.setJobGroup(None, None)
        n_jobs = len(list(tracker.getJobIdsForGroup("bench-recrawl")))
        # measured 82: 17 (no-drift discipline bound) + the changed-rows
        # MERGE + the round-5 shuffle-diet jobs (scan-prune key broadcasts,
        # the deferred-children checkpoint and its n_struct aggregate —
        # the jobs that bought the 5.8 → 2.2 GB shuffle cut, every one
        # bounded by |consumed-changed| or a broadcast build) + the
        # 10-iteration PageRank recompute, which since the cache fix
        # materializes as its OWN eager query (nodes count + ~2 AQE
        # query-stage jobs per iteration + the checkpoint write — jobs
        # bounded by the FIXED iteration count, in exchange for the loop
        # no longer replaying uncached inside the rank-snapshot overwrite:
        # whole-recrawl shuffle read −72%, BENCH/RECRAWL_SCALING.md).
        # Trips if per-stat rescans (data-proportional jobs) creep back in.
        assert 0 < n_jobs <= 92, f"drifted recrawl launched {n_jobs} jobs"
        # second sweep against the SAME web: everything now unchanged — the
        # pure freshness-check pass, which must hold the strict no-drift
        # job discipline (tests/test_frontier.py guard = 16)
        sc.setJobGroup("bench-recrawl-nd", "timed no-drift recrawl")
        t0 = time.monotonic()
        eng.recrawl(web=web_v1)
        wall_nd = time.monotonic() - t0
        sc.setJobGroup(None, None)
        n_jobs_nd = len(list(tracker.getJobIdsForGroup("bench-recrawl-nd")))
        # 17 with AQE off (the pytest guard's condition); AQE's per-query-
        # stage jobs lift the same work to a measured ~22 here
        assert 0 < n_jobs_nd <= 26, (
            f"no-drift recrawl launched {n_jobs_nd} jobs"
        )
        web_v1.unpersist()
        return {
            "pages": n_pages,
            "consumed": stats["consumed"],
            "changed": stats["changed"],
            "pagerank_recomputed": stats["pagerank_recomputed"],
            "wall_sec": round(wall, 3),
            "pages_per_sec": round(n_pages / wall, 1),
            "n_jobs": n_jobs,
            "nodrift_wall_sec": round(wall_nd, 3),
            "nodrift_pages_per_sec": round(n_pages / wall_nd, 1),
            "n_jobs_nodrift": n_jobs_nd,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


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
    calib_pre = calibration(spark)
    shcalib_pre = shuffle_calibration(spark)
    # Bounded wait-for-quiet: the shared hypervisor has windows where the
    # shuffle path runs 2-50x slow (measured probe walls up to 48 s vs the
    # 0.98 s quiet floor). Sampling inside one measures the neighbor, not
    # the job — round 4's number of record read 2.7x slow for exactly this
    # reason. If the pre-probes flag a deep window (>3x shuffle or >2x cpu
    # floor), re-probe once a minute for up to 6 minutes and start timing
    # in the best window seen; every probe is recorded so the emitted JSON
    # still self-describes whatever window the samples actually got.
    quiet_wait = 0
    while (
        (min(shcalib_pre) > 3.0 * SHUFFLE_CALIBRATION_REF_SEC
         or min(calib_pre) > 2.0 * CALIBRATION_REF_SEC)
        and quiet_wait < 360
    ):
        time.sleep(60)
        quiet_wait += 60
        calib_pre += calibration(spark, 1)
        shcalib_pre += shuffle_calibration(spark, 1)
    fr_samples = [frontier_throughput(spark, N_URLS, N_HOSTS)
                  for _ in range(5)]
    fr = min(fr_samples, key=lambda r: r["wall_sec"])
    samples: dict[str, list[float]] = {
        "frontier": [s["wall_sec"] for s in fr_samples],
        "calibration_pre": calib_pre,
        "shuffle_calibration_pre": shcalib_pre,
        "quiet_wait_sec": [quiet_wait],
    }

    qtimes: dict[str, float] = {}
    registry = {**q.queries(), **xq.queries()}
    for name in HEADLINE_QUERIES:
        fn = registry[name]
        walls = []
        for _rep in range(2):  # report steady-state (min of 2)
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            walls.append(round(time.monotonic() - t0, 3))
        qtimes[name] = min(walls)
        samples[name] = walls

    # end-to-end search latency (the reference's headline: ~0.5 s/query on
    # a 6k-doc corpus, README.md:96). Index built once OUTSIDE the timed
    # window (the reference also queries a prebuilt index); the timed span
    # is parse → BM25F → hybrid rank → top-k → snippets.
    from navi_spark.operators import indexer
    from navi_spark.operators.search import search as search_e2e

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # the synthetic corpus has a ~30-word vocabulary over N docs, so EVERY
    # word has df ≈ 0.77·N > N/2 → idf ≤ 0 → the reference semantics skip
    # it (Ranker.java:230-232) and a terms query scores the empty set —
    # rounds ≤4 timed exactly that (the plan still ran every stage, but
    # over zero candidates; those search_terms numbers are not comparable
    # with this round's). Fix = the registry's own device (queries.py
    # r3_bm25 marker tokens): append doc_id-derived marks with df ≈ N/7
    # and N/5 (idf > 0), then query the marks — a selective multi-term
    # query that actually ranks ~40% of the corpus's candidate union.
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
    # partition discipline for the SERVED index: sized to the data (a few
    # thousand rows per table), not the session's 64 shuffle partitions —
    # a per-query scan of a tiny cached table must not pay 64 task
    # launches. At 10^10 scale the same tables get proportionally many
    # word-bucketed partitions; partitions-proportional-to-data is the
    # invariant, 8 is its value at sf0.1.
    fields = {"h1": "h1", "other": "other"}
    postings = indexer.build_postings(pages, "url", fields, stem=False).cache()
    lengths = indexer.field_lengths(pages, "url", fields, stem=False).cache()
    # phrase prune index — prebuilt like the postings (the reference also
    # queries a prebuilt index); phrase queries then regex only candidates
    from navi_spark.operators.ranker import build_phrase_index

    phrase_idx = build_phrase_index(pages, "url", list(fields.values()),
                                    parts=8)
    n_docs = pages.count()
    # R4 collection stats are index metadata: computed once at build time
    # (like the reference's stored index stats), not once per query
    from navi_spark.operators.ranker import avg_field_lengths

    avgs = avg_field_lengths(lengths, list(fields))
    # indexing throughput: the reference indexes ~10 docs/s (BASELINE.md) —
    # time the full postings + field-length build over the whole corpus so
    # the comparison is explicit, not implied by the i3/i5 query times
    t0 = time.monotonic()
    postings.count(), lengths.count()
    index_wall = time.monotonic() - t0
    indexing = {
        "docs": n_docs,
        "wall_sec": round(index_wall, 3),
        "docs_per_sec": round(n_docs / index_wall, 1),
    }
    phrase_idx.pairs.count(), phrase_idx.word_df.count()
    # served-index layout (both index-build-time artifacts, like the term
    # dictionary a real engine keeps beside the postings): field lengths
    # denormalized onto the posting rows + the prebuilt DF/IDF table — a
    # terms query then touches NO corpus-sized side table and pays no
    # per-query DF re-aggregation
    from navi_spark.operators.ranker import idf as build_idf

    served = (indexer.embed_field_lengths(postings, lengths)
              .repartition(8, "word").cache())
    idf_tab = build_idf(postings, n_docs).coalesce(1).cache()
    served.count(), idf_tab.count()
    # serving also re-enables AQE partition coalescing: the global
    # coalesce=false exists ONLY to keep the frontier scaling comparison
    # honest (fixed 64 post-shuffle partitions at every parallelism
    # level); a 10-result query over a few thousand posting rows wants
    # its exchanges collapsed, and a real serving deployment would run
    # with coalescing on. Restored after the timed section.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    for qname, qtext in (("search_terms", "tb uc ud"),
                         ("search_phrase", '"hash join"')):
        # same protocol as the frontier: one untimed full warmup pass (C2
        # JIT keeps compiling through the first pass) then min-of-5 — the
        # round-3 search_terms "regression" (0.613 → 0.853 s with a
        # verified-unchanged plan) was the weaker min-of-3/no-warmup
        # protocol sampling host noise
        warm = search_e2e(qtext, pages, served, None, fields, n_docs,
                          k=10, phrase_index=phrase_idx, avg_lengths=avgs,
                          idf_table=idf_tab)
        # a search that scores nothing is not a search benchmark (the
        # rounds-≤4 empty-set artifact this guard exists to catch)
        assert len(warm) == 10, (qname, qtext, len(warm))
        walls = []
        for _rep in range(5):
            t0 = time.monotonic()
            search_e2e(qtext, pages, served, None, fields, n_docs,
                       k=10, phrase_index=phrase_idx, avg_lengths=avgs,
                       idf_table=idf_tab)
            walls.append(round(time.monotonic() - t0, 3))
        qtimes[qname] = min(walls)
        samples[qname] = walls
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    pages.unpersist(), postings.unpersist(), lengths.unpersist()
    served.unpersist(), idf_tab.unpersist()
    phrase_idx.pairs.unpersist(), phrase_idx.word_df.unpersist()

    recrawl = recrawl_throughput(spark)
    qtimes["c21_recrawl_drift"] = recrawl["wall_sec"]
    calib_post = calibration(spark, reps=2)
    shcalib_post = shuffle_calibration(spark, reps=2)
    samples["calibration_post"] = calib_post
    samples["shuffle_calibration_post"] = shcalib_post
    calib_min = min(calib_pre + calib_post)
    shcalib_min = min(shcalib_pre + shcalib_post)
    for label, got, ref in (
        ("calibration", calib_min, CALIBRATION_REF_SEC),
        ("shuffle calibration", shcalib_min, SHUFFLE_CALIBRATION_REF_SEC),
    ):
        if CPUS == 32 and got > 1.5 * ref:
            print(
                f"[bench] WARNING: {label} {got:.2f}s is "
                f">{1.5:.1f}x the committed reference {ref}s — "
                "this run sampled a host slow window on that path; "
                "absolute walls are not comparable across rounds "
                "(relative A/B within this run is)",
                file=sys.stderr,
            )

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "frontier_urls_per_sec",
        "value": fr["wall_sec"],
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "frontier": fr,
        "recrawl": recrawl,
        "indexing": indexing,
        "parallelism": CPUS,
        # every archived number self-describes its window and its config:
        # `samples` exposes the full noise envelope behind each min,
        # `calibration_*` pin the host's CPU window against the committed
        # reference, and `config` tags the measurement hygiene knobs so
        # cross-round comparisons never silently mix configs
        "samples": samples,
        "calibration_sec": calib_min,
        "calibration_ref_sec": CALIBRATION_REF_SEC,
        "shuffle_calibration_sec": shcalib_min,
        "shuffle_calibration_ref_sec": SHUFFLE_CALIBRATION_REF_SEC,
        "config": {
            "shuffle_compress": False,
            "spill_compress": False,
            "local_dir_tmpfs": True,
            "aqe_coalesce": False,
            "driver_memory": "12g",
            "gc": "parallel",
            # round-5 search-serving changes (search_* numbers are NOT
            # comparable with rounds ≤4, which timed a query whose terms
            # all had idf ≤ 0 — an empty result set):
            "search_serving": {
                "terms_query_scores_docs": True,
                "served_index_layout": True,   # embedded lengths + idf tab
                "index_partitions": 8,          # sized to the sf0.1 corpus
                "aqe_coalesce_serving": True,
            },
            # round-5 frontier-proxy fixes (headline effect is sub-noise —
            # the anti-join stays the same size; the head into TakeOrdered
            # grows ~105k → ~150k rows out of 35M-row stages — but the 100x
            # point changes regime: pre-fix it silently fell back to the
            # exact full orderBy):
            "frontier_proxy": {
                "seen_hash_decorrelated": True,  # xxhash64(url, 7) selector
                "head_threshold_grid_ceil": True,
            },
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
