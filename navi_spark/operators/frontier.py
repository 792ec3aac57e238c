"""Wave-based crawl frontier + scheduler (reference ops C1, C5-C9, C16-C20).

The reference runs 20 threads around a shared rank-ordered priority heap,
a visited set, and per-domain counters (`crawler/WebCrawler.java:249-534`).
Its visit order is race-dependent; the deterministic semantics of its data
structures (SURVEY.md §7) are:

  * frontier is a min-heap on `rank` ASCENDING (WebCrawler.java:63) — ties
    broken here by `url` ascending for a stable total order;
  * a pop consumes global budget only when the page is actually stored, or
    when the depth limit trips (the one skip path that never refunds,
    WebCrawler.java:364-367 — reproduced);
  * per-domain cap: an over-cap URL is popped and DISCARDED, not re-queued
    (WebCrawler.java:438-444); failures (robots/fetch/dup-content) never
    consume domain or global budget and un-claim the URL
    (WebCrawler.java:446-481);
  * children are normalized at extraction, enqueued when not yet visited,
    duplicates in the frontier allowed (WebCrawler.java:496-518).

This engine linearizes those semantics into WAVES: each wave claims the
lowest-(rank, url) frontier entries subject to per-host and global budgets,
runs robots → fetch/validate → content-dedup, commits one snapshot per
table, and expands children for the next wave. `wave_budget=1` degenerates
to the exact sequential heap order; the pure-Python oracle in
`navi_spark.oracle` implements the identical algorithm and the tests assert
bit-equal visit order + seen set (north rule).

Scale design (the part the reference cannot do):
  * seen-check = partitioned bloom pre-filter (definitely-new rows skip the
    join) + exact anti-join on the `seen` table for maybe-seen rows only;
  * politeness window is TWO-LEVEL: a salted (host, url-hash-salt) top-k
    prunes each host to ≤ S·cap rows BEFORE the per-host row_number window,
    so the hot host never lands in one straggler task;
  * global cap uses orderBy().limit() — Spark's distributed TakeOrdered —
    never a single-partition row_number;
  * every wave ends in snapshot commits; `state` commits LAST and records
    the per-table snapshot ids, so resume() can roll every table back to a
    consistent cut (crash between commits loses nothing but the tail wave).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from navi_spark.catalog import SnapshotTable
from navi_spark.functions.urlnorm import host_expr, normalize_url_udf
from navi_spark.operators import bloom
from navi_spark.operators.fetch import language_gate, validate_payload_udf
from navi_spark.operators.robots import filter_allowed, parsed_rules_table

FRONTIER_SCHEMA = "url string, rank double, depth int, host string, url_hash long"
SEEN_SCHEMA = "url string, url_hash long, host_partition int"
PAGES_SCHEMA = (
    "url string, image_id string, phash long, caption string, depth int, "
    "rank double, host string, wave_id int, children array<string>"
)
HOST_COUNTS_SCHEMA = "host string, successes long"
PHASH_SEEN_SCHEMA = "phash long"
LINEAGE_SCHEMA = (
    "wave_id int, host_partition int, scheduled long, deduped long, "
    "attempted long, blocked_budget long, blocked_robots long, "
    "fetch_failed long, dup_content long, fetched long"
)
METRICS_SCHEMA = (
    "wave_id int, scheduled long, deduped long, attempted long, fetched long, "
    "expanded long, wall_ms long, urls_per_sec double, parallelism int"
)
STATE_SCHEMA = (
    "wave_id int, budget_consumed long, done boolean, snapshots map<string,int>"
)


@dataclass
class CrawlConfig:
    max_depth: int = 5            # WebCrawler.java:28
    max_pages: int = 6000         # WebCrawler.java:27
    max_pages_per_domain: int = 10  # WebCrawler.java:37
    wave_budget: int = 1000       # attempts per wave (BATCH_SIZE analog, :29)
    n_host_partitions: int = 16   # bloom/seen partitions
    salt_buckets: int = 8         # hot-host salt (north rule)
    bloom_bits_per_partition: int = 1 << 20
    bloom_hashes: int = 7
    use_bloom: bool = True
    validate_payloads: bool = True
    max_waves: int = 10_000


@dataclass
class WaveStats:
    wave_id: int
    scheduled: int = 0
    deduped: int = 0
    attempted: int = 0
    fetched: int = 0
    expanded: int = 0
    depth_skips: int = 0
    wall_ms: int = 0


class CrawlEngine:
    """One crawl run rooted at `workdir`; all state in snapshot tables."""

    TABLES = ("frontier", "seen", "pages", "host_counts", "phash_seen",
              "filters", "lineage", "metrics", "state")

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        web: DataFrame,
        images: DataFrame,
        robots: DataFrame,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.t = {
            name: SnapshotTable(spark, os.path.join(workdir, name))
            for name in self.TABLES
        }
        # static inputs, reused every wave
        self.web = web
        self.images = images
        self.rules = parsed_rules_table(robots).cache()
        self.rules.count()  # parse robots once (reference rulesCache, C10)
        self.wave_id = 0
        self.budget_consumed = 0

    # -- helpers -----------------------------------------------------------
    def _hp(self, host_col: str = "host", url_col: str = "url"):
        """Salted host partition: hash(host) spread over `salt_buckets` by
        hash(url) — same url always lands in the same partition, a hot
        host's keys spread across S blooms (north-rule skew handling)."""
        s = self.cfg.salt_buckets
        p = self.cfg.n_host_partitions
        return (
            (F.pmod(F.xxhash64(F.col(host_col)), F.lit(p)) * s
             + F.pmod(F.xxhash64(F.col(url_col)), F.lit(s))).cast("int")
        )

    def _frontier_rows(self, urls: DataFrame) -> DataFrame:
        """(url[, rank, depth]) → full FRONTIER_SCHEMA rows."""
        out = urls
        if "rank" not in out.columns:
            out = out.withColumn("rank", F.lit(1.0))  # INITIAL_RANK (:40)
        if "depth" not in out.columns:
            out = out.withColumn("depth", F.lit(0))
        return out.select(
            "url", "rank", "depth",
            host_expr(F.col("url")).alias("host"),
            F.xxhash64(F.col("url")).alias("url_hash"),
        )

    # -- bootstrap / resume --------------------------------------------------
    def bootstrap(self, seeds: list[str]) -> None:
        """Seed source (C1): normalize, drop invalid, load the frontier."""
        seed_df = self.spark.createDataFrame([(s,) for s in seeds], "raw string")
        normed = seed_df.select(
            normalize_url_udf(F.col("raw")).alias("url")
        ).filter(F.col("url").isNotNull())
        self.t["frontier"].overwrite(
            self._frontier_rows(normed), {"wave": 0, "op": "bootstrap"}
        )
        self.t["state"].overwrite(
            self.spark.createDataFrame(
                [(0, 0, False, {})], STATE_SCHEMA
            ),
            {"op": "bootstrap"},
        )
        self.wave_id = 0
        self.budget_consumed = 0

    def resume(self) -> None:
        """Restore the engine to the last CONSISTENT cut: the `state` table
        commits last each wave and records every table's snapshot id, so any
        table that committed a later (torn) snapshot is rolled back."""
        row = self.t["state"].read().collect()[0]
        self.wave_id = row["wave_id"]
        self.budget_consumed = row["budget_consumed"]
        snaps = row["snapshots"] or {}
        for name, sid in snaps.items():
            cur = self.t[name].snapshot_id()
            if cur is not None and sid is not None and cur > sid:
                self.t[name].rollback(sid)

    # -- the wave ------------------------------------------------------------
    def wave(self) -> WaveStats:
        cfg = self.cfg
        w = self.wave_id + 1
        stats = WaveStats(wave_id=w)
        t0 = time.monotonic()

        frontier = self.t["frontier"].read()
        remaining_global = cfg.max_pages - self.budget_consumed

        # ---- 1. within-frontier dedup: lowest (rank, depth) entry wins.
        # Hash aggregation, NOT a row_number window: a per-url window pays
        # per-group sort machinery (~80µs/group — measured 41s on a 500k-url
        # frontier); min(struct) is a partial-aggregating hash agg (host and
        # url_hash are functions of url, so any value is the right one).
        cand = (
            frontier.groupBy("url")
            .agg(
                F.min(F.struct("rank", "depth")).alias("_m"),
                F.first("host").alias("host"),
                F.first("url_hash").alias("url_hash"),
            )
            .select(
                "url", F.col("_m.rank").alias("rank"),
                F.col("_m.depth").alias("depth"), "host", "url_hash",
            )
        )
        cand = cand.withColumn("host_partition", self._hp()).cache()
        stats.scheduled = cand.count()
        if stats.scheduled == 0 or remaining_global <= 0:
            cand.unpersist()
            self._commit_done()
            return stats

        # ---- 2. URL-seen check (C9): bloom pre-filter + exact anti-join
        seen = self.t["seen"].read_or_empty(SEEN_SCHEMA)
        if cfg.use_bloom and self.t["filters"].exists():
            flt = self.t["filters"].read()
            marked = bloom.annotate_maybe_seen(cand, flt, cfg.bloom_hashes)
            definite_new = marked.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = marked.filter(F.col("maybe_seen")).drop("maybe_seen")
            new = definite_new.unionByName(
                maybe.join(seen.select("url"), on="url", how="left_anti")
            )
        else:
            new = cand.join(seen.select("url"), on="url", how="left_anti")
        new = new.cache()
        stats.deduped = new.count()

        # ---- 3. politeness (C8): two-level top-k, pop-time-drop semantics
        counts = self.t["host_counts"].read_or_empty(HOST_COUNTS_SCHEMA)
        cap = cfg.max_pages_per_domain
        salted = new.withColumn(
            "_salt", F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets))
        )
        w1 = Window.partitionBy("host", "_salt").orderBy("rank", "url")
        pre = (
            salted.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= cap)        # ≤ S·cap rows per host survive
            .drop("_rn1", "_salt")
        )
        w2 = Window.partitionBy("host").orderBy("rank", "url")
        sel = (
            pre.join(F.broadcast(counts), on="host", how="left")
            .fillna({"successes": 0})
            .withColumn("_remaining", F.lit(cap) - F.col("successes"))
            .withColumn("_rn2", F.row_number().over(w2))
            .filter(F.col("_rn2") <= F.col("_remaining"))
            .drop("successes", "_remaining", "_rn2")
        )
        # over-cap rows are DROPPED (reference pops & discards, :438-444)

        # ---- 4. global budget (C7): distributed TakeOrdered, never a
        #          single-partition window
        k = min(remaining_global, cfg.wave_budget)
        attempts = sel.orderBy("rank", "url").limit(k).cache()
        stats.attempted = attempts.count()
        leftover = sel.join(
            attempts.select("url"), on="url", how="left_anti"
        )  # under global cap only — stays queued for later waves

        # ---- 5. depth quirk (C6): depth>max consumes budget, yields nothing
        depth_ok = attempts.filter(F.col("depth") <= cfg.max_depth)
        stats.depth_skips = stats.attempted - depth_ok.count()

        # ---- 6. robots (C10-C12)
        allowed = filter_allowed(depth_ok, self.rules)
        passed_robots = allowed.filter(F.col("robots_allowed")).drop(
            "robots_allowed", "crawl_delay_s"
        )

        # ---- 7. fetch + validate (C13-C14)
        fetched = passed_robots.join(self.web, on="url", how="inner")
        fetched = fetched.join(self.images, on="image_id", how="inner")
        if cfg.validate_payloads:
            fetched = fetched.withColumn(
                "_fail",
                validate_payload_udf("image_id", "bytes", "fmt", "w", "h", "caption"),
            ).filter(F.col("_fail").isNull()).drop("_fail")
        fetched = language_gate(fetched).filter(F.col("lang_ok")).drop("lang_ok")

        # ---- 8. content dedup (C15): first-(rank,url)-wins within the wave,
        #          anti-join against all previously stored phashes
        phash_seen = self.t["phash_seen"].read_or_empty(PHASH_SEEN_SCHEMA)
        rn_ph = F.row_number().over(Window.partitionBy("phash").orderBy("rank", "url"))
        successes = (
            fetched.withColumn("_rnp", rn_ph).filter(F.col("_rnp") == 1).drop("_rnp")
            .join(phash_seen, on="phash", how="left_anti")
            .withColumn(
                "children",
                F.when(
                    F.col("depth") < cfg.max_depth,
                    normalize_children(F.col("children")),
                ).otherwise(F.array().cast("array<string>")),
            )
            .select(
                "url", "image_id", "phash", "caption", "depth", "rank", "host",
                F.lit(w).alias("wave_id"), "children", "url_hash",
                "host_partition",
            )
            .localCheckpoint(eager=True)  # cut lineage; wave outputs reused 4×
        )
        stats.fetched = successes.count()

        # ---- 9. commit wave outputs (C18/C19): one snapshot per table;
        #          `state` last records the consistent cut
        pages_out = successes.drop("url_hash", "host_partition")
        self.t["pages"].append(pages_out, {"wave": w})
        self.t["seen"].append(
            successes.select("url", "url_hash", "host_partition"), {"wave": w}
        )
        self.t["phash_seen"].append(successes.select("phash").distinct(), {"wave": w})
        if cfg.use_bloom:
            old_f = self.t["filters"].read_or_empty(bloom.FILTERS_SCHEMA)
            new_f = bloom.update_filters(
                old_f,
                successes.select("host_partition", "url_hash"),
                cfg.bloom_bits_per_partition,
                cfg.bloom_hashes,
            )
            self.t["filters"].overwrite(new_f, {"wave": w})
        new_counts = (
            self.t["host_counts"].read_or_empty(HOST_COUNTS_SCHEMA)
            .unionByName(
                successes.groupBy("host").agg(F.count("*").alias("successes"))
            )
            .groupBy("host").agg(F.sum("successes").alias("successes"))
        )
        self.t["host_counts"].overwrite(new_counts, {"wave": w})

        # ---- 10. expansion (C16): normalized children, not-seen, host-open
        seen_now = self.t["seen"].read()
        counts_now = self.t["host_counts"].read()
        expansions = (
            successes.filter(F.col("depth") < cfg.max_depth)
            .select(F.explode("children").alias("url"),
                    (F.col("depth") + 1).alias("depth"))
            .filter(F.col("url").isNotNull())
            .withColumn("rank", F.lit(1.0))
            .join(seen_now.select("url"), on="url", how="left_anti")
            .withColumn("host", host_expr(F.col("url")))
            .join(
                F.broadcast(counts_now.filter(F.col("successes") >= cap)
                            .select("host")),
                on="host", how="left_anti",
            )
            .withColumn("url_hash", F.xxhash64("url"))
            .select("url", "rank", "depth", "host", "url_hash")
        )
        new_frontier = leftover.select(
            "url", "rank", "depth", "host", "url_hash"
        ).unionByName(expansions).localCheckpoint(eager=True)
        stats.expanded = new_frontier.count()
        self.t["frontier"].overwrite(new_frontier, {"wave": w})

        # ---- 11. lineage + metrics (north rule)
        self._commit_lineage(w, cand, new, attempts, successes)
        stats.wall_ms = int((time.monotonic() - t0) * 1000)
        par = self.spark.sparkContext.defaultParallelism
        self.t["metrics"].append(
            self.spark.createDataFrame(
                [(w, stats.scheduled, stats.deduped, stats.attempted,
                  stats.fetched, stats.expanded, stats.wall_ms,
                  stats.scheduled / max(stats.wall_ms / 1000.0, 1e-9), par)],
                METRICS_SCHEMA,
            ),
            {"wave": w},
        )

        # ---- 12. state commit = the checkpoint barrier
        self.budget_consumed += stats.fetched + stats.depth_skips
        self.wave_id = w
        snaps = {n: self.t[n].snapshot_id() for n in self.TABLES
                 if n != "state" and self.t[n].snapshot_id() is not None}
        self.t["state"].overwrite(
            self.spark.createDataFrame(
                [(w, self.budget_consumed, False, snaps)], STATE_SCHEMA
            ),
            {"wave": w},
        )
        cand.unpersist()
        new.unpersist()
        attempts.unpersist()
        return stats

    def _commit_lineage(self, w, cand, new, attempts, successes) -> None:
        def per_hp(df, name):
            return df.groupBy("host_partition").agg(F.count("*").alias(name))

        lin = (
            per_hp(cand, "scheduled")
            .join(per_hp(new, "deduped"), "host_partition", "full")
            .join(per_hp(attempts, "attempted"), "host_partition", "full")
            .join(per_hp(successes, "fetched"), "host_partition", "full")
            .fillna(0)
            .select(
                F.lit(w).alias("wave_id"), "host_partition",
                "scheduled", "deduped", "attempted",
                (F.col("deduped") - F.col("attempted")).alias("blocked_budget"),
                F.lit(0).cast("long").alias("blocked_robots"),
                (F.col("attempted") - F.col("fetched")).alias("fetch_failed"),
                F.lit(0).cast("long").alias("dup_content"),
                "fetched",
            )
        )
        self.t["lineage"].append(lin, {"wave": w})

    def _commit_done(self) -> None:
        snaps = {n: self.t[n].snapshot_id() for n in self.TABLES
                 if n != "state" and self.t[n].snapshot_id() is not None}
        self.t["state"].overwrite(
            self.spark.createDataFrame(
                [(self.wave_id, self.budget_consumed, True, snaps)], STATE_SCHEMA
            ),
            {"op": "done"},
        )

    # -- drivers -------------------------------------------------------------
    def run(self, max_waves: int | None = None) -> list[WaveStats]:
        out: list[WaveStats] = []
        limit = max_waves if max_waves is not None else self.cfg.max_waves
        for _ in range(limit):
            s = self.wave()
            out.append(s)
            if s.scheduled == 0 or self.budget_consumed >= self.cfg.max_pages:
                break
        return out

    # -- outputs ---------------------------------------------------------------
    def pages(self) -> DataFrame:
        return self.t["pages"].read_or_empty(PAGES_SCHEMA)

    def seen(self) -> DataFrame:
        return self.t["seen"].read_or_empty(SEEN_SCHEMA)

    def index_feed(self) -> DataFrame:
        """Indexer handoff contract (C24): (url, image_id, phash, caption)."""
        return self.pages().select("url", "image_id", "phash", "caption")

    def visit_order(self) -> DataFrame:
        """Deterministic visit order: (wave_id, rank, url) — the linearized
        pop order the oracle reproduces."""
        return self.pages().select("wave_id", "rank", "url").orderBy(
            "wave_id", "rank", "url"
        )


def _norm_children_kernel(arrs: pd.Series) -> pd.Series:
    from navi_spark.functions.urlnorm import normalize_url_py

    def one(arr):
        if arr is None:
            return []
        out = []
        for u in arr:
            n = normalize_url_py(u)
            if n is not None:
                out.append(n)
        return out

    return arrs.map(one)


def normalize_children(children_col):
    """Normalize a children array WITHOUT exploding (no shuffle): one
    Arrow-batched UDF over array<string> (C16 link normalization,
    WebCrawler.java:496-518 — null children skipped)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    udf = pandas_udf(_norm_children_kernel, ArrayType(StringType()))
    return udf(children_col)
