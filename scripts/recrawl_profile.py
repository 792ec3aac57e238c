"""Standalone drifted-recrawl profiler — the bench's recrawl_throughput
section in isolation, so recrawl() changes can be A/B'd in ~1 min instead
of a full bench run.

Usage: python scripts/recrawl_profile.py [reps]
Env:   NAVI_RECRAWL_ROWS_PER_PARTITION  (engine knob under test)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("navi-recrawl-profile")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def one_rep(spark: SparkSession, rep: int) -> dict:
    from navi_spark.operators.frontier import CrawlConfig, CrawlEngine
    from navi_spark.sources.datagen import (
        generate_images,
        generate_robots,
        generate_seeds,
        generate_web,
    )

    n_urls, n_hosts = 40_000, 80
    workdir = tempfile.mkdtemp(prefix="navi-prof-recrawl-", dir="/dev/shm")
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
        web_v1.count()
        sc = spark.sparkContext
        tracker = sc._jsc.sc().statusTracker()  # noqa: SLF001
        sc.setJobGroup(f"prof-recrawl-{rep}", "timed drifted recrawl")
        t0 = time.monotonic()
        stats = eng.recrawl(web=web_v1)
        wall = time.monotonic() - t0
        sc.setJobGroup(None, None)
        n_jobs = len(list(tracker.getJobIdsForGroup(f"prof-recrawl-{rep}")))
        sc.setJobGroup(f"prof-recrawl-nd-{rep}", "timed no-drift recrawl")
        t0 = time.monotonic()
        eng.recrawl(web=web_v1)
        wall_nd = time.monotonic() - t0
        sc.setJobGroup(None, None)
        n_jobs_nd = len(list(
            tracker.getJobIdsForGroup(f"prof-recrawl-nd-{rep}")))
        web_v1.unpersist()
        return {
            "pages": n_pages,
            "consumed": stats["consumed"],
            "changed": stats["changed"],
            "wall": round(wall, 3),
            "n_jobs": n_jobs,
            "wall_nd": round(wall_nd, 3),
            "n_jobs_nd": n_jobs_nd,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    for rep in range(reps):
        print(one_rep(spark, rep), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
