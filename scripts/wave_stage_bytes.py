"""Per-stage shuffle accounting for ONE CrawlEngine wave at bench scale.

Drives the real engine (not the bench facsimile) on a synthetic universe
large enough that exchanges dominate, with the Spark UI on, and reports
per-stage shuffle read/write bytes + records for the stages the wave
launches. Shuffle BYTES are deterministic (noise-free on a busy host), so
this is the before/after instrument for wave exchange-consolidation work:
the wave historically paid three full-size exchanges (url-dedup hash agg,
bloom cogroup by host_partition, salted politeness window) — this script
shows how many rows/bytes each actually moves.

Usage: python scripts/wave_stage_bytes.py [n_urls] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_hosts = max(n_urls // 500, 10)

    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from navi_spark.operators.frontier import CrawlConfig, CrawlEngine
    from navi_spark.sources.datagen import (
        canonical_url,
        generate_robots,
        generate_web,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("navi-wave-bytes")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4061")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    web = generate_web(spark, n_urls, n_hosts).cache()
    # lightweight image payloads: the wave's exchange structure does not
    # depend on pixel bytes (validate_payloads=False below)
    images = spark.range(n_urls).select(
        F.format_string("img%010d", F.col("id")).alias("image_id"),
        (F.col("id") + 1).alias("phash"),
        F.format_string("caption %d", F.col("id")).alias("caption"),
    ).cache()
    robots = generate_robots(spark, n_hosts)
    web.count(), images.count()
    seeds = [canonical_url(i, n_hosts) for i in range(n_urls)]

    workdir = tempfile.mkdtemp(prefix="navi-wave-bytes-")
    cfg = CrawlConfig(
        max_pages=n_urls, max_pages_per_domain=10,
        wave_budget=max(n_urls // 3, 1000),
        n_host_partitions=16, salt_buckets=8, validate_payloads=False,
    )
    eng = CrawlEngine(spark, workdir, web, images, robots, cfg)
    eng.bootstrap(seeds)

    ui = spark.sparkContext.uiWebUrl
    app = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def stages():
        return json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"))

    before = {s["stageId"] for s in stages()}
    t0 = time.monotonic()
    stats = eng.wave()
    wall = time.monotonic() - t0

    rows = []
    for s in stages():
        if s["stageId"] in before:
            continue
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:64],
            "tasks": s["numCompleteTasks"],
            "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
            "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
            "sh_r_rows": s.get("shuffleReadRecords", 0),
            "sh_w_rows": s.get("shuffleWriteRecords", 0),
        })
    rows.sort(key=lambda x: -(x["sh_r_mb"] + x["sh_w_mb"]))
    print(json.dumps({
        "n_urls": n_urls,
        "cpus": cpus,
        "wave_wall_sec": round(wall, 2),
        "scheduled": stats.scheduled,
        "fetched": stats.fetched,
        "total_shuffle_write_mb": round(
            sum(x["sh_w_mb"] for x in rows), 1),
        "total_shuffle_write_rows": sum(x["sh_w_rows"] for x in rows),
        "stages_with_shuffle": [
            x for x in rows if x["sh_r_mb"] or x["sh_w_mb"]][:14],
    }, indent=2))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
