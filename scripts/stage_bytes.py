"""Per-stage shuffle-byte evidence for the wave-scheduling bench job.

Runs `frontier_throughput` once (after warmup) with the Spark UI enabled,
then reads /api/v1 stage metrics — shuffle read/write bytes per stage and
the job total. Used to document how many bytes the frontier actually moves
(BENCH/BASELINE.md addendum) and to verify shuffle-byte diets (e.g. the
url-only dedup exchange) with measurements instead of guesses.

Usage:
  python scripts/stage_bytes.py [n_urls] [cpus] [bench_module_path]
The optional third arg lets you point at an older bench.py copy (e.g.
`git show HEAD~1:bench.py > /tmp/bench_old.py`) for a before/after diff.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_bench(path: str | None):
    if not path:
        import bench

        return bench
    spec = importlib.util.spec_from_file_location("bench_alt", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    bench = load_bench(sys.argv[3] if len(sys.argv) > 3 else None)

    from pyspark.sql import SparkSession

    SparkSession.builder.config("spark.ui.enabled", "true")  # noqa
    # rebuild the bench session with the UI on
    os.environ.setdefault("NAVI_BENCH_UI", "1")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("navi-stage-bytes")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.frontier_throughput(spark, 50_000, 100)  # warmup
    mark = spark.sparkContext.statusTracker()
    stages_before = set(mark.getJobIdsForGroup() or [])
    r = bench.frontier_throughput(spark, n_urls, max(n_urls // 500, 10))

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    rows = [
        {
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "input_mb": round(s["inputBytes"] / 1e6, 1),
            "ms": s.get("executorRunTime", 0),
        }
        for s in stages
    ]
    rows.sort(key=lambda x: -(x["shuffle_read_mb"] + x["shuffle_write_mb"]))
    total_r = sum(x["shuffle_read_mb"] for x in rows)
    total_w = sum(x["shuffle_write_mb"] for x in rows)
    print(json.dumps({
        "n_urls": n_urls,
        "cpus": cpus,
        "wall_sec": r["wall_sec"],
        "total_shuffle_read_mb": round(total_r, 1),
        "total_shuffle_write_mb": round(total_w, 1),
        "top_stages": rows[:8],
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
