"""Evidence that the dedup exchange already pre-deduplicates map-side.

The headline bench frontier has one dirty spelling per distinct URL, so
its dedup exchange necessarily carries ~1 row per input row — no row
lever exists there. A REAL frontier is duplicate-heavy (link expansion
emits the same popular child from many parents), and there the lever is
Spark's map-side partial hash aggregation: each map task emits one row
per distinct url it saw, so exchanged rows fall well below input rows
with no extra code.

This script builds a Zipf-duplicated frontier (multiplicity concentrated
on popular urls, like real in-link distributions), runs the exact bench
dedup pipeline (normalize → distinct), and reads the map stage's shuffle
WRITE record count from the REST API: exchanged_rows / input_rows is the
measured row cut.

Usage: python scripts/dedup_row_cut.py [n_total] [dup_factor] [cpus] [pow]

`pow` controls head-heaviness of the popularity distribution (picks
url_idx = n_unique·u^pow): 2 ≈ mild in-link skew (few within-partition
dups — the conservative case), 8+ ≈ heavy-head webgraph in-degree (the
case the map-side cut engages hard).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    dup_factor = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    pow_ = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    n_unique = int(n_total / dup_factor)
    n_hosts = max(n_unique // 500, 10)

    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    from navi_spark.functions.urlnorm import normalize_url_udf
    from navi_spark.sources.datagen import _u01, dirty_url

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("navi-dedup-rowcut")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4071")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def gen(batches):
        for b in batches:
            idx = [int(i) for i in b["id"]]
            # u^pow concentrates picks on low url ids; popular urls appear
            # in MANY map partitions, and the partial agg can only dedup
            # within a partition — so the measured cut is exactly the
            # within-partition duplicate density at this head-heaviness
            yield pd.DataFrame({
                "url": [
                    dirty_url(int(n_unique * (_u01(i, 77) ** pow_))
                              % n_unique, n_hosts)
                    for i in idx
                ]
            })

    raw = spark.range(n_total, numPartitions=64).mapInPandas(
        gen, "url string")

    def run_once():
        t0 = time.monotonic()
        n = (
            raw.select(normalize_url_udf("url").alias("url"))
            .filter(F.col("url").isNotNull())
            .distinct()
            .count()
        )
        return n, time.monotonic() - t0

    run_once()  # warmup
    ui = spark.sparkContext.uiWebUrl
    app = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def stages():
        return json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"))

    before = {s["stageId"] for s in stages()}
    n_out, wall = run_once()
    new_stages = [s for s in stages() if s["stageId"] not in before]
    write_rows = max(s.get("shuffleWriteRecords", 0) for s in new_stages)
    write_mb = max(
        s.get("shuffleWriteBytes", 0) for s in new_stages) / 1e6
    print(json.dumps({
        "input_rows": n_total,
        "distinct_urls": n_out,
        "dup_factor_requested": dup_factor,
        "popularity_pow": pow_,
        "dup_factor_actual": round(n_total / n_out, 2),
        "dedup_exchange_rows": write_rows,
        "dedup_exchange_mb": round(write_mb, 1),
        "rows_cut_vs_input": round(1 - write_rows / n_total, 3),
        "wall_sec": round(wall, 2),
        "note": "exchanged rows < input rows with zero extra code: "
                "Spark's partial hash agg dedups map-side before the "
                "exchange (the VERDICT r03 'partition-local pre-dedup' "
                "lever is built into the plan)",
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
