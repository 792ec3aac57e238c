"""Per-stage attribution for the streaming seen-filter scaling cap
(companion to stream_cpuprofile.py, same role STAGE_SCALING.md plays for
the frontier): run the stream_bench child once at a given core count
with the Spark UI enabled, and dump every stage of the timed stream with
wall, executor CPU, and shuffle bytes.

Each micro-batch contributes two stages: the parquet scan + shuffle map
(rows hashed to 64 state partitions) and the stateful
applyInPandasWithState reduce (python workers + state-store commit).
Comparing cpu_ms per stage KIND across core counts shows which side of
the shuffle inflates.

Usage: python scripts/stream_stageprofile.py [cpus] [n_urls] [parts]
Prints one JSON line; does not write to BENCH/.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from stream_bench import FILES_PER_TRIGGER, N_FILES, src_dir  # noqa: E402

CHILD = r"""
import json, os, shutil, sys, tempfile, time, urllib.request
sys.path.insert(0, sys.argv[4])
import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from navi_spark.streaming.wave_stream import streaming_seen_filter
cpus = int(sys.argv[1]); n_urls = int(sys.argv[2]); path = sys.argv[3]
n_files = int(sys.argv[5]); per_trigger = int(sys.argv[6])
parts = int(sys.argv[7])
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("navi-stream-stageprofile")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "12g")
    .config("spark.driver.extraJavaOptions",
            f"-XX:+UseParallelGC -XX:ActiveProcessorCount={cpus}")
    .config("spark.shuffle.compress", "false")
    .config("spark.shuffle.spill.compress", "false")
    .config("spark.ui.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def run_stream(src_path, files_per_trigger, swap_threshold):
    ckpt = tempfile.mkdtemp(prefix="navi-stream-ckpt-", dir="/dev/shm")
    src = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_path + "/batch_*")
    )
    out = streaming_seen_filter(
        src, n_partitions=64, swap_threshold=swap_threshold,
        capacity=300_000, fpp=1e-9,
    )
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

# identical warmup to stream_bench.CHILD
warm = tempfile.mkdtemp(prefix="navi-stream-warm-", dir="/dev/shm")
for i in range(2):
    shutil.copytree(os.path.join(path, f"batch_{i:04d}"),
                    os.path.join(warm, f"batch_{i:04d}"))
run_stream(warm, parts, 10_000)
shutil.rmtree(warm, ignore_errors=True)

ui = spark.sparkContext.uiWebUrl
app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
def stages():
    return json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"))
before = {s["stageId"] for s in stages()}

t0 = time.monotonic()
run_stream(path, per_trigger * parts, 40_000)
wall = time.monotonic() - t0

rows = []
for s in stages():
    if s["stageId"] in before:
        continue
    rows.append({
        "stageId": s["stageId"],
        "name": s["name"].split("\n")[0][:60],
        "tasks": s["numCompleteTasks"],
        "run_ms": s.get("executorRunTime", 0),
        "cpu_ms": int(s.get("executorCpuTime", 0) / 1e6),
        "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
        "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        "in_rows": s.get("inputRecords", 0),
    })
rows.sort(key=lambda x: x["stageId"])
print("RESULT " + json.dumps({"cpus": cpus, "wall_sec": round(wall, 3),
                              "stages": rows}))
spark.stop()
"""


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", CHILD, str(cpus), str(n_urls),
         src_dir(n_urls, parts), REPO, str(N_FILES),
         str(FILES_PER_TRIGGER), str(parts), "300000"],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    result = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is None:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    # aggregate stages by kind: the scan/shuffle-map side has input rows,
    # the stateful reduce side reads the shuffle
    agg: dict[str, dict] = {}
    for s in result["stages"]:
        kind = "map(scan+shuffle-write)" if s["in_rows"] > 0 else \
               "reduce(state+python)" if s["sh_r_mb"] > 0 else "other"
        a = agg.setdefault(kind, {"run_ms": 0, "cpu_ms": 0, "tasks": 0,
                                  "stages": 0})
        a["run_ms"] += s["run_ms"]
        a["cpu_ms"] += s["cpu_ms"]
        a["tasks"] += s["tasks"]
        a["stages"] += 1
    print(json.dumps({"cpus": result["cpus"], "wall_sec": result["wall_sec"],
                      "by_kind": agg}))


if __name__ == "__main__":
    main()
