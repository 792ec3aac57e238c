"""Lane-equivalence A/B: in-process vs spark-submit, same level, same job.

The submit-lane scaling pairs (scripts/submit_scaling.py) take ~6 min per
interleaved pair at 8M URLs; this host's noise windows drift on a faster
timescale, so a pair's two legs routinely land in different windows and
the per-pair efficiency measures the drift, not the job. This harness
answers the narrower question the window CAN'T corrupt: does the
spark-submit --py-files delivery mechanism itself cost anything vs the
in-process session the main scaling table (BENCH/BASELINE.md) uses?

Protocol: alternate the two lanes back-to-back at the SAME parallelism
and input (default local[16], 8M URLs), several rounds. Adjacent runs
share (approximately) one host window, so the per-round ratio
submit/inproc cancels it; the median ratio over rounds is the lane tax.
Both lanes time ONLY the in-JVM, post-warmup frontier job
(bench.frontier_throughput) — JVM/zip startup is excluded by
construction, identical configs (bench.build_session + the CLI JVM
flags submit_scaling.run_at passes).

Usage: python scripts/lane_ab.py [rounds] [cpus] [n_urls]
Appends BENCH/lane_ab.jsonl and prints a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BENCH", "lane_ab.jsonl")

INPROC_CHILD = r"""
import json, sys
sys.path.insert(0, sys.argv[3])
import bench
cpus, n_urls = int(sys.argv[1]), int(sys.argv[2])
spark = bench.build_session(cpus)
spark.sparkContext.setLogLevel("ERROR")
bench.frontier_throughput(spark, 50_000, 100)
if n_urls > 1_000_000:
    bench.frontier_throughput(spark, 1_000_000, 2_000)
r = bench.frontier_throughput(spark, n_urls, max(n_urls // 500, 10))
print("RESULT " + json.dumps(r))
spark.stop()
"""


def run_inproc(cpus: int, n_urls: int) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
         INPROC_CHILD, str(cpus), str(n_urls), REPO],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"inproc failed:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main() -> None:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import submit_scaling

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_urls = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000_000
    os.makedirs(os.path.dirname(RUNS), exist_ok=True)
    staging = tempfile.mkdtemp(prefix="navi-laneab-")
    ratios = []
    try:
        zip_path = submit_scaling.build_zip(staging)
        with open(RUNS, "a") as f:
            for i in range(rounds):
                a = run_inproc(cpus, n_urls)
                b = submit_scaling.run_at(cpus, n_urls, staging, zip_path)
                ratio = round(b["wall_sec"] / a["wall_sec"], 3)
                ratios.append(ratio)
                rec = {"round": i, "cpus": cpus, "n_urls": n_urls,
                       "inproc_wall": a["wall_sec"],
                       "submit_wall": b["wall_sec"],
                       "ratio_submit_over_inproc": ratio}
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(rec, flush=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    print(json.dumps({"median_ratio": med, "ratios": ratios}))


if __name__ == "__main__":
    main()
