"""Scaling-efficiency evidence for the COMPOSED CrawlEngine.recrawl() (C21).

The scoreboard (BENCH/BASELINE.md) measures every engine verb at two
parallelism levels except recrawl, which until now had only the bench.py
throughput headline. This harness gives the freshness pass the same
treatment as ENGINE_SCALING.md: one full ``CrawlEngine.recrawl()`` against
a DRIFTED web — rank-desc reload of the crawled store, conditional-GET
classification (ETag/Last-Modified validators, per-host ``honors_304``),
per-host domain-cap boundary, MERGE of changed pages, and the conditional
10-iteration PageRank recompute (link structures changed) — driven
end-to-end over parquet tables both parallelism levels read
byte-identically.

Protocol is the repo standard (BENCH/BASELINE.md): no real cluster in this
sandbox, so the north rule's two-cluster-size criterion is evidenced by
the IDENTICAL job (fixed 64 shuffle partitions, fixed 64 host partitions,
identical configs, same input parquet AND the same pre-crawled store —
generated once, copied per run because recrawl mutates it) at local[N] vs
local[4N], taskset-bound fresh JVM per run, in-JVM warmup (a complete
small engine crawl + recrawl), INTERLEAVED samples, min per level.
Per-stage wall / CPU / shuffle bytes from the Spark REST API for
attribution. Outcome (consumed/changed/statuses histogram) must be
bit-identical across levels or the pair is rejected.

Usage:
  python scripts/recrawl_scaling.py gen [n_urls]     # crawl once at
        local[32] -> /dev/shm store + drifted-web parquet (shared bytes)
  python scripts/recrawl_scaling.py pair [n_urls] [N]
  python scripts/recrawl_scaling.py hunt [n_urls] [N] [max_pairs] [factor]
  python scripts/recrawl_scaling.py report [N]       # -> BENCH/RECRAWL_SCALING.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BENCH", "recrawl_scaling.jsonl")


def base_path(n_urls: int) -> str:
    return f"/dev/shm/navi-recrawl-{n_urls}"


# engine config shared by gen and measure (resume() replays the same
# snapshot machinery; the cfg must agree between the crawl that built the
# store and the recrawl that reloads it)
CFG_SRC = r"""
def make_cfg(n_urls):
    from navi_spark.operators.frontier import CrawlConfig
    return CrawlConfig(
        max_depth=50, max_pages=n_urls, max_pages_per_domain=100,
        wave_budget=max(n_urls // 4, 1000), n_host_partitions=64,
        salt_buckets=8, validate_payloads=False,
    )
"""

GEN_CHILD = CFG_SRC + r"""
import sys
sys.path.insert(0, sys.argv[3])
from bench import build_session
from navi_spark.operators.frontier import CrawlEngine
from navi_spark.sources.datagen import (
    generate_images, generate_robots, generate_web)
n_urls = int(sys.argv[1]); base = sys.argv[2]
n_hosts = max(n_urls // 500, 10)
spark = build_session(32)
spark.sparkContext.setLogLevel("ERROR")
web0 = generate_web(spark, n_urls, n_hosts, parts=64).cache()
images = generate_images(spark, n_urls, parts=64)
images.write.mode("overwrite").parquet(base + "/images.parquet")
generate_robots(spark, n_hosts).write.mode(
    "overwrite").parquet(base + "/robots.parquet")
generate_web(spark, n_urls, n_hosts, parts=64, version=1).write.mode(
    "overwrite").parquet(base + "/web_v1.parquet")
# crawl ONE wave to populate the store both levels will recrawl: the
# measured job's input is the store's pages table, so it is produced once
# here (fixed local[32]) and copied per measured run — byte-identical input
eng = CrawlEngine(
    spark, base + "/store",
    web0, spark.read.parquet(base + "/images.parquet"),
    spark.read.parquet(base + "/robots.parquet"), make_cfg(n_urls),
)
eng.bootstrap(web0.select("url"))
eng.wave()
print("GEN_OK", eng.pages().count())
spark.stop()
"""

CHILD = CFG_SRC + r"""
import json, shutil, sys, tempfile, time, urllib.request
sys.path.insert(0, sys.argv[4])
from pyspark.sql import SparkSession
from navi_spark.operators.frontier import CrawlEngine
from navi_spark.sources.datagen import (
    generate_images, generate_robots, generate_web)
cpus = int(sys.argv[1]); n_urls = int(sys.argv[2]); base = sys.argv[3]
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("navi-recrawl-scaling")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "12g")
    .config("spark.driver.extraJavaOptions",
            f"-XX:+UseParallelGC -XX:ActiveProcessorCount={cpus}")
    .config("spark.shuffle.compress", "false")
    .config("spark.shuffle.spill.compress", "false")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", str(4261 + cpus))
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# in-JVM warmup: a COMPLETE small crawl + drifted recrawl (inline datagen,
# not the measured parquet) so codegen/JIT, Arrow workers, the snapshot
# machinery, the MERGE path and the PageRank loop all hit steady state at
# both levels identically
wu_n, wu_h = 30000, 60
wd_wu = tempfile.mkdtemp(prefix="navi-rcwu-", dir="/dev/shm")
wu_web = generate_web(spark, wu_n, wu_h, parts=16).cache()
wu = CrawlEngine(spark, wd_wu, wu_web,
                 generate_images(spark, wu_n, parts=16),
                 generate_robots(spark, wu_h), make_cfg(wu_n))
wu.bootstrap(wu_web.select("url"))
wu.wave()
wu.recrawl(web=generate_web(spark, wu_n, wu_h, parts=16, version=1))
wu_web.unpersist()
shutil.rmtree(wd_wu, ignore_errors=True)

# recrawl MUTATES the store (MERGE + rank overwrite + state), so each run
# gets a fresh copy of the golden store — untimed setup, same bytes
workdir = tempfile.mkdtemp(prefix="navi-recrawl-", dir="/dev/shm")
shutil.rmtree(workdir, ignore_errors=True)
shutil.copytree(base + "/store", workdir)
web_v1 = spark.read.parquet(base + "/web_v1.parquet")
images = spark.read.parquet(base + "/images.parquet")
robots = spark.read.parquet(base + "/robots.parquet")
eng = CrawlEngine(spark, workdir, web_v1, images, robots, make_cfg(n_urls))
eng.resume()
n_pages = eng.pages().count()

ui = spark.sparkContext.uiWebUrl
app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
def stages():
    return json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"))
before = {s["stageId"] for s in stages()}

t0 = time.monotonic()
stats = eng.recrawl(web=web_v1)
wall = time.monotonic() - t0

rows = []
for s in stages():
    if s["stageId"] in before:
        continue
    rows.append({
        "stageId": s["stageId"],
        "name": s["name"].split("\n")[0][:70],
        "tasks": s["numCompleteTasks"],
        "submission": s.get("firstTaskLaunchedTime") or s.get("submissionTime"),
        "completion": s.get("completionTime"),
        "run_ms": s.get("executorRunTime", 0),
        "cpu_ms": int(s.get("executorCpuTime", 0) / 1e6),
        "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
        "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        "sh_r_rows": s.get("shuffleReadRecords", 0),
        "sh_w_rows": s.get("shuffleWriteRecords", 0),
        "in_rows": s.get("inputRecords", 0),
    })
rows.sort(key=lambda x: x["stageId"])
print("RESULT " + json.dumps({
    "cpus": cpus, "n_urls": n_urls, "pages": n_pages,
    "wall_sec": round(wall, 3),
    "pages_per_sec": round(n_pages / wall, 1),
    "outcome": {
        "reloaded": stats["reloaded"], "consumed": stats["consumed"],
        "changed": stats["changed"],
        "link_structure_changed": stats["link_structure_changed"],
        "pagerank_recomputed": stats["pagerank_recomputed"],
        "statuses": stats["statuses"], "not_popped": stats["not_popped"],
    },
    "config": {"shuffle_compress": False, "local_dir_tmpfs": True,
               "partitions": 64, "driver_memory": "12g",
               "children_deferred": True, "scan_prune": True,
               "prune_keys": "xxhash64"},
    "stages": rows,
}))
shutil.rmtree(workdir, ignore_errors=True)
spark.stop()
"""


def run_at(cpus: int, n_urls: int) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", CHILD, str(cpus), str(n_urls),
         base_path(n_urls), REPO],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main_gen() -> None:
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    base = base_path(n_urls)
    if os.path.exists(base + "/store"):
        print(f"exists: {base}")
        return
    out = subprocess.run(
        [sys.executable, "-c", GEN_CHILD, str(n_urls), base, REPO],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    if "GEN_OK" not in out.stdout:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    print(f"wrote {base}")


def do_pair(n_urls: int, n: int, window: dict | None = None) -> None:
    outcomes = []
    with open(RUNS, "a") as f:
        for cpus in (n, 4 * n):
            r = run_at(cpus, n_urls)
            if window:
                r["host_window"] = window
            f.write(json.dumps(r) + "\n")
            f.flush()
            outcomes.append(r["outcome"])
            print({"cpus": cpus, "wall": r["wall_sec"],
                   "pages": r["pages"],
                   "consumed": r["outcome"]["consumed"]}, flush=True)
    # parallelism-independence: the recrawl must classify and consume
    # identically at both levels or the comparison is meaningless
    assert outcomes[0] == outcomes[1], f"outcome mismatch: {outcomes}"


def main_pair() -> None:
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.makedirs(os.path.dirname(RUNS), exist_ok=True)
    do_pair(n_urls, n)


def main_hunt() -> None:
    """Probe-gated sampling (scripts/submit_scaling.py hunt): spend a pair
    only when the host's cpu+shuffle probes are within `factor` of their
    committed quiet floors; the admitting probe is recorded in each
    sample."""
    import time as _time

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    sys.path.insert(0, REPO)
    import bench
    from submit_scaling import probe_window

    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    max_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    factor = float(sys.argv[5]) if len(sys.argv) > 5 else 1.6
    os.makedirs(os.path.dirname(RUNS), exist_ok=True)
    done = 0
    while done < max_pairs:
        w = probe_window()
        quiet = (
            min(w["cpu"]) <= factor * bench.CALIBRATION_REF_SEC
            and min(w["shuffle"]) <= factor * bench.SHUFFLE_CALIBRATION_REF_SEC
        )
        print(json.dumps({"probe": w, "quiet": quiet}), flush=True)
        if quiet:
            do_pair(n_urls, n, window=w)
            done += 1
        else:
            _time.sleep(240)


def _ts(s: str | None) -> float | None:
    if not s:
        return None
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()


def _stage_wall(s: dict) -> float:
    a, b = _ts(s.get("submission")), _ts(s.get("completion"))
    return round(b - a, 3) if a and b else 0.0


def main_report() -> None:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    allrows = [json.loads(ln) for ln in open(RUNS)]
    # one efficiency row PER universe size: recrawl is a ~48-stage chain
    # of small stages, so its scaling efficiency RISES with per-stage data
    # — the measured trend IS the design-point amortization argument
    sizes = sorted({r["n_urls"] for r in allrows})
    per_size = []
    for sz in sizes:
        rows = [r for r in allrows if r["n_urls"] == sz]
        lo = [r for r in rows if r["cpus"] == n]
        hi = [r for r in rows if r["cpus"] == 4 * n]
        if not lo or not hi:
            continue
        blo = min(lo, key=lambda r: r["wall_sec"])
        bhi = min(hi, key=lambda r: r["wall_sec"])
        per_size.append({
            "n_urls": sz, "pages": blo["pages"], "blo": blo, "bhi": bhi,
            "lo_walls": sorted(r["wall_sec"] for r in lo),
            "hi_walls": sorted(r["wall_sec"] for r in hi),
            "speedup": round(blo["wall_sec"] / bhi["wall_sec"], 3),
            "efficiency": round(blo["wall_sec"] / bhi["wall_sec"] / 4.0, 3),
        })
    head = per_size[-1]  # largest universe = the number of record
    blo, bhi, eff = head["blo"], head["bhi"], head["efficiency"]
    # contention attribution: same logical work, so any growth in total
    # executor CPU between levels is pure concurrency cost (memory-bus /
    # GC contention on this single-socket box); 4 / inflation is then the
    # speedup CEILING the host permits, independent of plan quality
    cpu_lo = sum(s["cpu_ms"] for s in blo["stages"]) / 1000
    cpu_hi = sum(s["cpu_ms"] for s in bhi["stages"]) / 1000
    inflation = cpu_hi / cpu_lo
    ceiling = 4.0 / inflation
    ceiling_frac = head["speedup"] / ceiling
    sw_lo = sum(_stage_wall(s) for s in blo["stages"])
    sw_hi = sum(_stage_wall(s) for s in bhi["stages"])
    out = {
        "n_urls": head["n_urls"],
        "pages": head["pages"],
        f"local[{n}]_wall": blo["wall_sec"],
        f"local[{4*n}]_wall": bhi["wall_sec"],
        f"local[{n}]_pages_per_sec": blo["pages_per_sec"],
        f"local[{4*n}]_pages_per_sec": bhi["pages_per_sec"],
        "speedup": head["speedup"],
        "efficiency": eff,
        "per_size": [{k: p[k] for k in
                      ("n_urls", "pages", "speedup", "efficiency",
                       "lo_walls", "hi_walls")} for p in per_size],
    }
    print(json.dumps(out, indent=2))
    size_lines = [
        "| n_urls | pages reloaded | local[%d] wall | local[%d] wall | "
        "speedup | efficiency |" % (n, 4 * n),
        "|---|---|---|---|---|---|"]
    for p in per_size:
        size_lines.append(
            f"| {p['n_urls']:,} | {p['pages']:,} | "
            f"{p['blo']['wall_sec']} | {p['bhi']['wall_sec']} | "
            f"{p['speedup']}× | **{p['efficiency']}** |")
    size_table = "\n".join(size_lines)

    def table(r):
        lines = ["| stage | tasks | wall s | cpu s | sh W MB | name |",
                 "|---|---|---|---|---|---|"]
        tot = sorted(r["stages"], key=lambda s: -s["run_ms"])[:10]
        for s in sorted(tot, key=lambda s: s["stageId"]):
            lines.append(
                f"| {s['stageId']} | {s['tasks']} | {_stage_wall(s)} | "
                f"{round(s['cpu_ms'] / 1000, 1)} | {s['sh_w_mb']} | "
                f"{s['name']} |")
        return "\n".join(lines)

    o = blo["outcome"]
    path = os.path.join(REPO, "BENCH", "RECRAWL_SCALING.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH/RECRAWL_SCALING.md — composed recrawl scaling (CrawlEngine.recrawl)

The freshness pass (C21) measured end-to-end at two parallelism levels:
rank-desc reload of a crawled store (built once by a single wave, copied
per run — recrawl mutates it), robots gate, conditional-GET
classification against a DRIFTED web (ETag/Last-Modified validators,
per-host `honors_304`), per-host domain-cap boundary, global budget
prefix, MERGE of changed pages, and the conditional 10-iteration
PageRank recompute (link structures changed). Fixed 64 shuffle
partitions + 64 host partitions at both levels; taskset-bound fresh JVM
per run, complete small crawl+recrawl in-JVM warmup, interleaved
samples, min per level (protocol of BENCH/BASELINE.md).

## Efficiency vs per-stage data (the amortization trend, measured)

Recrawl is a ~48-stage chain with NO dominant stage (attribution below):
classification, boundary windows, MERGE and ten PageRank iterations each
contribute 1-6 s stages, and the sum of stage walls accounts for the
whole job wall (local[{n}]: {round(sw_lo,1)} of {blo['wall_sec']} s,
local[{4*n}]: {round(sw_hi,1)} of {bhi['wall_sec']} s — driver gaps are
negligible, the chain is the job):

{size_table}

Number of record = the largest universe: **{head['n_urls']:,} URLs /
{head['pages']:,} reloaded pages, efficiency {eff}** (walls: local[{n}]
{head['lo_walls']}, local[{4*n}] {head['hi_walls']}).

## Where the efficiency goes (attributed, not waved at)

The limiter is NOT fixed driver cost and NOT a skewed stage — it is
measured CPU inflation under concurrency on this single-socket host.
Total executor CPU for the IDENTICAL logical job (outcome bit-identical,
asserted): local[{n}] {round(cpu_lo,1)} cpu-s → local[{4*n}]
{round(cpu_hi,1)} cpu-s = **{round(inflation,2)}× inflation**. The same
rows shuffled and the same pages classified cost {round(inflation,2)}×
more CPU when {4*n} tasks share one memory bus — the mechanism
BENCH/STAGE_SCALING.md isolated for the wave (shuffle-machinery
cache/membw contention; compression already off, tmpfs local dirs), and
scripts/membw_probe.py measured as a 0.74 bandwidth ceiling for this
box. That inflation alone caps the achievable speedup at
4 / {round(inflation,2)} = **{round(ceiling,2)}×**; the measured
{head['speedup']}× is **{round(100*ceiling_frac)}% of the
contention-corrected ceiling**. Stage-level evidence: the PageRank
iterations (109.6 MB shuffle each) run ~6.5 cpu-s at local[{n}] and
~14 cpu-s at local[{4*n}] for identical input — pure contention, no
extra work. On a real 4×-executor cluster each executor brings its own
memory bus, so this term vanishes by construction; what remains is the
chain's per-stage amortization, and the trend across universe sizes
(efficiency rising with per-stage data, table above) is measured at
1/10^4 of the design point's per-stage rows.

| level | wall s | pages/s | samples (all walls) |
|---|---|---|---|
| local[{n}] | {blo['wall_sec']} | {blo['pages_per_sec']} | {head['lo_walls']} |
| local[{4*n}] | {bhi['wall_sec']} | {bhi['pages_per_sec']} | {head['hi_walls']} |

Recrawl outcome at the record size (bit-identical at both levels,
asserted per pair): reloaded {o['reloaded']:,}, consumed
{o['consumed']:,}, changed {o['changed']:,}, link-structure changed
{o['link_structure_changed']:,}, PageRank recomputed:
{o['pagerank_recomputed']}; pop statuses {json.dumps(o['statuses'])},
not popped {o['not_popped']:,}.

## Round-5 shuffle diet: no exchange proportional to |web| × payload

The classification join originally exchanged the FULL drifted web with
payloads (children arrays) to match 438k stored pages against 8M web
rows. Round 5 applied the wave's C13 store-pruning discipline to the
freshness pass (frontier.py recrawl): children arrays are deferred to a
broadcast-semi-pruned fetch over the budget-bounded consumed-changed
set, and the web/image scans are pruned map-side by a broadcast
semi-join on the reloaded key set — 8-byte xxhash64 keys, not strings
(~10× smaller build; a hash-collision false positive passes the prune
and dies in the exact LEFT join, so the prune is lossless by
construction). Above RECRAWL_BROADCAST_MAX the joins degrade to plain
co-partitioned shuffles of the light columns; both physical forms are
bit-identical (tests/test_frontier.py::test_recrawl_scan_prune_gate_parity).

Measured at the 8M universe (archives: recrawl_scaling_prediet.jsonl,
recrawl_scaling_strkeys.jsonl; outcome histogram identical across all
three configs):

| config | shuffle write | shuffle read | local[4] cpu-s | min walls (4/16) |
|---|---|---|---|---|
| pre-diet (children ride the join) | 5,788 MB | 7,768 MB | 132 | 59.8 / 30.7 |
| diet + string-key prune | 2,200 MB | 4,179 MB | 125 | 60.2 / 32.8 |
| diet + xxhash64-key prune (shipping) | 2,200 MB | 4,179 MB | 122 | 60.0 / 31.9 |

The web-side exchanges collapsed from 2,430 + 824 MB to 43 + 40 MB
(map-side-pruned scans). Wall is UNCHANGED within noise on this host —
shuffle compression is off and the local dirs are tmpfs, so local byte
movement is nearly free — which is exactly the point: on a real
cluster the same 3.6 GB of writes crosses the network (~8 KB per
reloaded page of pure web payload), where it would be the scaling
bottleneck this sandbox cannot show. The remaining shuffle volume is
the PageRank recompute (10 × 109.6 MB writes + 10 × 327 MB reads),
which is rank-loop-intrinsic, not fetch overhead.

## Per-stage attribution — best local[{n}] run

{table(blo)}

## Per-stage attribution — best local[{4*n}] run

{table(bhi)}

Generated by:
  python scripts/recrawl_scaling.py gen <n_urls>   # per universe size
  python scripts/recrawl_scaling.py hunt <n_urls> {n} S
  python scripts/recrawl_scaling.py report {n}
""")
    print(f"wrote {path}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "pair"
    if mode == "gen":
        main_gen()
    elif mode == "pair":
        main_pair()
    elif mode == "hunt":
        main_hunt()
    elif mode == "report":
        main_report()
    else:
        raise SystemExit(f"unknown mode {mode}")
