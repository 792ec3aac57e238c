"""Scaling-efficiency evidence for the north rule (BASELINE.md protocol).

No real cluster exists in this sandbox, so the rule's two-cluster-size
criterion is evidenced by running the IDENTICAL job at two parallelism
levels (local[N] and local[4N]) on the same input and reporting throughput
at both plus efficiency = (T_N_wall / T_4N_wall) / 4.

This host is a shared-hypervisor VM with heavy wall-clock noise (identical
runs vary 9.7s ↔ 20s). Protocol: fresh JVM per run, in-JVM warmup,
INTERLEAVED N/4N samples, MIN per level across all samples, and a
host-calibration ceiling measured with a plain multiprocessing CPU burn
(4→16 procs sustain 3.92× on this box — near-ideal — so minima are
meaningful).

Two measured jobs:
  full    the complete wave-scheduling pipeline (python kernel + shuffles:
          dedup agg, seen anti-join, politeness windows, budget top-k)
  kernel  the map-only per-URL kernel (canonicalize + hash + partial
          distinct) — no shuffle; isolates compute scaling

Usage:
  python scripts/bench_scaling.py pair [n_urls] [N]    # run 1 interleaved
        sample of all 4 (job × level) points, append to BENCH/scaling.jsonl
  python scripts/bench_scaling.py report [N]           # aggregate minima →
        BENCH/BASELINE.md
  python scripts/bench_scaling.py executors [n] [cores]  # multi-JVM fleet
        (documented pathological on this host: co-resident JVMs interfere)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BENCH", "scaling.jsonl")

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[4])
import pyspark.sql.functions as F
from bench import build_session, frontier_throughput
from navi_spark.functions.urlnorm import normalize_url_udf
from navi_spark.sources.datagen import generate_urls
cpus = int(sys.argv[1]); n_urls = int(sys.argv[2]); job = sys.argv[3]
spark = build_session(cpus)
spark.sparkContext.setLogLevel("ERROR")

def kernel(m):
    raw = generate_urls(spark, m, n_hosts=max(m // 500, 10), parts=64,
                        dirty=True, with_children=False).select("url")
    k = raw.select(normalize_url_udf("url").alias("u"))
    t0 = time.monotonic()
    k.agg(F.approx_count_distinct("u"),
          F.sum(F.pmod(F.xxhash64("u"), F.lit(1 << 20)))).collect()
    w = time.monotonic() - t0
    return {"n_urls": m, "wall_sec": round(w, 3),
            "urls_per_sec": round(m / w, 1)}

# two-step warmup (50k then 1M) drives codegen/JIT + python-worker forks
# to steady state BEFORE the timed run at both parallelism levels equally —
# fresh-JVM cold walls are 1.7-2x steady state on this host and the cold
# fraction shrinks with cores, which would bias efficiency downward
if job == "kernel":
    kernel(50000)
    kernel(1000000)
    r = kernel(n_urls)
else:
    frontier_throughput(spark, 50000, 100)
    frontier_throughput(spark, 1000000, 2000)
    r = frontier_throughput(spark, n_urls, max(n_urls // 500, 10))
print("RESULT " + json.dumps(r))
spark.stop()
"""


def run_at(cpus: int, n_urls: int, job: str) -> dict:
    # HARD-bind the whole process tree (JVM + python workers) to exactly
    # `cpus` CPUs: Spark's local[N] caps task slots only — python workers
    # would otherwise borrow idle host cores and inflate the small-N
    # baseline, under-reporting scaling.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", CHILD, str(cpus), str(n_urls), job, REPO],
        capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main_pair() -> None:
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.makedirs(os.path.dirname(RUNS), exist_ok=True)
    with open(RUNS, "a") as f:
        for job in ("kernel", "full"):
            for cpus in (n, 4 * n):
                r = run_at(cpus, n_urls, job)
                # self-describing config tag (ADVICE r04): bench.build_session
                # currently ships shuffle compression OFF on tmpfs dirs
                rec = {"job": job, "cpus": cpus,
                       "config": {"shuffle_compress": False,
                                  "local_dir_tmpfs": True,
                                  # round-5 fix: samples with this tag use
                                  # the decorrelated seen hash + grid-ceil
                                  # head threshold (bench.py); older rows
                                  # without it predate the fix
                                  "frontier_proxy_fix": True}, **r}
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(rec, flush=True)


# First hand-maintained section of BENCH/BASELINE.md; report mode regenerates
# only the text above this heading and keeps everything from it onward.
PRESERVE_MARKER = "## All-family scaling scoreboard"


def main_report() -> None:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rows = [json.loads(ln) for ln in open(RUNS)]
    out = {}
    for job in ("kernel", "full"):
        lo = [r for r in rows if r["job"] == job and r["cpus"] == n]
        hi = [r for r in rows if r["job"] == job and r["cpus"] == 4 * n]
        if not lo or not hi:
            continue
        blo = min(lo, key=lambda r: r["wall_sec"])
        bhi = min(hi, key=lambda r: r["wall_sec"])
        out[job] = {
            "n_urls": blo["n_urls"],
            f"local[{n}]_wall": blo["wall_sec"],
            f"local[{4*n}]_wall": bhi["wall_sec"],
            f"local[{n}]_urls_per_sec": blo["urls_per_sec"],
            f"local[{4*n}]_urls_per_sec": bhi["urls_per_sec"],
            "samples": [len(lo), len(hi)],
            "speedup": round(blo["wall_sec"] / bhi["wall_sec"], 3),
            "efficiency": round(blo["wall_sec"] / bhi["wall_sec"] / 4.0, 3),
            f"all_walls_local[{n}]": sorted(r["wall_sec"] for r in lo),
            f"all_walls_local[{4*n}]": sorted(r["wall_sec"] for r in hi),
        }
    print(json.dumps(out, indent=2))
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    k, fu = out.get("kernel", {}), out.get("full", {})
    # BASELINE.md carries hand-maintained sections beyond this template
    # (the all-family scoreboard + per-round addenda). Report mode rewrites
    # only the generated head; everything from PRESERVE_MARKER on survives.
    preserved = ""
    try:
        old = open(path).read()
        idx = old.find(PRESERVE_MARKER)
        if idx >= 0:
            preserved = old[idx:]
    except FileNotFoundError:
        pass
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE.md — frontier throughput + scaling efficiency

North metric (BASELINE.json): URLs scheduled+deduped/sec with ≥0.8 scaling
efficiency between N and 4N executors. No real cluster exists in this
sandbox; per BASELINE.md the criterion is evidenced by the IDENTICAL job
(fixed 64 input + 64 shuffle partitions, identical configs) at local[{n}]
vs local[{4*n}], fresh JVM per run with in-JVM warmup, interleaved samples,
min per level (see measurement hygiene below).

## Jobs

* **kernel** — the per-URL map kernel: dirty-URL datagen → vectorized
  canonicalization (C3, Arrow UDF) → xxhash64 → map-side distinct sketch.
  No shuffle: isolates the compute that dominates at 10^10 scale.
* **full** — the complete wave-scheduling core: kernel + hash-agg dedup
  (C15) + anti-join vs a 30%-density seen table (C9) + hot-host-only
  politeness (C8: one tiny per-host count agg finds the over-cap hosts;
  only their rows take the two-level salted window — the cold tail passes
  through untouched) + threshold-bounded global budget top-k (C7, head
  bound derived from the same count agg: |sel| = Σ min(n_h, cap), no
  second materialization).

## Results (min over interleaved samples)

| job | local[{n}] wall | local[{4*n}] wall | local[{n}] URLs/s | local[{4*n}] URLs/s | speedup | efficiency |
|---|---|---|---|---|---|---|
| kernel | {k.get(f'local[{n}]_wall','—')} | {k.get(f'local[{4*n}]_wall','—')} | {k.get(f'local[{n}]_urls_per_sec','—')} | {k.get(f'local[{4*n}]_urls_per_sec','—')} | {k.get('speedup','—')}× | **{k.get('efficiency','—')}** |
| full | {fu.get(f'local[{n}]_wall','—')} | {fu.get(f'local[{4*n}]_wall','—')} | {fu.get(f'local[{n}]_urls_per_sec','—')} | {fu.get(f'local[{4*n}]_urls_per_sec','—')} | {fu.get('speedup','—')}× | **{fu.get('efficiency','—')}** |

All walls — kernel local[{n}]: {k.get(f'all_walls_local[{n}]','—')},
local[{4*n}]: {k.get(f'all_walls_local[{4*n}]','—')};
full local[{n}]: {fu.get(f'all_walls_local[{n}]','—')},
local[{4*n}]: {fu.get(f'all_walls_local[{4*n}]','—')}.

""")
        f.write(preserved if preserved else f"""## Measurement hygiene (all items measured; see commit history)

* **Shared-hypervisor noise**: identical Spark runs vary up to 2× wall
  (9.7s ↔ 20.3s); hence interleaved sampling + min. Host calibration: a
  plain `multiprocessing` CPU burn sustains **3.92×** going 4→16 procs
  (near-ideal), so cores are genuinely available and minima are meaningful.
  8→32 procs sustains only ~1.9× — the reason N=4 (N=8 would measure the
  hypervisor, not the job).
* Shuffle dirs on tmpfs (`/dev/shm`): the overlay disk's writeback stalls
  added ±60s to otherwise-4s runs.
* 12g heap + ParallelGC: measured ~40% faster than 24-48g G1 on this
  shuffle profile.
* Co-resident multi-JVM fleets (the `executors` mode) interfere ~20× on
  this VM even with `-XX:ActiveProcessorCount` pinning — a host artifact
  (plain python fleets scale 3.9×); on a real cluster executors live on
  separate machines. Single-JVM thread scaling is therefore the honest
  sandbox proxy.
* Driver-merge top-k was replaced by threshold-bounded selection after
  profiling showed `orderBy().limit(100k)` serializing a flat ~20s on the
  driver regardless of cores (the kind of scale bug the 10^10 design must
  not have).

Generated by:
  python scripts/bench_scaling.py pair 8000000 {n}   (×S samples)
  python scripts/bench_scaling.py report {n}
""")
    print(f"wrote {path}")


# ---------------------------------------------------------------------------
# Multi-executor analog (separate JVMs, host-sharded frontier). Kept for
# completeness; measured pathological on this shared VM — see BASELINE.md.
# ---------------------------------------------------------------------------

SHARD_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["NAVI_PIN_CORES"] = "1"
from bench import build_session, frontier_throughput
shard, cores, n_shard = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = build_session(cores)
spark.sparkContext.setLogLevel("ERROR")
frontier_throughput(spark, 50000, 100, parts=16)
r = frontier_throughput(spark, n_shard, max(n_shard // 500, 10), parts=16)
print("RESULT " + json.dumps(r))
spark.stop()
"""


def run_fleet(k: int, cores_each: int, n_total: int) -> dict:
    import time as _t

    code = SHARD_CHILD.format(repo=REPO)
    n_shard = n_total // k
    t0 = _t.monotonic()
    # DISJOINT taskset ranges per executor JVM — the faithful simulation of
    # executors on separate machines (shared-roaming JVMs interfere ~20×
    # on this VM; disjoint pinning removes the cross-JVM contention)
    procs = [
        subprocess.Popen(
            ["taskset", "-c",
             f"{i * cores_each}-{(i + 1) * cores_each - 1}",
             sys.executable, "-c", code, str(i), str(cores_each), str(n_shard)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=REPO,
        )
        for i in range(k)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    wall = _t.monotonic() - t0
    shard_walls = []
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RESULT "):
                shard_walls.append(json.loads(line[7:])["wall_sec"])
    if len(shard_walls) != k:
        raise RuntimeError(f"fleet failed: {outs}")
    return {
        "k": k, "cores_each": cores_each, "n_total": n_total,
        "shard_walls": shard_walls, "wall_sec": max(shard_walls),
        "urls_per_sec": round(n_total / max(shard_walls), 1),
        "fleet_wall_incl_startup": round(wall, 1),
    }


def main_executors() -> None:
    n_total = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    lo = run_fleet(1, cores, n_total)
    hi = run_fleet(4, cores, n_total)
    report = {
        "mode": "multi-executor (separate JVMs, host-sharded frontier)",
        "N_executors=1": lo, "4N_executors=4": hi,
        "speedup": round(lo["wall_sec"] / hi["wall_sec"], 3),
        "scaling_efficiency": round(lo["wall_sec"] / hi["wall_sec"] / 4.0, 3),
    }
    print(json.dumps(report, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING_EXECUTORS.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "pair"
    if mode == "executors":
        main_executors()
    elif mode == "report":
        main_report()
    else:
        main_pair()
