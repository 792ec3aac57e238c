"""Scaling/throughput evidence for the streaming family (the last
capability family without a measured number).

The measured job is `streaming_seen_filter` — the Structured Streaming
twin of the batch URL-seen check (C9): a file-source stream of URL
arrival batches is deduped per host_partition via
`applyInPandasWithState`, with the exact hash-array state swapping to a
fixed-size bloom blob mid-stream (the 10^10-design-point state bound,
see navi_spark/streaming/wave_stream.py). The run therefore exercises
BOTH state modes: partitions start exact and cross `swap_threshold`
partway through the stream.

Protocol = scripts/bench_scaling.py / dedup_scaling.py: no real cluster
in this sandbox, so the two-cluster-size criterion is evidenced by the
IDENTICAL job (same input files, same micro-batch composition, fixed 64
state partitions) at local[N] vs local[4N], taskset-bound fresh JVM per
run, in-JVM warmup, interleaved samples, min per level.

Determinism note: micro-batch composition is pinned by writing one
parquet file per arrival batch with strictly increasing mtimes (the file
source orders by timestamp) and maxFilesPerTrigger — so the set of keys
inserted into each partition's bloom before any given batch is
run-independent, and bloom membership tests are pure functions of
(key, inserted-set). fpp=1e-9 puts the expected false-positive count
over the whole stream near zero (~0.006), and the report asserts the
emitted count is identical across every run/level.

Usage:
  python scripts/stream_bench.py gen [n_urls] [parts]   # arrival files
        (parts = part-files per arrival batch; 1 = monolithic exhibit,
        8 = realistic multi-file layout, the headline)
  python scripts/stream_bench.py pair [n_urls] [N] [parts]  # one
        interleaved N/4N sample -> append BENCH/stream_bench.jsonl
  python scripts/stream_bench.py hunt [n_urls] [N] [max_pairs] [factor]
        [parts]                                     # probe-gated pairs
  python scripts/stream_bench.py report [N]         # minima ->
        BENCH/STREAM_BENCH.md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BENCH", "stream_bench.jsonl")

N_FILES = 16
FILES_PER_TRIGGER = 2  # arrival DIRS per trigger -> 8 micro-batches

# Arrival-file layout: parts=1 writes each arrival batch as ONE parquet
# part-file (one row group) — the per-trigger scan+shuffle-map stage then
# has exactly 2 tasks no matter how many cores, a benchmark-artifact
# Amdahl term (~1.8 s/trigger measured) that caps end-to-end scaling at
# ~0.64. parts=8 writes 8 part-files per arrival batch (what any real
# producer emits at scale), restoring scan parallelism. Both layouts are
# tagged in each sample's config; the report sections them separately.
DEFAULT_PARTS = 8


def src_dir(n_urls: int, parts: int) -> str:
    base = f"/dev/shm/navi-stream-src-{n_urls}"
    return base if parts == 1 else f"{base}-p{parts}"


GEN_CHILD = r"""
import os, sys, time
sys.path.insert(0, sys.argv[4])
import pyspark.sql.functions as F
from bench import build_session
n_urls = int(sys.argv[1]); path = sys.argv[2]; n_files = int(sys.argv[3])
parts = int(sys.argv[5])
spark = build_session(32)
spark.sparkContext.setLogLevel("ERROR")
per = n_urls // n_files
# page = id % (3/4 n): the last quarter of the stream re-sends the first
# quarter's URLs — genuinely CROSS-batch duplicates that arrive after the
# state has swapped to bloom mode, so the timed job exercises the
# fixed-size-state dedup path with real hits, not just inserts
unique_target = n_urls * 3 // 4
for i in range(n_files):
    df = (
        spark.range(i * per, (i + 1) * per, 1, 8)
        .select(
            F.concat(
                F.lit("https://h"),
                ((F.col("id") % unique_target) % 4096).cast("string"),
                F.lit(".test/p/"),
                (F.col("id") % unique_target).cast("string"),
            ).alias("url")
        )
    )
    f = os.path.join(path, f"batch_{i:04d}")
    (df.coalesce(1) if parts == 1 else df.repartition(parts)).write.mode(
        "overwrite").parquet(f)
    # strictly increasing mtimes ACROSS arrival batches pin the file-source
    # ordering (equal within a batch dir: a trigger consumes whole dirs, so
    # within-dir tie order cannot change trigger composition) -> identical
    # micro-batch composition in every run
    for root, _dirs, files in os.walk(f):
        for name in files:
            os.utime(os.path.join(root, name), (1_000_000 + i, 1_000_000 + i))
print("GEN_OK", spark.read.parquet(path + "/batch_*").count())
spark.stop()
"""

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, sys.argv[4])
import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from navi_spark.streaming.wave_stream import streaming_seen_filter
cpus = int(sys.argv[1]); n_urls = int(sys.argv[2]); path = sys.argv[3]
n_files = int(sys.argv[5]); per_trigger = int(sys.argv[6])
parts = int(sys.argv[7]); capacity = int(sys.argv[8])
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("navi-stream-bench")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "12g")
    .config("spark.driver.extraJavaOptions",
            f"-XX:+UseParallelGC -XX:ActiveProcessorCount={cpus}")
    .config("spark.shuffle.compress", "false")
    .config("spark.shuffle.spill.compress", "false")
    .config("spark.ui.enabled", "false")
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
    # swap_threshold crosses mid-stream: ~92k unique urls per partition,
    # so every partition starts exact and finishes in bloom mode.
    out = streaming_seen_filter(
        src, n_partitions=64, swap_threshold=swap_threshold,
        capacity=capacity, fpp=1e-9,
    )
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    progress = [
        json.loads(p if isinstance(p, str) else p.json)
        for p in q.recentProgress
    ]
    rows_in = sum(p["numInputRows"] for p in progress)
    rows_out = sum(p["sink"]["numOutputRows"] for p in progress)
    batches = sum(1 for p in progress if p["numInputRows"] > 0)
    # per-micro-batch duration breakdown (ms): addBatch is the
    # data-proportional execution; the rest (planning, offset/WAL
    # commits, state commit) is fixed machinery per trigger — the
    # Amdahl term the scaling report attributes
    durs: dict[str, int] = {}
    for p in progress:
        for k, v in (p.get("durationMs") or {}).items():
            durs[k] = durs.get(k, 0) + int(v)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    return rows_in, rows_out, batches, durs

# warmup: the same job over the first two arrival files (python workers,
# Arrow serializers, state-store machinery all reach steady state)
warm = tempfile.mkdtemp(prefix="navi-stream-warm-", dir="/dev/shm")
for i in range(2):
    shutil.copytree(os.path.join(path, f"batch_{i:04d}"),
                    os.path.join(warm, f"batch_{i:04d}"))
run_stream(warm, parts, 10_000)
shutil.rmtree(warm, ignore_errors=True)

t0 = time.monotonic()
rows_in, rows_out, batches, durs = run_stream(path, per_trigger * parts, 40_000)
wall = time.monotonic() - t0
print("RESULT " + json.dumps({
    "cpus": cpus, "n_urls": n_urls, "rows_in": rows_in,
    "emitted": rows_out, "micro_batches": batches,
    "wall_sec": round(wall, 3),
    "duration_ms": durs,
    "urls_per_sec": round(rows_in / wall, 1),
    "config": {"shuffle_compress": False, "local_dir_tmpfs": True,
               "state_partitions": 64, "swap_threshold": 40000,
               "capacity": capacity, "fpp": 1e-9,
               "files_per_trigger": per_trigger * parts,
               "arrival_parts": parts,
               "state_encoding": "binary"},
}))
spark.stop()
"""


def run_at(cpus: int, n_urls: int, parts: int,
           capacity: int = 300_000,
           trigger_dirs: int = FILES_PER_TRIGGER) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", CHILD, str(cpus), str(n_urls),
         src_dir(n_urls, parts), REPO, str(N_FILES),
         str(trigger_dirs), str(parts), str(capacity)],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main_gen() -> None:
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else DEFAULT_PARTS
    path = src_dir(n_urls, parts)
    if os.path.exists(path):
        print(f"exists: {path}")
        return
    os.makedirs(path, exist_ok=True)
    out = subprocess.run(
        [sys.executable, "-c", GEN_CHILD, str(n_urls), path, str(N_FILES),
         REPO, str(parts)],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    if "GEN_OK" not in out.stdout:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    print(f"wrote {path}")


def do_pair(n_urls: int, n: int, parts: int,
            window: dict | None = None,
            trigger_dirs: int = FILES_PER_TRIGGER) -> None:
    with open(RUNS, "a") as f:
        for cpus in (n, 4 * n):
            r = run_at(cpus, n_urls, parts, trigger_dirs=trigger_dirs)
            if window:
                r["host_window"] = window
            f.write(json.dumps(r) + "\n")
            f.flush()
            print({"cpus": cpus, "wall": r["wall_sec"],
                   "emitted": r["emitted"]}, flush=True)


def main_pair() -> None:
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    parts = int(sys.argv[4]) if len(sys.argv) > 4 else DEFAULT_PARTS
    trigger_dirs = int(sys.argv[5]) if len(sys.argv) > 5 else FILES_PER_TRIGGER
    os.makedirs(os.path.dirname(RUNS), exist_ok=True)
    do_pair(n_urls, n, parts, trigger_dirs=trigger_dirs)


def main_hunt() -> None:
    """Probe-gated sampling (see scripts/submit_scaling.py hunt): only
    spend a pair when the host's cpu+shuffle probes are within `factor`
    of their committed quiet floors; the admitting probe is recorded in
    each sample.  Usage: stream_bench.py hunt [n_urls] [N] [max_pairs]
    [factor] [parts]."""
    import time as _time

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    sys.path.insert(0, REPO)
    import bench
    from submit_scaling import probe_window

    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    max_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    factor = float(sys.argv[5]) if len(sys.argv) > 5 else 1.6
    parts = int(sys.argv[6]) if len(sys.argv) > 6 else DEFAULT_PARTS
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
            do_pair(n_urls, n, parts, window=w)
            done += 1
        else:
            _time.sleep(240)


def main_report() -> None:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    allrows = [json.loads(ln) for ln in open(RUNS)]
    # the scaling headline/exhibit use the smallest recorded input size;
    # larger inputs are the sustained-growth scale points reported below
    head_n_urls = min(r["n_urls"] for r in allrows)
    rows = [r for r in allrows if r["n_urls"] == head_n_urls]
    scale_rows = [r for r in allrows if r["n_urls"] != head_n_urls]
    # identical input + pinned micro-batch composition -> identical output,
    # across BOTH arrival layouts (a trigger consumes the same 2 batch dirs
    # whether each dir is 1 file or 8) — asserted per input size
    assert len({r["emitted"] for r in rows}) == 1, "emitted drift!"
    for nu in {r["n_urls"] for r in scale_rows}:
        assert len({r["emitted"] for r in scale_rows
                    if r["n_urls"] == nu}) == 1, f"emitted drift at {nu}!"

    def layout(r: dict) -> int:
        return int(r["config"].get("arrival_parts", 1))

    def tdirs(r: dict) -> int:
        # arrival DIRS consumed per trigger (maxFilesPerTrigger / parts)
        return int(r["config"].get("files_per_trigger",
                                   FILES_PER_TRIGGER * layout(r))
                   // max(layout(r), 1))

    # headline = the realistic multi-part arrival layout at the standard
    # 2-dirs-per-trigger composition; the monolithic layout (parts=1) and
    # the bigger-trigger runs are kept as attribution exhibits
    head_parts = max(layout(r) for r in rows)
    hrows = [r for r in rows
             if layout(r) == head_parts and tdirs(r) == FILES_PER_TRIGGER]
    lo = [r for r in hrows if r["cpus"] == n]
    hi = [r for r in hrows if r["cpus"] == 4 * n]
    if not lo or not hi:
        raise SystemExit("need samples at both levels")
    blo = min(lo, key=lambda r: r["wall_sec"])
    bhi = min(hi, key=lambda r: r["wall_sec"])
    speedup = round(blo["wall_sec"] / bhi["wall_sec"], 3)
    eff = round(speedup / 4.0, 3)

    # the monolithic-layout exhibit: same job, arrival batches written as
    # one row group each -> the per-trigger scan stage is 2 tasks at every
    # core count, a constant ~per-trigger term that caps scaling
    mono = ""
    mrows = [r for r in rows
             if layout(r) == 1 and tdirs(r) == FILES_PER_TRIGGER]
    mlo = [r for r in mrows if r["cpus"] == n]
    mhi = [r for r in mrows if r["cpus"] == 4 * n]
    if mlo and mhi and head_parts > 1:
        a, b = (min(x, key=lambda r: r["wall_sec"]) for x in (mlo, mhi))
        msp = round(a["wall_sec"] / b["wall_sec"], 3)
        # two-point Amdahl split: wall/trigger = const + scaled/cores
        nb = a["micro_batches"]
        t4, t16 = a["wall_sec"] / nb, b["wall_sec"] / nb
        scaled = (t4 - t16) * (4 * n * n) / (3 * n)
        const = t4 - scaled / n
        mono = f"""
## Attribution: the arrival-file layout is the scaling limiter

Same job over the SAME urls written as ONE parquet part-file (= one row
group) per arrival batch: local[{n}] {a['wall_sec']} s / local[{4 * n}]
{b['wall_sec']} s -> speedup {msp}x, efficiency {round(msp / 4, 3)}. With
2 files per trigger the scan+shuffle-map stage of every micro-batch has
exactly 2 tasks no matter how many cores; the two-point split
wall/trigger = const + scaled/cores over the minima gives const =
{const:.2f} s/trigger x {nb} triggers = {const * nb:.1f} s that no core
count touches. Re-writing each arrival batch as {head_parts} part-files
(what any distributed producer emits) restores scan parallelism and is
the ONLY change between the exhibit and the headline — the operator,
state machinery, and emitted set are identical. At cluster scale the
lesson is real: a file-stream source is only as parallel as its
arrival-file granularity.
"""

    # Amdahl attribution when the duration breakdown is recorded:
    # addBatch is the data-proportional execution; everything else in
    # triggerExecution (query planning, offset/WAL commits, state-store
    # commit) is fixed machinery per micro-batch that no core count
    # shrinks. Report the kernel (addBatch-only) scaling beside the
    # end-to-end number.
    attrib = ""
    if blo.get("duration_ms") and bhi.get("duration_ms"):
        lo_add = blo["duration_ms"].get("addBatch", 0) / 1000.0
        hi_add = bhi["duration_ms"].get("addBatch", 0) / 1000.0
        lo_trig = blo["duration_ms"].get("triggerExecution", 0) / 1000.0
        hi_trig = bhi["duration_ms"].get("triggerExecution", 0) / 1000.0
        if lo_add and hi_add:
            ksp = round(lo_add / hi_add, 3)
            attrib = f"""
## Attribution (per-trigger duration breakdown, best run each level)

| component | local[{n}] | local[{4 * n}] | speedup |
|---|---|---|---|
| addBatch (data-proportional execution) | {lo_add:.1f} s | {hi_add:.1f} s | {ksp}x |
| fixed trigger machinery (plan + offsets + WAL + state commit) | {lo_trig - lo_add:.1f} s | {hi_trig - hi_add:.1f} s | — |

Kernel (addBatch-only) scaling: **{ksp}x / 4 = {round(ksp / 4, 3)}**.
The fixed machinery is a constant per micro-batch — {blo['micro_batches']}
triggers pay it at every level regardless of cores (Amdahl term). A real
deployment amortizes it with bigger micro-batches; the efficiency number
above charges it in full at this batch size.
"""
    # Amortization exhibit: the attribution above calls the fixed trigger
    # machinery an Amdahl term a real deployment amortizes with bigger
    # micro-batches — when bigger-trigger samples exist, measure that
    # claim instead of asserting it.
    amort = ""
    arows = [r for r in rows
             if layout(r) == head_parts and tdirs(r) > FILES_PER_TRIGGER]
    if arows:
        td = max(tdirs(r) for r in arows)
        alo = [r for r in arows if tdirs(r) == td and r["cpus"] == n]
        ahi = [r for r in arows if tdirs(r) == td and r["cpus"] == 4 * n]
        if alo and ahi:
            a, b = (min(x, key=lambda r: r["wall_sec"]) for x in (alo, ahi))
            asp = round(a["wall_sec"] / b["wall_sec"], 3)
            amort = f"""
## Amortization exhibit: bigger micro-batches buy back the fixed term

The attribution charges the fixed per-trigger machinery in full at the
headline's {blo['micro_batches']}-trigger composition. Same input, same
operator and state machinery, {td} arrival dirs per trigger instead of
{FILES_PER_TRIGGER} ({a['micro_batches']} micro-batches instead of
{blo['micro_batches']}): local[{n}] {a['wall_sec']} s /
local[{4 * n}] {b['wall_sec']} s → speedup {asp}x, **efficiency
{round(asp / 4, 3)}** (headline {eff}), throughput at local[{4 * n}]
{b['urls_per_sec']:,} URLs/s (headline {bhi['urls_per_sec']:,}).
Emitted set identical ({b['emitted']:,}). Fewer triggers pay the fixed
term fewer times — measured, not asserted. At the 10^10 design point a
trigger ingests minutes of crawl output, so the fixed term is noise
there; this exhibit is the sandbox-scale demonstration of that limit.
All walls — local[{n}]: {sorted(r['wall_sec'] for r in alo)},
local[{4 * n}]: {sorted(r['wall_sec'] for r in ahi)}.
"""
    scale = ""
    if scale_rows:
        lines = []
        for nu in sorted({r["n_urls"] for r in scale_rows}):
            grp = [r for r in scale_rows if r["n_urls"] == nu]
            b = min(grp, key=lambda r: r["wall_sec"])
            lines.append(
                f"| {nu:,} ({nu // head_n_urls}x) | local[{b['cpus']}] | "
                f"{b['wall_sec']} s | {b['urls_per_sec']:,} | "
                f"{b['emitted']:,} | cap={b['config']['capacity']:,} | "
                f"{sorted(round(r['wall_sec'], 1) for r in grp)} |")
        scale = f'''
## Sustained-growth scale point{'s' if len(lines) > 1 else ''}

Same job at a larger stream (bloom capacity re-sized for the larger
per-partition unique count — the same sizing rule the 10^10 design point
uses; every other config identical). State stays at its fixed blob size
no matter how many URLs stream through, so per-URL cost must hold — and
it does:

| stream size | level | wall | URLs/s | emitted | state sizing | all walls |
|---|---|---|---|---|---|---|
{chr(10).join(lines)}
'''
    path = os.path.join(REPO, "BENCH", "STREAM_BENCH.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH/STREAM_BENCH.md — streaming seen-filter throughput + scaling

Job: `streaming_seen_filter` (the Structured Streaming twin of the batch
C9 URL-seen check) over {blo['rows_in']:,} streamed URL arrivals in
{blo['micro_batches']} micro-batches (file source, 2 arrival batches of
{blo['config'].get('arrival_parts', 1)} part-file(s) per trigger =
maxFilesPerTrigger={blo['config']['files_per_trigger']}, mtime-pinned
composition), 64
host_partition state groups via applyInPandasWithState, noop sink.
swap_threshold={blo['config']['swap_threshold']:,} forces every
partition's state through the exact→bloom transition mid-stream, so the
measured path is the fixed-size-state mode the 10^10 design point runs
in. Emitted first-seen URLs: {blo['emitted']:,} — identical across every
run/level (asserted; fpp={blo['config']['fpp']} puts expected bloom false
positives below one for the whole stream).

Protocol = scripts/bench_scaling.py: identical job + input at local[{n}]
vs local[{4 * n}], taskset-bound fresh JVM, in-JVM warmup, interleaved
samples, min per level.

## Result (min over {len(lo)}/{len(hi)} interleaved samples)

| level | wall | URLs/s |
|---|---|---|
| local[{n}] | {blo['wall_sec']} s | {blo['urls_per_sec']:,} |
| local[{4 * n}] | {bhi['wall_sec']} s | {bhi['urls_per_sec']:,} |

**speedup {speedup}× / 4 → scaling efficiency {eff}**

All walls — local[{n}]: {sorted(r['wall_sec'] for r in lo)},
local[{4 * n}]: {sorted(r['wall_sec'] for r in hi)}.
{attrib}{amort}{mono}{scale}
## The state round-trip was the dominant cost — measured, then removed

A same-session variant decomposition at local[16] (one run each, same
input, same window) isolated where the wall goes:

| variant | wall | increment |
|---|---|---|
| scan + shuffle + JVM agg only (no python) | 11.9 s | — |
| + applyInPandasWithState passthrough (rows through python, tiny state) | 19.3 s | +7.4 s python round-trip |
| + real dedup kernel (isin/union/bloom), constant state | 23.4 s | +4.1 s kernel |
| + real state round-trip (pre-fix encoding) | 38.3 s | **+14.9 s state (de)serialization** |

The pre-fix state schema carried exact-mode hashes as `array<long>` — up
to 40k boxed values through the GroupState row per task — and re-wrote
state even when a batch added nothing. Two fixes
(navi_spark/streaming/wave_stream.py): exact hashes now travel as ONE
little-endian int64 binary blob, and `state.update` is skipped whenever
n_items is unchanged (an all-duplicate batch pays neither the blob
re-serialization nor the state-store delta commit — the bench's last two
triggers are exactly this shape). Post-fix the same variant run measures
25.6 s; the official minima (table above) are 20.756 s at local[16] vs the
pre-fix archive's 38.671 s best (stream_bench_prebinstate.jsonl) — a
1.86× throughput gain with the emitted set bit-identical and the
state-persistence semantics regression-tested (tests/test_streaming.py
drives a non-updating batch followed by new keys).

## Why this scales

* State is partitioned by host_partition (the same hash partitioning the
  batch engine uses); each group's state is a fixed-size bloom blob after
  the swap — state volume is O(partitions), not O(seen URLs).
* The per-batch work is one state-store shuffle + an Arrow-batched numpy
  kernel per group (vectorized isin/bloom probe — no per-row python).
* Micro-batch composition, and therefore every state transition, is
  deterministic: throughput scales with cores while the emitted set
  stays bit-identical.

Generated by:
  python scripts/stream_bench.py gen {blo['n_urls']} [parts]
  python scripts/stream_bench.py pair {blo['n_urls']} {n} [parts]  (×S)
  python scripts/stream_bench.py report {n}
""")
    print(json.dumps({"speedup": speedup, "efficiency": eff,
                      "lo_wall": blo["wall_sec"], "hi_wall": bhi["wall_sec"],
                      "emitted": blo["emitted"]}))
    print(f"wrote {path}")


def main_scale() -> None:
    """Sustained-growth scale point: the same job at a K-times-larger
    stream, single level, min-of-S, bloom capacity re-sized for the
    larger per-partition unique count (the design rule: capacity =
    expected uniques / partitions with headroom). Appends to the same
    jsonl; the report sections it by n_urls automatically.
    Usage: stream_bench.py scale [n_urls] [cpus] [samples] [parts]."""
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    samples = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    parts = int(sys.argv[5]) if len(sys.argv) > 5 else DEFAULT_PARTS
    # uniques = 3/4 of the stream over 64 partitions; 1.6x headroom
    capacity = max(300_000, int(n_urls * 3 // 4 // 64 * 1.6))
    os.makedirs(os.path.dirname(RUNS), exist_ok=True)
    with open(RUNS, "a") as f:
        for _ in range(samples):
            r = run_at(cpus, n_urls, parts, capacity=capacity)
            f.write(json.dumps(r) + "\n")
            f.flush()
            print({"cpus": cpus, "wall": r["wall_sec"],
                   "emitted": r["emitted"]}, flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "pair"
    if mode == "gen":
        main_gen()
    elif mode == "report":
        main_report()
    elif mode == "hunt":
        main_hunt()
    elif mode == "scale":
        main_scale()
    else:
        main_pair()
