"""Diagnose the streaming seen-filter's scaling cap: run the stream_bench
child at one core count while sampling /proc/stat, and report the average
number of busy cores during the timed span.

Distinguishes the two possible causes of sub-linear addBatch scaling:
  * busy-cores ~= cpus  -> the work itself inflates (memory bandwidth /
    hypervisor steal / GC) — no concurrency bug in the plan;
  * busy-cores << cpus  -> a real concurrency cap inside the micro-batch
    (serialized stage, python-worker ceiling, state-store commit barrier).

Usage: python scripts/stream_cpuprofile.py [cpus] [n_urls] [parts]
Prints one JSON line; does not write to BENCH/.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from stream_bench import CHILD, FILES_PER_TRIGGER, N_FILES, src_dir  # noqa: E402


def read_busy() -> tuple[float, float]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + vals[4]  # idle + iowait
    return sum(vals), idle


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    samples: list[tuple[float, float, float]] = []  # (t, total, idle)
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            tot, idle = read_busy()
            samples.append((time.monotonic(), tot, idle))
            stop.wait(1.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.monotonic()
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", CHILD, str(cpus), str(n_urls),
         src_dir(n_urls, parts), REPO, str(N_FILES),
         str(FILES_PER_TRIGGER), str(parts), "300000"],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    t1 = time.monotonic()
    stop.set()
    th.join()

    result = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if result is None:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])

    # busy-core series over the timed stream span only (skip JVM startup +
    # warmup: approximate the timed span as the LAST wall_sec of the child)
    wall = result["wall_sec"]
    span = [(t, tot, idle) for (t, tot, idle) in samples if t >= t1 - wall]
    series = []
    for (ta, tota, idla), (tb, totb, idlb) in zip(span, span[1:]):
        dt_ticks = totb - tota
        if dt_ticks <= 0:
            continue
        busy = (dt_ticks - (idlb - idla)) / dt_ticks
        # /proc/stat aggregates ALL host cpus; busy fraction * ncpus(host)
        series.append(busy * os.cpu_count())
    series.sort()
    n = len(series)
    print(json.dumps({
        "cpus": cpus, "parts": parts, "wall_sec": wall,
        "addBatch_ms": result.get("duration_ms", {}).get("addBatch"),
        "busy_cores_p50": round(series[n // 2], 2) if n else None,
        "busy_cores_p90": round(series[int(n * 0.9)], 2) if n else None,
        "busy_cores_mean": round(sum(series) / n, 2) if n else None,
        "host_ncpu": os.cpu_count(),
        "child_total_sec": round(t1 - t0, 1),
    }))


if __name__ == "__main__":
    main()
