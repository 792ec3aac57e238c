"""Host memory-bandwidth vs pure-CPU scaling probe (engine-row exhibit).

The composed-engine scaling row (BENCH/ENGINE_SCALING.md) needs to
separate "the plan doesn't scale" from "the host's single memory bus
saturates". This probe measures both envelopes directly, outside Spark:

* ``burn_cpu``  — cache-resident float arithmetic: how well pure compute
  scales 4 -> 16 pinned workers on this box.
* ``burn_copy`` — repeated 64 MB memcpy: how well byte movement scales.
  Every "I/O" in the sandbox (tmpfs shuffle, parquet commits, Arrow
  transfer, localCheckpoint blocks) is this operation.

On a real N vs 4N *multi-host* cluster each executor owns its memory bus,
so the copy envelope scales like the cpu envelope; a single-socket
sandbox caps any byte-movement-dominated job at the copy ratio no matter
how good the plan is. Reference numbers (2026-08, quiet window):
cpu 3.84x (eff 0.96), copy 2.97x (eff 0.74, ~77 GB/s aggregate).

Usage: python scripts/membw_probe.py [seconds_per_level]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def burn_copy(q, seconds: float) -> None:
    src = np.frombuffer(np.random.bytes(64 << 20), dtype=np.uint8).copy()
    dst = np.empty_like(src)
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    q.put(n * len(src) / (time.monotonic() - t0))


def burn_cpu(q, seconds: float) -> None:
    x = 1.0
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < seconds:
        for _ in range(100000):
            x = x * 1.0000001 % 97
        n += 1
    q.put(n / (time.monotonic() - t0))


def run(fn, k: int, seconds: float) -> float:
    os.sched_setaffinity(0, range(k))
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(q, seconds)) for _ in range(k)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    out = {}
    try:
        for fn, key, scale in ((burn_copy, "copy_gb_s", 1e9),
                               (burn_cpu, "cpu_iters_s", 1.0)):
            lo, hi = run(fn, 4, seconds), run(fn, 16, seconds)
            out[key] = {"4": round(lo / scale, 2), "16": round(hi / scale, 2),
                        "scaling": round(hi / lo, 2),
                        "efficiency": round(hi / lo / 4.0, 3)}
    finally:
        os.sched_setaffinity(0, range(os.cpu_count()))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
