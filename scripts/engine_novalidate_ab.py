"""Decode-off control for the composed-engine scaling row.

BENCH/ENGINE_SCALING.md attributes the composed wave's 0.554 efficiency to
two measured terms: the host's single memory bus (16 co-resident python
decoders inflate decode core-seconds 1.33x) and the fixed ~25-job commit
chain. This control runs the IDENTICAL wave with `validate_payloads=False`
— same frontier, same joins, same commits, no python decode stage — at the
same two parallelism levels. If the decode stage carried the residual, the
decode-off wave scales materially better; if the shuffle/commit machinery
did, it scales the same. Either outcome turns the attribution from
inference into experiment.

Probe-gated like `engine_scaling.py hunt`; rows append to
BENCH/engine_novalidate.jsonl (NOT engine_scaling.jsonl — the main report
aggregates that file unfiltered and must stay decode-on only).

Usage: python scripts/engine_novalidate_ab.py [n_urls] [N] [max_pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

import bench  # noqa: E402
import engine_scaling  # noqa: E402
from submit_scaling import probe_window  # noqa: E402

engine_scaling.RUNS = os.path.join(REPO, "BENCH", "engine_novalidate.jsonl")


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    max_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    factor = 1.6
    done = 0
    while done < max_pairs:
        w = probe_window()
        quiet = (
            min(w["cpu"]) <= factor * bench.CALIBRATION_REF_SEC
            and min(w["shuffle"]) <= factor * bench.SHUFFLE_CALIBRATION_REF_SEC
        )
        print(json.dumps({"probe": w, "quiet": quiet}), flush=True)
        if quiet:
            engine_scaling.do_pair(n_urls, n, window=w, validate=False)
            done += 1
        else:
            time.sleep(240)


if __name__ == "__main__":
    main()
