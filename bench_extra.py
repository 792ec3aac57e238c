"""Per-query isolation bench (guide §1.4) — bench.py's session + timing
methodology applied to ONE query (or a comma list) at a time, so an
optimization can be A/B'd in seconds instead of a full bench run.

bench.py itself is FROZEN for measurement; this file holds the extra
instrumentation the optimization round needs.

Usage:
    python bench_extra.py q1,q2,...   [reps]
    python bench_extra.py all         # every headline registry query
Env:
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS   (default 32)
    NAVI_NOOP=1        time df.write.format("noop") instead of .count()
                       (computes every column; .count() is what bench.py
                       times, so .count() is the default)
Prints one JSON line: {"query": {"walls": [...], "min": s}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_session  # noqa: E402  (frozen session config)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NOOP = bool(os.environ.get("NAVI_NOOP"))

HEADLINE = (
    "crawl_wave_schedule c23_pagerank i3_tokenize r3_bm25 r8_hybrid_topk "
    "sim_cosine_brute c15_content_dedup tpch_q1_pricing_summary "
    "ev_hourly_rollup"
).split()


def main() -> None:
    names = sys.argv[1] if len(sys.argv) > 1 else "all"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    targets = HEADLINE if names == "all" else names.split(",")

    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from navi_spark import extra_queries as xq
    from navi_spark import queries as q

    registry = {**q.queries(), **xq.queries()}
    out = {}
    for name in targets:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        walls = []
        for rep in range(reps + 1):  # rep 0 = untimed warmup (JIT/workers)
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            if NOOP:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            w = round(time.monotonic() - t0, 3)
            if rep:
                walls.append(w)
        out[name] = {"walls": walls, "min": min(walls)}
        spark.sparkContext.setJobDescription(None)
        print(f"[bench_extra] {name}: min={min(walls)} walls={walls}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
