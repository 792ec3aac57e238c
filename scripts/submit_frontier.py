"""Frontier job for the ``spark-submit --py-files`` packaging lane.

The north rule (BASELINE.json) requires the job to run "via spark-submit
--py-files on a multi-executor cluster at two cluster sizes". This is the
job file that lane submits:

    spark-submit --master local[N] \
        --py-files navi_spark.zip,bench.py \
        submit_frontier.py <cpus> <n_urls> <forbidden_path_prefix>

It imports ``navi_spark`` and ``bench`` EXCLUSIVELY from the shipped
``--py-files`` artifacts — the launcher (scripts/submit_scaling.py) runs it
with a scrubbed PYTHONPATH, cwd in an empty temp dir, and a COPY of this
file submitted from that temp dir, so nothing on the import path points at
the repo checkout. ``<forbidden_path_prefix>`` is the repo root; the job
asserts no shipped module resolved from it, proving the packaging is what
a real cluster (driver + executors sharing nothing with the checkout)
would exercise.

Prints one ``RESULT {json}`` line consumed by the launcher.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    cpus = int(sys.argv[1])
    n_urls = int(sys.argv[2])
    forbidden = sys.argv[3] if len(sys.argv) > 3 else None

    import navi_spark  # resolved from the --py-files zip
    import bench  # resolved from the --py-files staging dir

    origins = {
        "navi_spark": navi_spark.__file__,
        "bench": bench.__file__,
    }
    assert ".zip" in origins["navi_spark"], (
        f"navi_spark imported from {origins['navi_spark']}, "
        "not the --py-files zip"
    )
    if forbidden:
        for mod, path in origins.items():
            assert not path.startswith(forbidden.rstrip("/") + "/"), (
                f"{mod} leaked in from the repo checkout: {path}"
            )

    spark = bench.build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # two-step warmup, same discipline as scripts/bench_scaling.py: codegen
    # JIT + python-worker forks reach steady state before the timed run
    bench.frontier_throughput(spark, 50_000, 100)
    if n_urls > 1_000_000:
        bench.frontier_throughput(spark, 1_000_000, 2_000)
    r = bench.frontier_throughput(
        spark, n_urls, max(n_urls // 500, 10)
    )
    r["pkg_origins"] = origins
    print("RESULT " + json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
