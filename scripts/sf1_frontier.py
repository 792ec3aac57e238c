"""Single-config 10x frontier scale point (VERDICT r04 #6).

One session, the SHIPPING bench config (bench.build_session: tmpfs
shuffle dirs, compression off), calibration-bracketed: 500k and 5M
points measured back-to-back with full warmup + min-of-3 each, so the
500k -> 5M chain is same-config, same-session, same host window.
Overwrites BENCH/SF1_FRONTIER.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CALIBRATION_REF_SEC, build_session, calibration, frontier_throughput  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    spark = build_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    # two-step warmup to steady state (C2-JIT keeps compiling through the
    # first full-size pass), then calibration to pin the host window
    frontier_throughput(spark, 50_000, 100)
    frontier_throughput(spark, 5_000_000, 10_000)
    calib_pre = calibration(spark)
    p500k = [frontier_throughput(spark, 500_000, 1_000) for _ in range(3)]
    p5m = [frontier_throughput(spark, 5_000_000, 10_000) for _ in range(3)]
    calib_post = calibration(spark, reps=2)
    spark.stop()
    best5 = min(p5m, key=lambda r: r["wall_sec"])
    best500 = min(p500k, key=lambda r: r["wall_sec"])
    out = {
        "protocol": "one session, shipping config (compression off, tmpfs),"
                    " full-size warmup, min-of-3 per size, calibration-"
                    "bracketed",
        "config": {"shuffle_compress": False, "local_dir_tmpfs": True,
                   "partitions": 64},
        "calibration_sec": min(calib_pre + calib_post),
        "calibration_ref_sec": CALIBRATION_REF_SEC,
        "calibration_samples": {"pre": calib_pre, "post": calib_post},
        "points": {
            "500k": {"best": best500,
                     "all_walls": sorted(r["wall_sec"] for r in p500k)},
            "5M": {"best": best5,
                   "all_walls": sorted(r["wall_sec"] for r in p5m)},
        },
        "per_url_ratio": round(
            (best5["wall_sec"] / 5e6) / (best500["wall_sec"] / 5e5), 3
        ),
        "note": "per_url_ratio < 1 means the 10x point is CHEAPER per URL "
                "than the headline size (fixed overhead amortizes; "
                "job/stage structure unchanged).",
    }
    path = os.path.join(REPO, "BENCH", "SF1_FRONTIER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"500k": best500["wall_sec"], "5M": best5["wall_sec"],
                      "calibration": out["calibration_sec"]}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
