"""Measure the committed calibration reference (bench.CALIBRATION_REF_SEC).

Runs bench.calibration() several times on a fresh local[32] JVM and prints
all walls + the min. Run during a known-good host window (verify by running
twice a few minutes apart — a stable min across sessions is the reference);
commit the min into bench.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_session, calibration  # noqa: E402


def main() -> None:
    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    walls = calibration(spark, reps=7)
    print({"walls": walls, "min": min(walls)})
    spark.stop()


if __name__ == "__main__":
    main()
