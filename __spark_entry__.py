"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship frontier-wave scheduling plan on sf0.001;
`queries()` / `oracle_sql()` expose the operator registry in
`navi_spark.queries` (one entry per implemented SURVEY.md §2 operator, each
with a DuckDB oracle twin unless inherently non-SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from navi_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.crawl_wave_schedule(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
