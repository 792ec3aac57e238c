"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship frontier-wave scheduling plan on sf0.001;
`queries()` / `oracle_sql()` expose the operator registry in
`navi_spark.queries` (one entry per implemented SURVEY.md §2 operator, each
with a DuckDB oracle twin unless inherently non-SQL).
"""

from __future__ import annotations

import functools
import os
import shutil
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from navi_spark import queries as _q  # noqa: E402

_SHIPPED: set[int] = set()


def _pkg_content_hash() -> str:
    """Stable hash of every navi_spark source file — the zip is named by
    it, so a source edit always ships a FRESH copy to the workers (a fixed
    path would silently reuse a stale zip and let driver/executor code
    diverge) and concurrent users never collide on one world-readable
    file."""
    import hashlib

    h = hashlib.sha256()
    pkg = os.path.join(_REPO, "navi_spark")
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs.sort()
        for name in sorted(files):
            if name.endswith((".pyc", ".pyo")) or "__pycache__" in root:
                continue
            p = os.path.join(root, name)
            h.update(os.path.relpath(p, pkg).encode())
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship navi_spark to the python workers (spark-submit --py-files
    equivalent): the driver process may not export this repo on PYTHONPATH,
    and the Arrow UDFs deserialize by module reference on the workers."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    # stable per-user staging dir: the content-hashed filename then actually
    # deduplicates rebuilds across SparkContexts/processes (a fresh mkdtemp
    # per call made the exists() check dead code and leaked temp dirs)
    staging = os.path.join(
        tempfile.gettempdir(), f"navi-pkg-{os.getuid()}"
    )
    os.makedirs(staging, exist_ok=True)
    zip_base = os.path.join(staging, f"navi_spark_{_pkg_content_hash()}")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        tmp = shutil.make_archive(
            zip_base + f".tmp-{os.getpid()}", "zip",
            root_dir=_REPO, base_dir="navi_spark",
        )
        os.replace(tmp, zip_path)  # atomic: concurrent users never collide
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    @functools.wraps(fn)
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return inner


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_workers_can_import(spark)
    return _q.crawl_wave_schedule(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
