"""The supplementary registry (`navi_spark.extra_queries`) is held to the
SAME oracle protocol as the driver-certified 50: every entry runs on Spark
and its DuckDB twin side-by-side, comparing row count, column set, and an
order-insensitive value hash. This keeps the alternates honest without any
hand-picked certification window — the exported `queries()` surface is
certified by the driver in full, and everything else is certified here."""

from __future__ import annotations

import importlib.util
import os

from navi_spark import extra_queries, queries


def _load_checker():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "check_oracle.py",
    )
    spec = importlib.util.spec_from_file_location("check_oracle", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_extra_registry_is_disjoint_and_all_twinned():
    main = set(queries.queries())
    extra = set(extra_queries.queries())
    assert len(main) == 50, len(main)
    assert not main & extra
    # every extra has a DuckDB twin — no rows-only entries hide here
    assert set(extra_queries.oracle_sql()) == extra


def test_extra_queries_match_duckdb_oracles(spark, sf_dir):
    co = _load_checker()
    con = co.duck_con(sf_dir)
    failures = co.check_queries(
        spark, con, sf_dir,
        extra_queries.queries(), extra_queries.oracle_sql(),
    )
    assert not failures, failures
