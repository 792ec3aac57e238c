"""SnapshotTable commit semantics: append/overwrite/merge/time-travel/rollback."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from navi_spark.catalog import SnapshotTable


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="navi-cat-")
    yield SnapshotTable(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_append_and_time_travel(spark, table):
    assert not table.exists()
    s1 = table.append(_df(spark, [(1, "a")]), {"op": "first"})
    s2 = table.append(_df(spark, [(2, "b")]))
    assert table.read().count() == 2
    assert table.read(snapshot_id=s1).count() == 1  # time travel
    hist = table.history()
    assert [m["snapshot_id"] for m in hist] == [s1, s2]
    assert hist[0]["summary"] == {"op": "first"}


def test_overwrite_and_rollback(spark, table):
    s1 = table.append(_df(spark, [(1, "a")]))
    table.overwrite(_df(spark, [(9, "z")]))
    assert [r["k"] for r in table.read().collect()] == [9]
    table.rollback(s1)
    assert [r["k"] for r in table.read().collect()] == [1]


def test_merge_upsert(spark, table):
    table.append(_df(spark, [(1, "a"), (2, "b")]))
    table.merge_upsert(_df(spark, [(2, "B"), (3, "c")]), key="k")
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_read_or_empty(spark, table):
    assert table.read_or_empty("k long, v string").count() == 0
