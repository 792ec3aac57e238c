"""C13 validator determinism: the synthetic server headers must be pure
functions of the payload version — independent of the session timezone."""

from __future__ import annotations

import pyspark.sql.functions as F

from navi_spark.operators.fetch import payload_etag, payload_last_modified


def _render(spark, tz: str) -> list[tuple[str, str]]:
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = spark.createDataFrame(
            [(1234567890123, "a caption"), (-42, "b caption")],
            "phash long, caption string",
        ).select(
            payload_etag().alias("etag"),
            payload_last_modified().alias("lm"),
        )
        return [(r["etag"], r["lm"]) for r in df.collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_last_modified_is_timezone_independent(spark):
    utc = _render(spark, "UTC")
    la = _render(spark, "America/Los_Angeles")
    tokyo = _render(spark, "Asia/Tokyo")
    assert utc == la == tokyo
    # shape sanity: RFC-1123 style, labeled GMT
    for _etag, lm in utc:
        assert lm.endswith(" GMT") and lm[3:5] == ", ", lm


def test_last_modified_matches_python_utc_even_under_dst_zone(spark):
    """Byte-exact cross-check against Python's UTC rendering over many
    epochs, with the SESSION timezone set to a DST-observing zone — the
    case where the old to_utc_timestamp round-trip could be an hour off
    for epochs inside a transition window."""
    from datetime import datetime, timezone

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = spark.range(500).select(
            F.col("id").alias("phash"),
            payload_last_modified("id").alias("lm"),
            (F.lit(1_500_000_000)
             + F.pmod(F.xxhash64("id"), F.lit(300_000_000))).alias("epoch"),
        )
        for r in df.collect():
            want = datetime.fromtimestamp(
                r["epoch"], timezone.utc
            ).strftime("%a, %d %b %Y %H:%M:%S GMT")
            assert r["lm"] == want, (r["epoch"], r["lm"], want)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
