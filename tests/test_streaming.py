"""Structured Streaming twins: stateful seen-filter + watermarked rollup."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from navi_spark.streaming.wave_stream import (
    streaming_hourly_rollup,
    streaming_seen_filter,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="navi-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_seen_filter_dedups_across_batches(spark, tmpdir):
    in_dir = f"{tmpdir}/in"
    ckpt = f"{tmpdir}/ckpt"
    # batch 1: a b c ; batch 2: b c d  → stream must emit a b c d once each
    spark.createDataFrame(
        [("https://h.test/a",), ("https://h.test/b",), ("https://h.test/c",)],
        "url string",
    ).write.parquet(in_dir)

    stream = spark.readStream.schema("url string").parquet(in_dir)
    q = (
        streaming_seen_filter(stream, n_partitions=4)
        .writeStream.format("memory")
        .queryName("seen_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [("https://h.test/b",), ("https://h.test/c",), ("https://h.test/d",)],
            "url string",
        ).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        urls = [r["url"] for r in spark.sql("select url from seen_out").collect()]
        assert sorted(urls) == [
            "https://h.test/a", "https://h.test/b",
            "https://h.test/c", "https://h.test/d",
        ]
    finally:
        q.stop()


def test_dedupe_keys_exact_to_bloom_swap():
    """State transition unit contract: exact below the threshold, one-way
    swap to a FIXED-SIZE bloom blob above it; duplicates never re-emitted
    in either mode; state size constant (sublinear in seen URLs) after
    the swap."""
    import numpy as np

    from navi_spark.streaming.wave_stream import _dedupe_keys

    rng = np.random.default_rng(7)
    st = None
    emitted: set[int] = set()
    blob_sizes = []
    kw = dict(swap_threshold=2000, capacity=50_000, fpp=1e-6)
    for batch_i in range(8):
        # 1000 new keys + 200 replays of already-seen keys per batch
        new = rng.integers(-(2**62), 2**62, 1000, dtype=np.int64)
        replay = (np.array(sorted(emitted)[:200], dtype=np.int64)
                  if emitted else np.empty(0, np.int64))
        keys = np.concatenate([new, replay])
        mask, st = _dedupe_keys(st, keys, **kw)
        fresh = {int(k) for k in keys[mask]}
        assert not (fresh & emitted), "re-emitted a seen key"
        emitted |= fresh
        hashes, blob, n_items = st
        assert n_items == len(emitted)
        if n_items <= 2000:
            assert blob is None and len(hashes) == n_items  # exact mode
        else:
            assert hashes is None and blob is not None
            blob_sizes.append(len(blob))
    # swapped partway through; blob size constant across growth
    assert len(set(blob_sizes)) == 1 and len(blob_sizes) >= 5
    # within-batch duplicate dedupes exactly even in bloom mode
    dup = np.array([123456789, 123456789], dtype=np.int64)
    mask, st = _dedupe_keys(st, dup, **kw)
    assert mask.tolist() == [True, False]
    mask, _ = _dedupe_keys(st, dup[:1], **kw)
    assert mask.tolist() == [False]  # and never again across batches


def test_streaming_seen_filter_bloom_mode_matches_exact(spark, tmpdir):
    """End-to-end across forced micro-batches with a swap threshold the
    FIRST batch exceeds: the bloom-state stream must emit exactly the
    first-seen set (fpp sized so no false positive occurs at test scale —
    deterministic hashes make this stable), reconciling bit-exact with
    the batch path."""
    in_dir = f"{tmpdir}/in"
    ckpt = f"{tmpdir}/ckpt"
    urls1 = [(f"https://h{i % 7}.test/p{i}",) for i in range(3000)]
    spark.createDataFrame(urls1, "url string").write.parquet(in_dir)
    stream = spark.readStream.schema("url string").parquet(in_dir)
    q = (
        streaming_seen_filter(stream, n_partitions=4, swap_threshold=100,
                              capacity=20_000, fpp=1e-9)
        .writeStream.format("memory")
        .queryName("seen_bloom_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: half replays, half new
        urls2 = [(f"https://h{i % 7}.test/p{i}",) for i in range(1500, 4500)]
        spark.createDataFrame(urls2, "url string").write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        got = sorted(
            r["url"] for r in spark.sql("select url from seen_bloom_out").collect()
        )
        want = sorted({u for (u,) in urls1} | {u for (u,) in urls2})
        assert got == want
        # batch 3: ALL replays — the kernel skips state.update entirely
        # (n_items unchanged); the store must carry the old state forward
        spark.createDataFrame(urls1[:1000], "url string").write.mode(
            "append").parquet(in_dir)
        q.processAllAvailable()
        # batch 4: replays + new — state survived the non-updating batch,
        # so replays stay suppressed and only the new URLs emit
        urls4 = [(f"https://h{i % 7}.test/p{i}",) for i in range(4000, 5000)]
        spark.createDataFrame(urls4, "url string").write.mode(
            "append").parquet(in_dir)
        q.processAllAvailable()
        got = sorted(
            r["url"] for r in spark.sql("select url from seen_bloom_out").collect()
        )
        want = sorted({u for (u,) in urls1} | {u for (u,) in urls2}
                      | {u for (u,) in urls4})
        assert got == want
    finally:
        q.stop()


def test_streaming_rollup_matches_batch(spark, sf_dir, tmpdir):
    import shutil as _sh

    events_path = f"{sf_dir}/events.parquet"
    in_dir = f"{tmpdir}/in"  # the file stream source requires a DIRECTORY
    import os as _os

    _os.makedirs(in_dir)
    _sh.copy(events_path, f"{in_dir}/events.parquet")
    batch = spark.read.parquet(events_path)
    stream = spark.readStream.schema(batch.schema).parquet(in_dir)
    q = (
        streaming_hourly_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_out")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r["window_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
            for r in spark.sql("select * from rollup_out").collect()
        }
    finally:
        q.stop()
    expected = {
        (str(r["window_start"]), r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value")
        ).collect()
    }
    # append mode emits only windows the watermark closed; every emitted
    # window must match the batch result, and most windows must be emitted
    assert got
    for k, v in got.items():
        assert expected[k] == v
    assert len(got) >= len(expected) - 4  # tail windows may stay open
