"""Streaming variants of the crawl pipeline (SURVEY.md §2.5: the reference
has no streaming — its crawl loop is iterative-batch; these are the
Structured Streaming expressions of the same operators for deployments that
feed the frontier from a live discovery stream).

  streaming_seen_filter   stateful URL-seen dedup per host_partition via
                          applyInPandasWithState — the streaming twin of the
                          bloom/anti-join seen check (C9); state = the set of
                          64-bit url hashes per partition
  streaming_hourly_rollup watermarked tumbling-window metrics aggregation —
                          the streaming twin of the per-wave metrics table

Both run on any streaming source; tests drive them with the file source
over driver parquet + memory sinks and `processAllAvailable()`.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_OUT_SCHEMA = "host_partition int, url string, url_hash long"
SEEN_STATE_SCHEMA = "hashes array<long>"


def streaming_seen_filter(urls: DataFrame, n_partitions: int = 16) -> DataFrame:
    """Emit only first-seen URLs from a stream; per-host-partition state.

    State is the array of url hashes seen so far in that partition (exact,
    like the engine's `seen` table; swap the array for a serialized bloom
    blob at 10^10 scale — same GroupState plumbing)."""
    keyed = urls.select(
        F.pmod(F.xxhash64("url"), F.lit(n_partitions)).cast("int")
        .alias("host_partition"),
        "url",
        F.xxhash64("url").alias("url_hash"),
    )

    def dedupe(
        key: Tuple[int],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for b in batches:
            for url, h in zip(b["url"], b["url_hash"]):
                h = int(h)
                if h not in seen:
                    seen.add(h)
                    out.append((key[0], url, h))
        state.update((list(seen),))
        yield pd.DataFrame(out, columns=["host_partition", "url", "url_hash"])

    return keyed.groupBy("host_partition").applyInPandasWithState(
        dedupe,
        outputStructType=SEEN_OUT_SCHEMA,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window count/sum per event_type — late rows
    beyond the watermark are dropped, state is bounded (the streaming form
    of the engine's per-wave metrics commit)."""
    # parquet naive timestamps read as TIMESTAMP_NTZ; watermarks require
    # TIMESTAMP (session tz — tests pin UTC)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )
