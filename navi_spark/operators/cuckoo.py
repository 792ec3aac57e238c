"""Partitioned cuckoo-filter URL-seen pre-filter — the second option the
north star names ("partitioned bloom/cuckoo URL-seen set"), drop-in
API-compatible with :mod:`navi_spark.operators.bloom`.

Cuckoo filters (Fan, Andersen, Kaminsky, Mitzenmacher: "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014 — public algorithm) store a
16-bit fingerprint per key in one of two candidate buckets of 4 slots.
Versus the bloom option: lower false-positive rate per bit at high load,
and DELETION support (a bloom cannot unset bits), at the cost of a
bounded-kick insert loop. Deletion would matter to an engine that retires
seen-set entries (e.g. a policy that makes a permanently-404 URL
re-crawlable); note that `CrawlEngine` itself NEVER deletes — reference
parity keeps dead pages ('touched', WebCrawler.java:680-699) — so
:func:`cuckoo_delete` is provided for such future policies and exercised
only by its unit tests. Also: once a partition's overflow flag is set,
deletes cannot restore pruning for it (the evicted fingerprint is gone).

Same table shape and role as the bloom (SURVEY.md §4.3): blobs live in a
`(host_partition, filter, n_items)` table, updated via cogroup →
applyInPandas, and act as a PRE-filter only — *definitely-new* candidates
skip the exact anti-join; *maybe-seen* ones (true positives + ~1e-4 false
positives) pay it. Parity stays exact because the exact table decides.

Saturation semantics: a cuckoo insert can fail once load exceeds ~95%.
The blob then sets an overflow flag and membership degrades to
"everything maybe-seen" for that partition — the pre-filter stops pruning
but never lies, so correctness is unaffected. Size partitions so this
does not happen (see :func:`sizing`).

Lookups are fully vectorized numpy (gather + compare over uint16 slots);
inserts are a per-NEW-key Python kick loop, fine because each wave only
inserts that wave's successes (≤ wave budget rows across all partitions).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FILTERS_SCHEMA = "host_partition int, filter binary, n_items long"

_MAGIC = b"NCKF"
_HDR = 16  # magic(4) overflow(1) pad(3) log2_buckets(4) reserved(4)
_SLOTS = 4
_MULT = np.uint64(0x9E3779B97F4A7C15)


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    """16-bit fingerprints in 1..65535 (0 = empty slot sentinel)."""
    h = (keys.astype(np.uint64) * _MULT) >> np.uint64(48)
    fp = h.astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _bucket1(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (keys.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key alternate: i2 = i1 XOR hash(fp); n_buckets is a power of
    two so XOR stays in range (the property the kick loop relies on)."""
    h = (fp.astype(np.uint64) * _MULT) >> np.uint64(32)
    return (b.astype(np.uint64) ^ (h % np.uint64(n_buckets))).astype(np.int64)


def cuckoo_new(n_buckets: int) -> bytes:
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    hdr = (
        _MAGIC + bytes([0, 0, 0, 0])
        + int(n_buckets).bit_length().to_bytes(4, "little")  # log2+1, see _parse
        + b"\x00\x00\x00\x00"
    )
    return hdr + bytes(n_buckets * _SLOTS * 2)


def _parse(blob: bytes) -> tuple[np.ndarray, int, bool]:
    assert blob[:4] == _MAGIC, "not a cuckoo blob"
    overflow = blob[4] != 0
    n_buckets = 1 << (int.from_bytes(blob[8:12], "little") - 1)
    table = np.frombuffer(blob, dtype=np.uint16, offset=_HDR).reshape(
        n_buckets, _SLOTS
    )
    return table, n_buckets, overflow


def cuckoo_add(blob: bytes, keys: np.ndarray, max_kicks: int = 500,
               seed: int = 42) -> bytes:
    """Insert keys; on table saturation set the overflow flag (membership
    then reports everything maybe-seen — conservative, never wrong)."""
    table, n_buckets, overflow = _parse(blob)
    table = table.copy()
    fps = _fingerprints(keys)
    b1s = _bucket1(keys, n_buckets)
    rng = np.random.default_rng(seed)
    for fp, b1 in zip(fps, b1s):
        if overflow:
            break
        fp = np.uint16(fp)
        b2 = int(_alt_bucket(np.array([b1]), np.array([fp]), n_buckets)[0])
        placed = False
        for b in (int(b1), b2):
            row = table[b]
            if fp in row:           # already present → idempotent
                placed = True
                break
            empty = np.flatnonzero(row == 0)
            if len(empty):
                table[b, empty[0]] = fp
                placed = True
                break
        if placed:
            continue
        cur_b, cur_fp = int(b1), fp
        for _ in range(max_kicks):
            slot = int(rng.integers(_SLOTS))
            cur_fp, table[cur_b, slot] = table[cur_b, slot], cur_fp
            cur_b = int(
                _alt_bucket(np.array([cur_b]), np.array([cur_fp]), n_buckets)[0]
            )
            row = table[cur_b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                table[cur_b, empty[0]] = cur_fp
                placed = True
                break
        if not placed:
            overflow = True  # evicted fp lost → must stop trusting misses
    out = bytearray(blob[:_HDR]) + table.tobytes()
    out[4] = 1 if overflow else 0
    return bytes(out)


def cuckoo_delete(blob: bytes, keys: np.ndarray) -> bytes:
    """Remove keys (one fingerprint occurrence per key) — the operation a
    bloom cannot do. Deleting a never-inserted key can evict another key's
    colliding fingerprint (standard cuckoo-filter caveat): only delete
    keys known to be present. NOT called by CrawlEngine (reference parity
    never retires seen entries); provided for engines layering a
    retirement policy on the seen set, and covered by unit tests only.
    Deletes in an overflowed partition cannot re-enable its pruning."""
    table, n_buckets, _overflow = _parse(blob)
    table = table.copy()
    fps = _fingerprints(keys)
    b1s = _bucket1(keys, n_buckets)
    b2s = _alt_bucket(b1s, fps, n_buckets)
    for fp, b1, b2 in zip(fps, b1s, b2s):
        for b in (int(b1), int(b2)):
            hit = np.flatnonzero(table[b] == fp)
            if len(hit):
                table[b, hit[0]] = 0
                break
    return bytes(bytearray(blob[:_HDR]) + table.tobytes())


def cuckoo_maybe(blob: bytes, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership: True = maybe seen, False = definitely new."""
    table, n_buckets, overflow = _parse(blob)
    if overflow:
        return np.ones(len(keys), dtype=bool)
    fps = _fingerprints(keys)
    b1s = _bucket1(keys, n_buckets)
    b2s = _alt_bucket(b1s, fps, n_buckets)
    fcol = fps[:, None]
    return ((table[b1s] == fcol).any(axis=1)
            | (table[b2s] == fcol).any(axis=1))


def sizing(expected_per_partition: int, load: float = 0.84) -> int:
    """n_buckets (power of two) for the expected keys at a safe load
    factor (b=4, 16-bit fingerprints hold ~95% max; 0.84 default leaves
    kick headroom)."""
    n = max(expected_per_partition, 1)
    need = int(math.ceil(n / (_SLOTS * load)))
    return 1 << max(need - 1, 1).bit_length()


def update_filters(
    filters_df: DataFrame,
    new_keys: DataFrame,
    n_buckets: int,
) -> DataFrame:
    """Merge newly-seen keys into per-partition blobs (bloom.update_filters
    shape: one shuffle on host_partition, numpy blob work)."""

    def merge(key, old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
        hp = int(key[0])
        blob = bytes(old["filter"].iloc[0]) if len(old) else cuckoo_new(n_buckets)
        n = int(old["n_items"].iloc[0]) if len(old) else 0
        if len(new):
            blob = cuckoo_add(blob, new["url_hash"].to_numpy(np.int64))
            n += len(new)
        return pd.DataFrame(
            {"host_partition": [hp], "filter": [blob], "n_items": [n]}
        )

    return (
        filters_df.groupBy("host_partition")
        .cogroup(new_keys.groupBy("host_partition"))
        .applyInPandas(merge, FILTERS_SCHEMA)
    )


def annotate_maybe_seen(
    candidates: DataFrame,
    filters_df: DataFrame,
    key_col: str = "url_hash",
) -> DataFrame:
    """Add `maybe_seen` per candidate (False ⇒ provably unseen); cogrouped
    by host_partition so each task touches exactly one blob (no broadcast
    of the filter set — at 10^10 scale it is itself large)."""
    cand_cols = candidates.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", maybe_seen boolean"

    def check(key, cand: pd.DataFrame, filt: pd.DataFrame) -> pd.DataFrame:
        if not len(cand):
            return pd.DataFrame(columns=cand_cols + ["maybe_seen"])
        if len(filt):
            blob = bytes(filt["filter"].iloc[0])
            maybe = cuckoo_maybe(blob, cand[key_col].to_numpy(np.int64))
        else:
            maybe = np.zeros(len(cand), dtype=bool)
        out = cand.copy()
        out["maybe_seen"] = maybe
        return out

    return (
        candidates.groupBy("host_partition")
        .cogroup(filters_df.groupBy("host_partition"))
        .applyInPandas(check, out_schema)
    )
