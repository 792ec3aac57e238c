"""robots.txt parsing + rule matching (reference ops C10-C12).

Parse semantics follow `crawler/RobotServer.java:90-120` exactly: lines are
trimmed + lowercased; blank/# lines skipped; `allow:`/`disallow:` directives
grouped under the current `user-agent:`; ONLY the `*` agent group is ever
consulted (`RobotServer.java:132`); empty patterns dropped; a host with no
robots.txt, or whose robots.txt has no `*` group, allows everything
(`RobotServer.java:54-57,135-137`).

Match semantics follow the reference's INTENT (`RobotServer.java:170-231`):
rules sorted by raw pattern length descending (most-specific first, stable on
ties), `*` wildcards become `.*`, matching is a SUBSTRING search
(`matcher.find()`, not an RFC 9309 prefix match), `$` is a literal character
(the reference escapes it), first matching rule decides, allow on no match,
and an unparseable URL is disallowed (`RobotServer.java:144-147`).

Documented reference bug (NOT reproduced): `RobotServer.java:228` wraps the
final regex in `Pattern.quote(...)`, turning every rule into a literal match
of its own regex text — so in the running Java binary no rule ever matches
and nothing is ever blocked. We implement the intended semantics above; a
parity oracle for the buggy build is trivially `lambda *a: True`.

Scale shape: the rules table is one row per host (pre-parsed once per crawl),
joined to the frontier on `host` — broadcast when small, shuffle-join when
the host universe is large — then matched with one Arrow-batched pandas UDF.
The reference instead caches per-host rule maps in memory per JVM
(`RobotServer.java:21`); the join replaces the cache.
"""

from __future__ import annotations

import json
import re
from typing import Optional

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType


def parse_robots_txt(robots_txt: Optional[str]) -> list[tuple[str, str]]:
    """→ ordered [(directive, pattern)] for the `*` user-agent group only."""
    if not robots_txt:
        return []
    rules: dict[str, list[tuple[str, str]]] = {}
    current_ua: Optional[str] = None
    for line in robots_txt.split("\n"):
        line = line.strip().lower()
        if not line or line.startswith("#"):
            continue
        if line.startswith("user-agent:"):
            current_ua = line.split(":", 2)[1].strip()
            rules.setdefault(current_ua, [])
        elif line.startswith(("allow:", "disallow:")) and current_ua is not None:
            directive, _, pattern = line.partition(":")
            pattern = pattern.strip()
            if pattern:
                rules[current_ua].append((directive.strip(), pattern))
    return rules.get("*", [])


def _compile_rules(parsed: list[tuple[str, str]]) -> list[tuple[str, re.Pattern]]:
    """Sort longest-pattern-first (stable), compile `*`→`.*` substring regex."""
    ordered = sorted(parsed, key=lambda dp: -len(dp[1]))
    out = []
    for directive, pattern in ordered:
        rx = ".*".join(re.escape(part) for part in pattern.split("*"))
        out.append((directive, re.compile(rx)))
    return out


def _path_for_match(url: str) -> Optional[str]:
    """Path component used for matching (RobotServer.java:140-160):
    trailing slash preserved, empty path → '/'."""
    m = re.match(r"^https?://[^/?#]+([^?#]*)", url)
    if not m:
        return None
    path = m.group(1)
    if not path:
        path = "/"
    if url.endswith("/") and not path.endswith("/"):
        path += "/"
    return path


def is_allowed_py(url: Optional[str], parsed: list[tuple[str, str]]) -> bool:
    """Single-row matcher — the parity oracle. First (longest) matching rule
    decides; allow when nothing matches; disallow unparseable URLs."""
    if not parsed:
        return True
    if url is None:
        return False
    path = _path_for_match(url)
    if path is None:
        return False
    for directive, rx in _compile_rules(parsed):
        if rx.search(path):
            return directive == "allow"
    return True


@pandas_udf(StringType())
def parse_robots_udf(texts: pd.Series) -> pd.Series:
    """robots.txt → JSON '[[directive, pattern], ...]' (the `*` group)."""
    return texts.map(
        lambda t: json.dumps(parse_robots_txt(t)), na_action="ignore"
    )


@pandas_udf(BooleanType())
def is_allowed_udf(urls: pd.Series, rules_json: pd.Series) -> pd.Series:
    """Arrow-batched matcher; compiled-rule cache keyed on the JSON text so
    each distinct host rule-set compiles once per batch."""
    cache: dict[str, list] = {}

    def one(url, rj):
        if rj is None or rj == "[]":
            return True  # no rules → allow (RobotServer.java:135-137)
        compiled = cache.get(rj)
        if compiled is None:
            compiled = _compile_rules([tuple(r) for r in json.loads(rj)])
            cache[rj] = compiled
        if url is None:
            return False
        path = _path_for_match(url)
        if path is None:
            return False
        for directive, rx in compiled:
            if rx.search(path):
                return directive == "allow"
        return True

    return pd.Series([one(u, r) for u, r in zip(urls, rules_json)], dtype=bool)


def parsed_rules_table(robots_df: DataFrame) -> DataFrame:
    """(host, robots_txt, crawl_delay_s) → (host, rules_json, crawl_delay_s).

    Parsed ONCE per crawl and reused every wave — the vectorized replacement
    for the reference's per-JVM `rulesCache` (RobotServer.java:21).
    """
    return robots_df.select(
        "host",
        parse_robots_udf(F.col("robots_txt")).alias("rules_json"),
        "crawl_delay_s",
    )


def filter_allowed(candidates: DataFrame, rules: DataFrame,
                   url_col: str = "url", host_col: str = "host",
                   broadcast_rules: bool = False) -> DataFrame:
    """Annotate candidates with `robots_allowed` (C12).

    Left join on host (missing host row = no robots.txt = allow), then one
    vectorized match. The rules table has one row per host that serves a
    robots.txt — UNBOUNDED at the 10^10-URL design point, so it is NOT
    broadcast by default: AQE broadcasts whichever side is actually small
    at runtime (in the wave that is usually `candidates`, which is bounded
    by the wave budget). `broadcast_rules=True` opts in the hint for
    known-small host universes.
    """
    r = F.broadcast(rules) if broadcast_rules else rules
    joined = candidates.join(
        r.withColumnRenamed("host", host_col), on=host_col, how="left"
    )
    return joined.withColumn(
        "robots_allowed",
        F.when(F.col("rules_json").isNull(), F.lit(True)).otherwise(
            is_allowed_udf(F.col(url_col), F.col("rules_json"))
        ),
    ).drop("rules_json")
