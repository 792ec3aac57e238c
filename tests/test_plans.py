"""Physical-plan audits: pushdown, pruning, no cartesian joins, codegen —
"would this plan survive 100×" made assertable (task brief: explain and
iterate until it's the plan you'd want)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from navi_spark import queries as q
from navi_spark.plans import (
    assert_no_cartesian,
    count_exchanges,
    explain_str,
    has_wholestage_codegen,
    pushed_filters,
    scan_columns,
)


def test_tpch_q1_pushdown_and_pruning(spark, sf_dir):
    from navi_spark import extra_queries as xq

    df = xq.tpch_q1_pricing_summary(spark, sf_dir)
    cols = scan_columns(df)
    # column pruning: the scan must NOT read all 11 lineitem columns
    assert cols and all(len(c) <= 7 for c in cols), cols
    assert has_wholestage_codegen(df, execute=True)  # AQE hides it pre-run
    assert_no_cartesian(df)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 100
    ).select("doc_id")
    pf = pushed_filters(df)
    assert any("doc_id" in p for p in pf), explain_str(df)[:1500]


def test_wave_schedule_single_digit_exchanges(spark, sf_dir):
    """The flagship wave plan: anti-join + window + TakeOrdered should cost
    a handful of exchanges, not a pile."""
    df = q.crawl_wave_schedule(spark, sf_dir)
    assert count_exchanges(df) <= 6, explain_str(df, "simple")[:2000]
    assert_no_cartesian(df)
    assert "TakeOrderedAndProject" in explain_str(df, "simple")


def test_dedup_is_hash_agg_not_window(spark, sf_dir):
    """The frontier's URL dedup must compile to a (partial) hash aggregate —
    the per-url window variant was 13× slower at 500k urls."""
    from navi_spark.sources.datagen import generate_urls

    raw = generate_urls(spark, 1000, n_hosts=10, dirty=True,
                        with_children=False).select("url")
    dd = raw.groupBy("url").agg(F.count("*").alias("n"))
    plan = explain_str(dd, "simple")
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan


def test_broadcast_join_for_small_rules(spark):
    from navi_spark.operators.robots import filter_allowed, parsed_rules_table

    robots = spark.createDataFrame(
        [("h.test", "User-agent: *\nDisallow: /x\n", 0.0)],
        "host string, robots_txt string, crawl_delay_s double",
    )
    # hosts must VARY or Catalyst constant-folds the equi-join into a
    # filter + BroadcastNestedLoopJoin (a degenerate-test artifact)
    host = F.concat(F.lit("h"), (F.col("id") % 3).cast("string"), F.lit(".test"))
    cand = spark.range(1000).select(
        F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("id")).alias("url"),
        host.alias("host"),
    )
    # broadcast_rules=True is the explicit opt-in for known-small host
    # universes; the default leaves the choice to AQE (the rules relation
    # is unbounded at the design point and must not be force-broadcast)
    out = filter_allowed(cand, parsed_rules_table(robots), broadcast_rules=True)
    assert "BroadcastHashJoin" in explain_str(out, "simple")


def test_ngram_jaccard_candidate_path_no_shingle_selfjoin(spark):
    """The verify stage of minhash→verify must be candidate-pair-driven:
    NO join keyed on shingle_hash alone may appear in the plan (a hot
    boilerplate shingle would make such a join quadratic in its document
    frequency at 100 TB — the round-1 weak point). Every shingle join must
    be co-keyed on a document id."""
    import re

    from navi_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "common words here plus doc specific tail %d" % i)
         for i in range(20)],
        "doc_id long, text string",
    )
    sh = dedup.shingles_df(docs, "doc_id", "text", n=2)
    cand = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    out = dedup.ngram_jaccard_pairs(sh, threshold=0.0, candidates=cand)
    plan = explain_str(out, "simple")
    for m in re.finditer(
        r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\w*"
        r"(?:\s+\w+)?\s+\[([^\]]*)\], \[([^\]]*)\]", plan
    ):
        left = m.group(1)
        assert not ("shingle_hash" in left and "id" not in left), (
            "shingle-only self-join in candidate path:\n" + plan
        )
    # and the restriction is semantics-preserving: candidate-path results
    # equal the unrestricted path filtered to the candidate pairs
    unrestricted = dedup.ngram_jaccard_pairs(sh, threshold=0.0)
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in unrestricted.join(cand, ["id_a", "id_b"], "left_semi").collect()
    }
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in out.collect()
    }
    assert got == want


def test_neardup_pipelines_no_cartesian(spark, sf_dir):
    """The round-2 near-dup gates must keep their bucket-join shape: no
    cartesian/nested-loop joins anywhere in the minhash→verify or
    SRP-sketch embedding pipelines."""
    from navi_spark import queries as qmod

    reg = qmod.queries()
    for name in ("dedup_minhash_lsh", "dedup_embedding_cosine"):
        df = reg[name](spark, sf_dir)
        assert_no_cartesian(df)


def test_politeness_never_broadcasts_full_host_counts(spark):
    """`host_counts` has one row per host that ever fetched — unbounded at
    the 10^10-URL design point. The politeness join must broadcast ONLY the
    bounded at-cap host list (the anti-join side); the under-cap
    `_remaining` counts join stays a shuffled join (AQE may promote it at
    runtime while small, but the static plan must not pin a broadcast)."""
    from navi_spark.operators.frontier import politeness_open_rows

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        host = F.concat(F.lit("h"), (F.col("id") % 50).cast("string"))
        new = spark.range(1000).select(
            F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("id"))
            .alias("url"),
            host.alias("host"),
            F.lit(1.0).alias("rank"),
            F.lit(0).alias("depth"),
        )
        counts = spark.range(50).select(
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
            (F.col("id") % 7).cast("long").alias("successes"),
        )
        out = politeness_open_rows(new, counts, cap=5)
        plan = explain_str(out, "simple")
        # exactly one broadcast: the explicit hint on the at-cap host list
        n_bcast = plan.count("BroadcastHashJoin") + plan.count(
            "BroadcastNestedLoopJoin"
        )
        assert n_bcast == 1, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # and the semantics: at-cap hosts dropped, remaining annotated
        rows = out.collect()
        assert all(1 <= r["_remaining"] <= 5 for r in rows)
        hosts_kept = {r["host"] for r in rows}
        # hosts h5, h12, ... have successes in {5,6} >= cap → dropped
        assert not any(
            int(h[1:]) % 7 >= 5 for h in hosts_kept
        ), sorted(hosts_kept)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_phrase_prune_switches_literal_in_to_semi_join_above_cap(spark):
    """phrase_prune pushes ≤1k candidate ids as a literal IN (parquet
    row-group skipping); above 1k it must switch to a broadcast left-semi
    join — a 10k-literal IN bloats plan compile time with no extra
    skipping value (VERDICT r03 nit 2)."""
    from navi_spark.operators.ranker import PhraseIndex, phrase_prune

    pages = spark.range(3000).select(
        F.col("id").cast("string").alias("url"),
        F.lit("needle rare words").alias("text"),
    )
    pairs = spark.range(3000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.when(F.col("id") < 1500, "needle").otherwise("rare").alias("word"),
    )
    word_df = pairs.groupBy("word").agg(F.count("*").alias("df"))
    idx = PhraseIndex(pairs, word_df)

    dense = phrase_prune(pages, idx, ["needle"], id_col="url")
    plan_dense = explain_str(dense, "simple")
    assert "LeftSemi" in plan_dense and "Broadcast" in plan_dense, plan_dense
    assert dense.count() == 1500

    sparse = phrase_prune(pages, idx, ["rare"], id_col="url",
                          max_literal_in=2000)
    plan_sparse = explain_str(sparse, "simple")
    # no join at all: the ids are inlined as a literal membership predicate
    assert "Join" not in plan_sparse, plan_sparse
    assert "Filter" in plan_sparse, plan_sparse
    assert sparse.count() == 1500


def test_registry_covers_survey_ops_with_no_certification_window():
    """The exported registry is EXACTLY the driver-certified surface (the
    driver caps at 50 entries, so the registry holds 50 — no uncertified
    tail, no reordering machinery); every SURVEY-§2 operator code appears.
    Redundant alternates live in navi_spark.extra_queries, held to the same
    oracle protocol by tests/test_extra_queries.py."""
    from navi_spark import extra_queries as xq
    from navi_spark import queries as q

    names = list(q.queries())
    assert len(names) == 50
    assert not hasattr(q, "_DRIVER_PRIORITY")  # the window hack stays dead
    # one row per SURVEY op family across the two registries; rows rotate
    # between them round-to-round (VERDICT r04 item 4) so every alternate
    # eventually rides the driver gate, but the 50-row export stays exact
    both = names + list(xq.queries())
    survey_codes = {
        # crawler: C1/C2/C10/C11/C13/C18-C20/C22/C24 are certified through
        # the composed rows (crawl_engine_e2e, c21_recrawl_e2e,
        # crawl_wave_schedule) + pytest parity, per VERDICT r03
        "c3_", "c4_", "c5_", "c6_", "c7_", "c8_", "c9_", "c12_", "c14_",
        "c15_", "c16_", "c17_", "c21_", "c23_",
        "i1_", "i2_", "i3_", "i4_", "i5_", "i6_", "i8_",
        "r1_", "r2_", "r3_", "r5_", "r8_", "r10_", "r11_", "r12_", "r13_",
        "r14_", "q4_",
    }
    for code in survey_codes:
        assert any(n.startswith(code) for n in both), f"missing {code}"
    for family in ("crawl_wave_schedule", "crawl_engine_e2e",
                   "dedup_", "sim_", "mm_", "text_", "stream_", "ev_"):
        assert any(n.startswith(family) for n in names), f"missing {family}"
    # the round-3/5 rotations are inside the certified surface
    assert "r10_phrase_scan" in names and "text_langid" in names
    assert "i5_field_pivot" in names and "tpch_q3_shipping_priority" in names
    assert "c7_budget_topk_scale" in names  # web-scale k selection, r05
    # every extra is a redundant alternate of a certified family
    alternates = set(xq.queries())
    assert alternates == {
        "c21_recrawl_order", "c21_recrawl_changes",   # ⊂ c21_recrawl_e2e
        "r3_bm25f_fields", "r3_bm25f_overwrite_parity",  # R3 quirk twins
        "q4_suggestions",                             # ⊂ q4_suggestions_insert
        "ev_hourly_rollup",                           # ⊂ stream_hourly_rollup
        "tpch_q1_pricing_summary",                    # demo
        "r13_doc_count", "r14_ordered_multiget",      # rotated out r05
        "r5_candidate_union",                         # ⊂ r3_bm25, rotated r05
        "curate_corpus",                              # composed text/dedup ops
    }, alternates


def test_curate_corpus_one_pass_one_exchange(spark, sf_dir):
    """The composed curation pipeline (langid -> quality -> dedup ->
    tokens) must compute ALL per-doc features in one narrow pass — no
    joins between feature stages — with the fingerprint keep-first
    window as the plan's ONLY exchange, and the map-side
    WindowGroupLimit (partial top-1 per fingerprint) in front of it so
    duplicate rows are cut before they shuffle."""
    from navi_spark import extra_queries as xq

    df = xq.curate_corpus(spark, sf_dir)
    assert count_exchanges(df) == 1, explain_str(df)
    plan = explain_str(df)
    assert plan.count("WindowGroupLimit") >= 2, plan  # Partial + Final
    assert_no_cartesian(df)
    cols = scan_columns(df)
    # column pruning: only doc_id/text/n_chars leave the documents scan
    assert cols and all(len(c) <= 3 for c in cols), cols


def test_payload_validation_not_relocated_below_store_semi_join(spark):
    """The decode UDF must evaluate ONCE, on the semi-join-pruned sliver —
    left deterministic, Catalyst pushes _fail predicates through the fetch
    join and re-runs the decode over the FULL store scan (measured: 4M
    decodes for an 800k-attempt wave, the UDF twice in one plan). Guards
    the asNondeterministic pin on validate_payload_udf (fetch.py)."""
    from navi_spark.operators.fetch import validate_payload_udf
    from navi_spark.sources.datagen import generate_images

    img = generate_images(spark, 200, parts=2)
    keys = spark.range(50).select(
        F.format_string("img%010d", F.col("id") * 3).alias("image_id"))
    hit = img.join(F.broadcast(keys), on="image_id", how="left_semi")
    meta = hit.withColumn(
        "_fail",
        validate_payload_udf("image_id", "bytes", "fmt", "w", "h", "caption"),
    )
    # downstream predicate on the verdict — the pushdown bait. Since the
    # r06 generator restructure, generate_images contributes its own
    # ArrowEvalPython nodes (per-column Arrow UDFs), so the guard pins the
    # VALIDATE udf specifically: exactly one evaluation, and it sits above
    # the semi join (on the pruned sliver), never re-run below it.
    plan = (meta.filter(F.col("_fail").isNotNull())
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("validate_payload") == 1, plan
    assert plan.index("validate_payload") < plan.index("BroadcastHashJoin"), plan
