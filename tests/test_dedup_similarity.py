"""Dedup + similarity operators vs pure-Python references."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from navi_spark.operators import dedup, similarity

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "completely different text about spark shuffles"),
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (4, "spark shuffles are completely different text about"),  # shuffled 2
    (5, "one two three four five six seven eight nine ten"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "id long, text string").cache()


def _py_shingles(text, n=3):
    ws = [w for w in "".join(
        c if c.isalpha() or c.isspace() else "" for c in text.lower()
    ).split() if w]
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def test_exact_dedup(docs_df):
    out = dedup.exact_dedup(docs_df, "id", "text").collect()
    ids = sorted(r["id"] for r in out)
    assert ids == [0, 1, 2, 4, 5]  # 3 is the exact dup of 0


def test_shingles_match_python(docs_df):
    sh = dedup.shingles_df(docs_df, "id", "text", n=3)
    counts = {
        r["id"]: r["n"]
        for r in sh.groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    for i, text in DOCS:
        assert counts.get(i, 0) == len(_py_shingles(text, 3)), i


def test_shingles_window_equals_join_form(spark, docs_df):
    """The no-shuffle sliding-window shingle builder is row-identical to
    the positional-join form on single-spaced text (the corpus contract),
    for several n."""
    for n in (2, 3, 4):
        a = {(r["id"], r["shingle_hash"])
             for r in dedup.shingles_df(docs_df, "id", "text", n=n).collect()}
        b = {(r["id"], r["shingle_hash"])
             for r in dedup.shingles_window_df(
                 docs_df, "id", "text", n=n).collect()}
        assert a == b, f"n={n}"
    # short/empty docs produce no shingles, not errors
    edge = spark.createDataFrame(
        [(0, "one two"), (1, ""), (2, "   "), (3, "a. b! c?")],
        "id long, text string",
    )
    rows = dedup.shingles_window_df(edge, "id", "text", n=3).collect()
    assert {r["id"] for r in rows} == {3}  # only "a b c" has 3 words


def test_minhash_corpus_path_single_exchange(spark, docs_df):
    """The corpus-scale minhash plan: docs pre-partitioned by id →
    sliding-window shingles → distinct → k-min aggregate. Catalyst must
    elide every exchange after the explicit repartition (HashPartitioning
    on id satisfies both the distinct's and the groupBy's clustering by
    the subset rule) — one shuffle of the raw docs total."""
    pre = docs_df.repartition(4, "id")
    sh = dedup.shingles_window_df(pre, "id", "text", n=3)
    sigs = dedup.minhash_signatures(sh, k=8)
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges == 1, plan
    # and the plan still computes the right thing
    sig_map = {r["id"]: tuple(r["sig"]) for r in sigs.collect()}
    assert sig_map[0] == sig_map[3]


def test_ngram_jaccard(docs_df):
    sh = dedup.shingles_df(docs_df, "id", "text", n=3).cache()
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(sh, threshold=0.4).collect()
    }
    a, b = _py_shingles(DOCS[0][1]), _py_shingles(DOCS[1][1])
    expected = len(a & b) / len(a | b)
    assert pairs[(0, 1)] == pytest.approx(expected)
    assert (0, 3) in pairs and pairs[(0, 3)] == pytest.approx(1.0)
    assert (0, 2) not in pairs


def test_minhash_lsh_finds_near_dups(docs_df):
    sh = dedup.shingles_df(docs_df, "id", "text", n=2).cache()
    sigs = dedup.minhash_signatures(sh, k=32).cache()
    # exact dups have identical signatures
    sig_map = {r["id"]: tuple(r["sig"]) for r in sigs.collect()}
    assert sig_map[0] == sig_map[3]
    # near-dups agree on most minhashes (Jaccard estimate)
    agree = np.mean([a == b for a, b in zip(sig_map[0], sig_map[1])])
    assert agree >= 0.5
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(sigs, bands=16, rows_per_band=2).collect()
    }
    assert (0, 3) in pairs
    assert (0, 1) in pairs  # near-dup lands in at least one shared band


def test_simhash_properties(docs_df):
    sims = {r["id"]: r["simhash"] for r in
            dedup.simhash64(docs_df, "id", "text").collect()}
    assert sims[0] == sims[3]  # identical text → identical simhash
    ham01 = bin((sims[0] ^ sims[1]) & (2**64 - 1)).count("1")
    ham02 = bin((sims[0] ^ sims[2]) & (2**64 - 1)).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs(
            spark_sims(docs_df), max_hamming=10
        ).collect()
    }
    assert pairs[(0, 3)] == 0


def spark_sims(docs_df):
    return dedup.simhash64(docs_df, "id", "text")


def test_brute_force_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    rows = emb.orderBy("vec_id").limit(20).collect()
    q = [float(x) for x in rows[0]["embedding"]]
    topk = similarity.brute_force_topk(emb, q, k=5).collect()
    # numpy reference over the full table
    all_rows = emb.collect()
    m = np.array([list(r["embedding"]) for r in all_rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in all_rows])
    qv = np.asarray(q)
    sims = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(-sims, ids))[:5]
    expected = [int(i) for _, i in order]
    assert [r["vec_id"] for r in topk] == expected
    assert topk[0]["vec_id"] == rows[0]["vec_id"]  # self is nearest
    assert topk[0]["cos_sim"] == pytest.approx(1.0)


def test_lsh_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    dim = len(emb.first()["embedding"])
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    exact = [r["vec_id"] for r in
             similarity.brute_force_topk(emb, q, k=5).collect()]
    approx = [r["vec_id"] for r in
              similarity.lsh_topk(emb, q, dim, k=5, n_bits=4,
                                  probe_hamming=2).collect()]
    # deterministic (seeded planes): 4 bits + 2-bit multiprobe covers 11/16
    # buckets → full recall on this fixture; the floor asserts ≥3 so a
    # plane-generation change degrades loudly rather than silently
    assert 3 in approx
    assert len(set(exact) & set(approx)) >= 3


def test_batched_knn(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    dim = len(emb.first()["embedding"])
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    )
    out = similarity.batched_knn(emb, queries, dim, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append((r["vec_id"], r["cos_sim"]))
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        assert len(rows) == 3
        top = max(rows, key=lambda t: t[1])
        assert top[0] == qid and top[1] == pytest.approx(1.0)


def test_ivf_topk_recall(spark, sf_dir):
    from navi_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    dim = len(emb.first()["embedding"])
    import pyspark.sql.functions as FF

    q = [float(x) for x in emb.filter(FF.col("vec_id") == 3).first()["embedding"]]
    exact = [r["vec_id"] for r in
             similarity.brute_force_topk(emb, q, k=5).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(emb, q, dim, k=5, n_cells=8, n_probe=4).collect()]
    # probing half the cells: the query's own vector must be found and
    # recall@5 should be substantial (deterministic, seeded quantizer)
    assert 3 in approx
    assert len(set(exact) & set(approx)) >= 2


def test_embedding_neardup_finds_planted_pairs(spark, sf_dir):
    """SRP-sketch blocked near-dup must recover every planted 1%-perturbed
    copy (cos ≈ 0.99995) and nothing else (natural max pairwise cosine in
    the synthetic embeddings is ≈ 0.51)."""
    import pyspark.sql.functions as F

    from navi_spark.operators.dedup import embedding_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 50
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    dups = e.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(F.array(F.col("e")[0] * 1.01),
                 F.expr("slice(e, 2, size(e) - 1)")).alias("e"),
    )
    allv = e.unionByName(dups)
    dim = len(allv.first()["e"])
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            allv, dim=dim, tau=0.99, n_bits=16, max_hamming=3,
            id_col="vec_id", vec_col="e",
        ).collect()
    }
    want = {(i, i + 10000) for i in range(50)}
    assert got == want


def test_simhash_pigeonhole_complete_across_hamming(spark, sf_dir):
    """Pigeonhole property: for ANY max_hamming, the blocked join must
    recover every pair the brute-force all-pairs scan finds at that
    distance (blocks are derived as max_hamming+1, so recall is
    structural, not probabilistic)."""
    import pyspark.sql.functions as F

    from navi_spark.operators import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    sims = dedup.simhash64(d, "doc_id", "text").cache()
    sims.count()
    a, b = sims.alias("a"), sims.alias("b")
    all_pairs = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .cache()
    )
    all_pairs.count()
    for h in (1, 4, 9, 15):
        brute = {
            (r["id_a"], r["id_b"])
            for r in all_pairs.filter(F.col("hamming") <= h).collect()
        }
        blocked = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_neardup_pairs(sims, max_hamming=h).collect()
        }
        assert blocked == brute, f"max_hamming={h}"
    sims.unpersist(), all_pairs.unpersist()


def test_simhash_single_block_max_hamming_zero(spark):
    """max_hamming=0 → a single 64-bit block; the (1<<64)-1 mask overflows
    LongType, so the block key must be the raw simhash (ADVICE r2). Pairs
    found must be exactly the equal-simhash pairs."""
    from navi_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "totally different words here"), (4, "alpha beta gamma")],
        "doc_id long, text string",
    )
    sims = dedup.simhash64(docs, "doc_id", "text")
    pairs = dedup.simhash_neardup_pairs(sims, max_hamming=0)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 4), (2, 4)}
    assert all(r["hamming"] == 0 for r in pairs.collect())
