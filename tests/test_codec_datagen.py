"""Codec roundtrip + synthetic-data invariants (FIXTURES.md §§1-4)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from navi_spark.functions.urlnorm import normalize_url_py
from navi_spark.sources.codec import (
    decode_image,
    encode_image,
    make_pixels,
    phash64,
    psnr,
)
from navi_spark.sources.datagen import (
    canonical_url,
    children_of,
    dirty_url,
    generate_images,
    generate_robots,
    generate_seeds,
    generate_urls,
)


def test_png_lossless_roundtrip():
    px = make_pixels("img0000000042", 32, 64)
    assert (decode_image(encode_image(px, "png"), "png") == px).all()


def test_lossy_psnr_band():
    """The stub lossy codec must land in the >=40 dB band (input_hint)."""
    for i in range(30):
        px = make_pixels(f"img{i:010d}", 16 + 16 * (i % 4), 32)
        dec = decode_image(encode_image(px, "jpeg"), "jpeg")
        p = psnr(px, dec)
        assert p >= 40.0, (i, p)
        # phash nearly robust to the lossy path (threshold bits near the mean
        # can flip); dedup uses the stored source-pixel phash, not re-hash
        ham = bin((phash64(dec) ^ phash64(px)) & (2**64 - 1)).count("1")
        assert ham <= 4, (i, ham)


def test_phash_sign_and_stability():
    px = make_pixels("imgX", 64, 64)
    h = phash64(px)
    assert -(2**63) <= h < 2**63
    assert h == phash64(px.copy())


def test_images_table(spark):
    df = generate_images(spark, 300, parts=4).cache()
    assert df.count() == 300
    assert df.columns == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    # ~2% deliberate duplicates (i % 100 in {57, 83} duplicates i-50)
    dups = 300 - df.select("phash").distinct().count()
    assert dups >= 4  # residues 57,83,157,183,257,283 → 6 dup rows in 300
    # decode invariant on a sample: pixels match the seeded pattern
    rows = df.filter(F.col("image_id").isin("img0000000003", "img0000000057")).collect()
    for r in rows:
        dec = decode_image(bytes(r["bytes"]), r["fmt"])
        src = r["image_id"]
        if r["image_id"] == "img0000000057":
            src = "img0000000007"  # 57 ≡ 57 (mod 100) → duplicate of 7
        ref = make_pixels(r["image_id"], r["w"], r["h"],
                          dup_of=src if src != r["image_id"] else None)
        if r["fmt"] == "png":
            assert (dec == ref).all()
        else:
            assert psnr(ref, dec) >= 40.0
    df.unpersist()


def test_images_partition_independent(spark):
    a = generate_images(spark, 120, parts=2).orderBy("image_id").collect()
    b = generate_images(spark, 120, parts=5).orderBy("image_id").collect()
    assert [(r["image_id"], r["phash"], bytes(r["bytes"])) for r in a] == [
        (r["image_id"], r["phash"], bytes(r["bytes"])) for r in b
    ]


def test_dirty_urls_normalize_to_canonical():
    for i in range(0, 4000, 7):
        assert normalize_url_py(dirty_url(i, 50)) == canonical_url(i, 50), i


def test_children_deterministic_and_closed():
    n_urls, n_hosts = 1000, 20
    for i in (0, 13, 999):
        ch = children_of(i, n_urls, n_hosts)
        assert ch == children_of(i, n_urls, n_hosts)
        for c in ch:
            assert c.startswith("https://host")


def test_urls_table_skew(spark):
    df = generate_urls(spark, 4000, n_hosts=50, parts=4).cache()
    counts = {r["host"]: r["cnt"] for r in
              df.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    # Zipf-ish: hot host carries >5x the mean share
    assert counts["host0.test"] > 5 * (4000 / 50)
    df.unpersist()


def test_seeds_contain_duplicate_pair():
    seeds = generate_seeds(10, 5000, 50)
    norm = [normalize_url_py(s) for s in seeds]
    assert len(norm) != len(set(norm))  # ≥1 duplicate-after-normalization


def test_robots_coverage(spark):
    df = generate_robots(spark, 100)
    rows = {r["host"]: r for r in df.collect()}
    assert "host0.test" not in rows  # 404 hosts absent → allow-all default
    assert "Disallow: /p/1*" in rows["host5.test"]["robots_txt"]
    assert rows["host8.test"]["crawl_delay_s"] == pytest.approx(2.0)


def test_vectorized_kernels_match_scalar_oracles():
    """r06 generator restructure: the vectorized numpy/pandas URL kernels
    feeding the Arrow generators must stay element-wise identical to the
    scalar parity oracles (incl. the pow()-based host hash and every
    dirty-url variant)."""
    import numpy as np

    from navi_spark.sources import datagen as dg

    idx = np.array(
        list(range(400)) + [999, 5_003, 77_777, 123_456, 999_999],
        dtype=np.int64,
    )
    hid_v = dg.host_id_for_vec(idx, 73)
    du = dg.dirty_url_vec(idx, 73)
    cu = dg.canonical_url_vec(idx, 73)
    ch = dg._children_lists(idx, 10_000, 73, dirty=True, extra_version=2)
    for p, i in enumerate(int(x) for x in idx):
        assert hid_v[p] == dg.host_id_for(i, 73), i
        assert du.iloc[p] == dg.dirty_url(i, 73), i
        assert cu.iloc[p] == dg.canonical_url(i, 73), i
        assert ch.iloc[p] == dg.web_children(i, 10_000, 73, 2), i


def test_generators_match_scalar_rows(spark):
    """r06 generator restructure: the per-column generate_images table is
    bit-identical to the _image_row scalar (bytes included), and the
    generate_web drift columns match web_image_id/honors semantics."""
    from navi_spark.functions.urlnorm import host_of_py
    from navi_spark.sources import datagen as dg

    got = sorted(dg.generate_images(spark, 160, parts=3).collect(),
                 key=lambda r: r["image_id"])
    for i in range(160):
        exp = dg._image_row(i)
        r = got[i]
        assert (r["image_id"], bytes(r["bytes"]), r["w"], r["h"], r["fmt"],
                r["caption"], r["phash"]) == exp, i
    rows = {r["url"]: r for r in dg.generate_web(spark, 500, 40,
                                                 version=1).collect()}
    for i in range(0, 500, 7):
        u = dg.canonical_url(i, 40)
        r = rows[u]
        assert r["image_id"] == dg.web_image_id(i, 500, 1), i
        assert list(r["children"]) == dg.web_children(i, 500, 40, 1), i
        assert r["honors_304"] == dg.host_supports_validators(
            host_of_py(u)), i
