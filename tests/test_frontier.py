"""Crawl parity vs the Python oracle + snapshot resume (north rule).

Asserts bit-equal visit order, URL-seen set, per-host politeness counts and
budget between the distributed engine and `navi_spark.oracle` on the same
seed list + politeness budget, plus kill-and-resume equivalence from the
snapshot checkpoint (SURVEY.md §5).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from navi_spark.operators.frontier import CrawlConfig, CrawlEngine
from navi_spark.oracle import OracleConfig, build_oracle_inputs, crawl_oracle
from navi_spark.sources.datagen import (
    generate_images,
    generate_robots,
    generate_seeds,
    generate_web,
)

N_URLS, N_HOSTS = 300, 12
MAX_PAGES, CAP, WAVE = 30, 3, 12


@pytest.fixture(scope="module")
def universe(spark):
    web = generate_web(spark, N_URLS, N_HOSTS).cache()
    images = generate_images(spark, N_URLS).cache()
    robots = generate_robots(spark, N_HOSTS)
    seeds = generate_seeds(6, N_URLS, N_HOSTS)
    web.count(), images.count()
    yield web, images, robots, seeds
    web.unpersist(), images.unpersist()


@pytest.fixture(scope="module")
def oracle_result():
    oweb, oimages, orobots = build_oracle_inputs(N_URLS, N_HOSTS)
    cfg = OracleConfig(
        max_pages=MAX_PAGES, max_pages_per_domain=CAP, wave_budget=WAVE
    )
    return crawl_oracle(
        generate_seeds(6, N_URLS, N_HOSTS), oweb, oimages, orobots, cfg
    )


def _mk_engine(spark, universe, workdir, **kw):
    web, images, robots, seeds = universe
    cfg = CrawlConfig(
        max_pages=MAX_PAGES, max_pages_per_domain=CAP, wave_budget=WAVE,
        n_host_partitions=4, salt_buckets=2, **kw,
    )
    return CrawlEngine(spark, workdir, web, images, robots, cfg), seeds


def _engine_state(eng):
    visit = [(r["wave_id"], r["url"]) for r in eng.visit_order().collect()]
    seen = {r["url"] for r in eng.seen().collect()}
    counts = {
        r["host"]: r["successes"] for r in eng.t["host_counts"].read().collect()
    }
    return visit, seen, counts


@pytest.fixture(scope="module")
def std_run(spark, universe):
    """One full engine run shared by the read-only assertions."""
    workdir = tempfile.mkdtemp(prefix="navi-par-")
    eng, seeds = _mk_engine(spark, universe, workdir)
    eng.bootstrap(seeds)
    eng.run(max_waves=30)
    yield eng
    shutil.rmtree(workdir, ignore_errors=True)


def test_wave_parity(std_run, oracle_result):
    visit, seen, counts = _engine_state(std_run)
    assert visit == oracle_result.visit_order
    assert seen == oracle_result.seen
    assert counts == oracle_result.host_counts
    assert std_run.budget_consumed == oracle_result.budget_consumed


def test_index_feed_contract(std_run, oracle_result):
    """Indexer handoff (C24): (url, image_id, phash, caption) rows match."""
    feed = {
        (r["url"], r["image_id"], r["phash"], r["caption"])
        for r in std_run.index_feed().collect()
    }
    expected = {
        (p["url"], p["image_id"], p["phash"], p["caption"])
        for p in oracle_result.pages
    }
    assert feed == expected


def test_lineage_and_metrics_written(std_run):
    lin = std_run.t["lineage"].read()
    met = std_run.t["metrics"].read()
    assert lin.count() > 0 and met.count() > 0
    waves = {r["wave_id"] for r in met.select("wave_id").collect()}
    assert waves == set(range(1, std_run.wave_id + 1))
    total_fetched = sum(r["fetched"] for r in lin.collect())
    assert total_fetched == std_run.pages().count()


def test_resume_equivalence(spark, universe, oracle_result):
    """Kill after wave 2, resume from the snapshot checkpoint, finish —
    final state identical to the uninterrupted run (north rule)."""
    workdir = tempfile.mkdtemp(prefix="navi-res-")
    try:
        eng, seeds = _mk_engine(spark, universe, workdir)
        eng.bootstrap(seeds)
        eng.run(max_waves=2)  # "crash" here
        pages_head = eng.t["pages"].snapshot_id()

        eng2, _ = _mk_engine(spark, universe, workdir)
        eng2.resume()
        assert eng2.wave_id == 2
        assert eng2.t["pages"].snapshot_id() == pages_head
        eng2.run(max_waves=30)
        visit, seen, counts = _engine_state(eng2)
        assert visit == oracle_result.visit_order
        assert seen == oracle_result.seen
        assert counts == oracle_result.host_counts
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_no_bloom_same_result(spark, universe, oracle_result):
    """Bloom is a pure pre-filter: disabling it must not change anything."""
    workdir = tempfile.mkdtemp(prefix="navi-nb-")
    try:
        eng, seeds = _mk_engine(spark, universe, workdir, use_bloom=False)
        eng.bootstrap(seeds)
        eng.run(max_waves=30)
        visit, seen, _ = _engine_state(eng)
        assert visit == oracle_result.visit_order
        assert seen == oracle_result.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_sequential_heap_mode(spark, universe):
    """wave_budget=1 = the reference's exact sequential min-heap pop order."""
    workdir = tempfile.mkdtemp(prefix="navi-seq-")
    try:
        web, images, robots, seeds = universe
        cfg = CrawlConfig(
            max_pages=4, max_pages_per_domain=3, wave_budget=1,
            n_host_partitions=4, salt_buckets=2,
        )
        eng = CrawlEngine(spark, workdir, web, images, robots, cfg)
        eng.bootstrap(seeds)
        eng.run(max_waves=40)

        oweb, oimages, orobots = build_oracle_inputs(N_URLS, N_HOSTS)
        ocfg = OracleConfig(max_pages=4, max_pages_per_domain=3, wave_budget=1)
        ores = crawl_oracle(seeds, oweb, oimages, orobots, ocfg)
        visit, seen, _ = _engine_state(eng)
        assert visit == ores.visit_order
        assert seen == ores.seen
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
