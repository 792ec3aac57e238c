"""Hot-host skew stress (north rule): a frontier where ONE host owns half
of all URLs must neither break crawl parity nor blow up wave wall time.

The salted two-level politeness window's promise (frontier.py): the salted
(host, salt) pre-window prunes each host to ≤ S·cap rows before the
per-host window, so a hot host never lands a whole-host sort in one
straggler task. At pytest scale the fixed per-wave overhead dominates
wall time, so the timing assertion is a loose catastrophic-regression
guard (≤ 4× the uniform universe); the sharp assertion is bit-exact
parity with the wave oracle under the 50%-hot-host distribution."""

from __future__ import annotations

import shutil
import tempfile
import time

from navi_spark.operators.frontier import CrawlConfig, CrawlEngine
from navi_spark.oracle import OracleConfig, crawl_oracle

N = 20_000
MAX_PAGES, CAP, WAVE = 400, 10, 200


def _universe(spark, hot_frac: float):
    """Synthetic single-wave web: no children, every payload fetchable."""
    web_rows, img_rows, urls = [], [], []
    n_hot = int(N * hot_frac)
    for i in range(N):
        host = "bighost.test" if i < n_hot else f"cold{i % 100}.test"
        u = f"https://{host}/p/{i}"
        urls.append(u)
        web_rows.append((u, f"im{i}", [], True))
        img_rows.append((f"im{i}", i + 1, f"caption {i}"))
    web = spark.createDataFrame(
        web_rows,
        "url string, image_id string, children array<string>, "
        "honors_304 boolean",
    ).cache()
    images = spark.createDataFrame(
        img_rows, "image_id string, phash long, caption string"
    ).cache()
    robots = spark.createDataFrame(
        [], "host string, robots_txt string, crawl_delay_s double"
    )
    web.count(), images.count()
    return web, images, robots, urls


def _run(spark, web, images, robots, seeds):
    workdir = tempfile.mkdtemp(prefix="navi-skew-")
    cfg = CrawlConfig(
        max_pages=MAX_PAGES, max_pages_per_domain=CAP, wave_budget=WAVE,
        n_host_partitions=4, salt_buckets=4, validate_payloads=False,
    )
    eng = CrawlEngine(spark, workdir, web, images, robots, cfg)
    try:
        eng.bootstrap(seeds)
        t0 = time.monotonic()
        eng.run(max_waves=10)
        wall = time.monotonic() - t0
        visit = [(r["wave_id"], r["url"]) for r in eng.visit_order().collect()]
        seen = {r["url"] for r in eng.seen().collect()}
        counts = {
            r["host"]: r["successes"]
            for r in eng.t["host_counts"].read().collect()
        }
        return wall, visit, seen, counts, eng.budget_consumed
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_hot_host_skew_parity_and_bounded_wall(spark):
    web_h, img_h, rob_h, urls_h = _universe(spark, hot_frac=0.5)
    web_u, img_u, rob_u, urls_u = _universe(spark, hot_frac=0.0)
    try:
        # untimed warmup pass (JIT + python workers) so neither timed run
        # pays cold-start
        _run(spark, web_u, img_u, rob_u, urls_u[:2000])

        wall_hot, visit, seen, counts, consumed = _run(
            spark, web_h, img_h, rob_h, urls_h
        )
        wall_uni, *_ = _run(spark, web_u, img_u, rob_u, urls_u)

        # bit-exact parity under extreme skew
        oweb = {u: (f"im{i}", []) for i, u in enumerate(urls_h)}
        oimg = {f"im{i}": (i + 1, f"caption {i}") for i in range(N)}
        ores = crawl_oracle(
            urls_h, oweb, oimg, {},
            OracleConfig(max_pages=MAX_PAGES, max_pages_per_domain=CAP,
                         wave_budget=WAVE),
        )
        assert visit == ores.visit_order
        assert seen == ores.seen
        assert counts == ores.host_counts
        assert consumed == ores.budget_consumed
        # the hot host is capped like any other — no over-serving
        assert counts["bighost.test"] == CAP

        # loose wall guard: the salted window must keep the hot-host wave
        # within a small factor of the uniform one (generous bound for the
        # shared-host noise; an unsalted whole-host window regression
        # shows up as a much larger blowup at real scale)
        assert wall_hot <= 4.0 * wall_uni + 2.0, (wall_hot, wall_uni)
    finally:
        for df in (web_h, img_h, web_u, img_u):
            df.unpersist()
