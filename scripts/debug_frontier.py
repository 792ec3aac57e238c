"""Manual parity driver: engine vs oracle on a small universe."""

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from navi_spark.operators.frontier import CrawlConfig, CrawlEngine
from navi_spark.oracle import OracleConfig, build_oracle_inputs, crawl_oracle
from navi_spark.sources.datagen import (
    generate_images,
    generate_robots,
    generate_seeds,
    generate_web,
)

N_URLS, N_HOSTS = 300, 12
CAP, MAX_PAGES, WAVE = 3, 40, 7

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "4g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

seeds = generate_seeds(6, N_URLS, N_HOSTS)
web = generate_web(spark, N_URLS, N_HOSTS).cache()
images = generate_images(spark, N_URLS).cache()
robots = generate_robots(spark, N_HOSTS)

workdir = tempfile.mkdtemp(prefix="navi-frontier-")
cfg = CrawlConfig(
    max_pages=MAX_PAGES, max_pages_per_domain=CAP, wave_budget=WAVE,
    n_host_partitions=4, salt_buckets=2,
)
eng = CrawlEngine(spark, workdir, web, images, robots, cfg)
eng.bootstrap(seeds)
stats = eng.run(max_waves=30)
for s in stats:
    print(s)

ocfg = OracleConfig(max_pages=MAX_PAGES, max_pages_per_domain=CAP, wave_budget=WAVE)
oweb, oimages, orobots = build_oracle_inputs(N_URLS, N_HOSTS)
ores = crawl_oracle(seeds, oweb, oimages, orobots, ocfg)

evisit = [(r["wave_id"], r["url"]) for r in eng.visit_order().collect()]
print("engine pages:", len(evisit), "oracle pages:", len(ores.visit_order))
print("budget engine:", eng.budget_consumed, "oracle:", ores.budget_consumed)
eseen = {r["url"] for r in eng.seen().collect()}
print("seen equal:", eseen == ores.seen)
if eseen != ores.seen:
    print("engine-only:", sorted(eseen - ores.seen)[:10])
    print("oracle-only:", sorted(ores.seen - eseen)[:10])
mism = [i for i, (a, b) in enumerate(zip(evisit, ores.visit_order)) if a != b]
print("visit order equal:", evisit == ores.visit_order,
      ("first mismatch: " + str((mism[0], evisit[mism[0]], ores.visit_order[mism[0]])))
      if mism else "")
ecounts = {r["host"]: r["successes"] for r in eng.t["host_counts"].read().collect()}
print("host_counts equal:", ecounts == ores.host_counts)
shutil.rmtree(workdir)
spark.stop()
