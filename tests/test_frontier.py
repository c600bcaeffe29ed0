"""Golden end-to-end + resume + invariant tests for the crawl engine
(SURVEY.md §5.2-5.3,5.6; correctness criteria from BASELINE.json:6:
identical per-host crawl ordering, identical URL-seen membership,
pixel/caption validation per row)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tests import golden_sim
from whakoom_webscrapper_spark import datagen
from whakoom_webscrapper_spark.plans import frontier as FP

N_URLS, N_HOSTS, FANOUT, N_SEEDS = 300, 10, 5, 4
MAX_EPOCHS = 30


@pytest.fixture(scope="module")
def world(spark):
    d = tempfile.mkdtemp(prefix="world_")
    datagen.write_world(
        spark, d, N_URLS, N_HOSTS, fanout=FANOUT, n_seeds=N_SEEDS, partitions=8
    )
    return d


@pytest.fixture(scope="module")
def crawl_result(spark, world):
    d = tempfile.mkdtemp(prefix="state_")
    cfg = FP.CrawlConfig(state_dir=d, world_dir=world, max_epochs=MAX_EPOCHS,
                         frontier_partitions=8)
    result = FP.crawl(spark, cfg)
    return cfg, result


def _sim():
    step = max(N_URLS // N_SEEDS, 1)
    seeds = [datagen.url_of((k * step) % N_URLS, N_HOSTS) for k in range(N_SEEDS)]
    return golden_sim.simulate(N_URLS, N_HOSTS, FANOUT, seeds, MAX_EPOCHS)


def test_url_seen_membership_matches_golden(spark, crawl_result):
    cfg, _ = crawl_result
    sim_seen, _ = _sim()
    engine = {
        (r["url"], r["status"])
        for r in spark.read.parquet(f"{cfg.state_dir}/seen").collect()
    }
    golden = set(sim_seen.items())
    assert engine == golden


def test_per_host_crawl_ordering_matches_golden(spark, crawl_result):
    cfg, _ = crawl_result
    _, sim_log = _sim()
    pages = spark.read.parquet(f"{cfg.state_dir}/pages")
    engine = sorted(
        (r["fetch_epoch"], r["host"], r["host_rank"], r["url"])
        for r in pages.select("fetch_epoch", "host", "host_rank", "url").collect()
    )
    assert engine == sorted(sim_log)


def test_pages_unique_and_validated(spark, crawl_result):
    cfg, _ = crawl_result
    pages = spark.read.parquet(f"{cfg.state_dir}/pages")
    n = pages.count()
    assert n > 0
    assert pages.select("image_id").distinct().count() == n
    assert pages.select("url_hash").distinct().count() == n
    bad = pages.filter(
        ~F.col("phash_match") | ~F.col("pixel_ok") | ~F.col("caption_match")
    ).count()
    assert bad == 0
    # lossy rows must clear the PSNR gate (BASELINE.json:15)
    assert pages.filter((F.col("fmt") == "jpeg") & (F.col("psnr_db") < 40)).count() == 0


def test_seen_unique(spark, crawl_result):
    cfg, _ = crawl_result
    seen = spark.read.parquet(f"{cfg.state_dir}/seen")
    assert seen.count() == seen.select("url_hash").distinct().count()


def test_lineage_committed_every_epoch(spark, crawl_result):
    cfg, result = crawl_result
    assert FP.committed_epochs(cfg) == list(range(result["epochs_run"]))
    lineage = spark.read.parquet(f"{cfg.state_dir}/lineage")
    fetched_by_lineage = lineage.agg(F.sum("rows_fetched")).collect()[0][0]
    assert fetched_by_lineage == result["total_fetched"]


def test_resume_matches_uninterrupted(spark, world, crawl_result):
    cfg_full, _ = crawl_result
    d = tempfile.mkdtemp(prefix="state_resume_")
    # run only 3 epochs, then resume to completion
    cfg = FP.CrawlConfig(state_dir=d, world_dir=world, max_epochs=3,
                         frontier_partitions=8)
    FP.crawl(spark, cfg)
    cfg2 = FP.CrawlConfig(state_dir=d, world_dir=world, max_epochs=MAX_EPOCHS,
                          frontier_partitions=8)
    FP.crawl(spark, cfg2, resume=True)

    def snapshot(state_dir):
        seen = {
            (r["url"], r["status"])
            for r in spark.read.parquet(f"{state_dir}/seen").collect()
        }
        pages = {
            (r["fetch_epoch"], r["host"], r["host_rank"], r["url"])
            for r in spark.read.parquet(f"{state_dir}/pages")
            .select("fetch_epoch", "host", "host_rank", "url")
            .collect()
        }
        return seen, pages

    assert snapshot(d) == snapshot(cfg_full.state_dir)


def test_budget_respected_per_host_per_epoch(spark, crawl_result):
    cfg, _ = crawl_result
    pages = spark.read.parquet(f"{cfg.state_dir}/pages")
    counts = (
        pages.groupBy("fetch_epoch", "host")
        .agg(F.max("host_rank").alias("max_rank"))
        .collect()
    )
    budgets = golden_sim.robots_of(N_HOSTS)
    for r in counts:
        assert r["max_rank"] <= budgets[r["host"]][0]


def test_disallowed_never_fetched(spark, crawl_result):
    cfg, _ = crawl_result
    pages = spark.read.parquet(f"{cfg.state_dir}/pages")
    robots = golden_sim.robots_of(N_HOSTS)
    for r in pages.select("host", "url").collect():
        assert not golden_sim._disallowed(r["url"], robots)
