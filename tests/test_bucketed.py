"""Bucketed fetch-join fallback (beyond-broadcast path, docs/SCALE.md):
plan shape + end-to-end equivalence with the broadcast path."""

from __future__ import annotations

import re
import tempfile

import pytest
from pyspark.sql import functions as F

from whakoom_webscrapper_spark import datagen
from whakoom_webscrapper_spark.plans import frontier as FP
from whakoom_webscrapper_spark.sources import bucketed as B

N_URLS, N_HOSTS, FANOUT, N_SEEDS = 300, 10, 5, 4


@pytest.fixture(scope="module")
def bucketed_world(spark):
    d = tempfile.mkdtemp(prefix="bworld_")
    datagen.write_world(spark, d, N_URLS, N_HOSTS, fanout=FANOUT,
                        n_seeds=N_SEEDS, partitions=8)
    B.write_bucketed_world(spark, d, "lg_bkt_test", "im_bkt_test", n_buckets=8)
    return d


def test_bucketed_join_has_no_exchange_on_bucketed_side(spark, bucketed_world):
    """The whole point of the bucketed path: the (multi-TB at design
    point) bucketed side never shuffles — exactly one Exchange in the
    join plan, on the per-epoch admitted side."""
    lg = spark.table("lg_bkt_test")
    adm = (
        spark.read.parquet(f"{bucketed_world}/linkgraph")
        .select("url")
        .filter(F.col("url").endswith("0"))  # no limit: limit adds its own Exchange
    )
    plan = (
        adm.join(lg.hint("merge"), "url", "inner")
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "SortMergeJoin" in plan
    # formatted explain mentions each node twice (tree + detail): count
    # Exchange NODES via their "(n) Exchange" detail headers
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_crawl_matches_broadcast_crawl(spark, bucketed_world):
    base = tempfile.mkdtemp(prefix="bstate_")
    cfg_bc = FP.CrawlConfig(state_dir=f"{base}/bc", world_dir=bucketed_world,
                            max_epochs=6, frontier_partitions=8)
    FP.crawl(spark, cfg_bc)
    cfg_bk = FP.CrawlConfig(
        state_dir=f"{base}/bk", world_dir=bucketed_world, max_epochs=6,
        frontier_partitions=8, fetch_join="bucketed",
        bucketed_linkgraph="lg_bkt_test", bucketed_images="im_bkt_test",
    )
    FP.crawl(spark, cfg_bk)

    def snap(sd):
        seen = {(r["url"], r["status"])
                for r in spark.read.parquet(f"{sd}/seen").collect()}
        pages = {(r["fetch_epoch"], r["host"], r["host_rank"], r["url"])
                 for r in spark.read.parquet(f"{sd}/pages")
                 .select("fetch_epoch", "host", "host_rank", "url").collect()}
        return seen, pages

    assert snap(f"{base}/bk") == snap(f"{base}/bc")
    # validation ran on the bucketed path too
    pages = spark.read.parquet(f"{base}/bk/pages")
    assert pages.filter(~F.col("phash_match") | ~F.col("pixel_ok")).count() == 0
