"""Re-crawl invalidation (plans/frontier.invalidate_urls): the deletion
use-case the cuckoo seen-set backend exists for. Reference parity gap
being closed: Scrapy's dupefilter has no per-URL removal — re-crawling
means restarting the spider with dont_filter (SURVEY.md §2.4 J1).

Invariants pinned here:
- invalidated URLs leave the EFFECTIVE seen view but the append-only
  seen partitions are never rewritten
- crawl(resume=True) re-fetches exactly the invalidated URLs and the
  effective (url, status) membership converges back to the pre-
  invalidation set — re-crawl is idempotent on the world
- a live cuckoo filter drops the keys in place (no rebuild); Bloom
  reports rebuild_required
- never-seen URLs and double invalidations are no-ops (the cuckoo
  delete contract forbids deleting absent keys)
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from whakoom_webscrapper_spark import datagen
from whakoom_webscrapper_spark.operators import cuckoo as CK
from whakoom_webscrapper_spark.operators.bloom import ShardedBloom, build_bloom
from whakoom_webscrapper_spark.plans import frontier as FP

N_URLS, N_HOSTS, FANOUT, N_SEEDS = 200, 8, 5, 4


@pytest.fixture(scope="module")
def world(spark):
    d = tempfile.mkdtemp(prefix="inv_world_")
    datagen.write_world(
        spark, d, N_URLS, N_HOSTS, fanout=FANOUT, n_seeds=N_SEEDS, partitions=8
    )
    return d


@pytest.fixture()
def crawled(spark, world):
    d = tempfile.mkdtemp(prefix="inv_state_")
    cfg = FP.CrawlConfig(state_dir=d, world_dir=world, max_epochs=40,
                         frontier_partitions=8, seen_filter="cuckoo")
    FP.crawl(spark, cfg)
    return cfg


def _membership(spark, cfg):
    seen = FP.read_seen(spark, cfg)
    return {(r["url"], r["status"]) for r in seen.collect()}


def _some_fetched(spark, cfg, n=5):
    return [
        r["url"]
        for r in spark.read.parquet(f"{cfg.state_dir}/pages")
        .select("url").distinct().orderBy("url").limit(n).collect()
    ]


def test_invalidate_recrawl_roundtrip(spark, world, crawled):
    cfg = crawled
    before = _membership(spark, cfg)
    urls = _some_fetched(spark, cfg)
    urls_df = spark.createDataFrame([(u,) for u in urls], ["url"])
    hashes = [
        r["url_hash"]
        for r in FP.make_frontier_rows(urls_df, cfg, 0, 0)
        .select("url_hash").collect()
    ]

    # live cuckoo filter rebuilt from effective seen, then deleted in place
    filt = CK.build_cuckoo(
        FP.read_seen(spark, cfg), "url_hash",
        CK.ShardedCuckoo.sized_for(cfg.bloom_capacity, cfg.bloom_fpr,
                                   cfg.bloom_shards),
    )
    assert filt.may_contain_many(np.array(hashes, dtype=np.int64)).all()
    res = FP.invalidate_urls(spark, cfg, urls_df, filt=filt)
    assert res["invalidated"] == len(urls)
    assert res["filter"] == f"deleted:{len(urls)}"
    # no false residues: the deleted keys are gone from the filter
    assert not filt.may_contain_many(np.array(hashes, dtype=np.int64)).any()

    # effective view lost them; the raw append-only partitions did not
    eff = {r["url"] for r in FP.read_seen(spark, cfg).collect()}
    raw = {r["url"] for r in FP.read_seen(spark, cfg, effective=False).collect()}
    assert set(urls).isdisjoint(eff)
    assert set(urls) <= raw

    # resume re-fetches exactly the invalidated URLs…
    cfg2 = FP.CrawlConfig(state_dir=cfg.state_dir, world_dir=world,
                          max_epochs=100, frontier_partitions=8,
                          seen_filter="cuckoo")
    result = FP.crawl(spark, cfg2, resume=True)
    assert result["total_fetched"] == len(urls)
    pages = spark.read.parquet(f"{cfg.state_dir}/pages")
    refetched = pages.groupBy("url").count().filter(F.col("count") >= 2)
    assert {r["url"] for r in refetched.collect()} == set(urls)
    # …and the effective membership converges back (re-crawl idempotent)
    assert _membership(spark, cfg) == before


def test_invalidate_never_seen_is_noop(spark, crawled):
    cfg = crawled
    urls_df = spark.createDataFrame(
        [("http://nowhere.example/page/99999",)], ["url"])
    res = FP.invalidate_urls(spark, cfg, urls_df)
    assert res == {"invalidated": 0, "revoked_epoch": res["revoked_epoch"],
                   "filter": "none"}


def test_double_invalidate_is_noop(spark, crawled):
    cfg = crawled
    urls = _some_fetched(spark, cfg, n=3)
    urls_df = spark.createDataFrame([(u,) for u in urls], ["url"])
    assert FP.invalidate_urls(spark, cfg, urls_df)["invalidated"] == len(urls)
    # second call: the hashes are no longer in the EFFECTIVE seen set, so
    # nothing is revoked twice (guards cuckoo double-delete)
    assert FP.invalidate_urls(spark, cfg, urls_df)["invalidated"] == 0


def test_compact_invalidations_preserves_effective_view(spark, crawled):
    import glob

    cfg = crawled
    urls = _some_fetched(spark, cfg, n=4)
    for u in urls:  # one ledger batch per call
        FP.invalidate_urls(spark, cfg, spark.createDataFrame([(u,)], ["url"]))
    batches = glob.glob(f"{cfg.state_dir}/invalidations/batch=*")
    assert len(batches) == len(urls)
    eff_before = _membership(spark, cfg)
    assert FP.compact_invalidations(spark, cfg) == len(urls)
    assert len(glob.glob(f"{cfg.state_dir}/invalidations/batch=*")) == 1
    assert _membership(spark, cfg) == eff_before
    # idempotent: a single batch is already compact
    assert FP.compact_invalidations(spark, cfg) == 0


def test_bloom_backend_reports_rebuild(spark, crawled):
    cfg = crawled
    urls = _some_fetched(spark, cfg, n=2)
    urls_df = spark.createDataFrame([(u,) for u in urls], ["url"])
    filt = build_bloom(
        FP.read_seen(spark, cfg), "url_hash",
        ShardedBloom.sized_for(cfg.bloom_capacity, cfg.bloom_fpr,
                               cfg.bloom_shards),
    )
    res = FP.invalidate_urls(spark, cfg, urls_df, filt=filt)
    assert res["invalidated"] == len(urls)
    assert res["filter"] == "rebuild_required"
