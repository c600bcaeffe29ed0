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


def test_ledger_only_mode_converges_like_live_delete(spark, world, crawled):
    """Bulk invalidation path: above max_live_delete the cuckoo keeps the
    revoked keys (over-approximate, like Bloom) and only the ledger
    records the revocation. The EFFECTIVE seen membership and the
    resumed re-crawl must be identical to live-delete mode — the filter
    is a prefilter, never the correctness mechanism."""
    cfg = crawled
    urls = _some_fetched(spark, cfg)
    urls_df = spark.createDataFrame([(u,) for u in urls], ["url"])
    hashes = np.array(
        [
            r["url_hash"]
            for r in FP.make_frontier_rows(urls_df, cfg, 0, 0)
            .select("url_hash").collect()
        ],
        dtype=np.int64,
    )
    filt = CK.build_cuckoo(
        FP.read_seen(spark, cfg), "url_hash",
        CK.ShardedCuckoo.sized_for(cfg.bloom_capacity, cfg.bloom_fpr,
                                   cfg.bloom_shards),
    )
    before = _membership(spark, cfg)
    res = FP.invalidate_urls(spark, cfg, urls_df, filt=filt,
                             max_live_delete=0)
    assert res["invalidated"] == len(urls)
    assert res["filter"] == "ledger_only"
    # filter over-approximates (keys still present) …
    assert filt.may_contain_many(hashes).all()
    # … but the effective view lost them regardless — same as live mode
    eff = {r["url"] for r in FP.read_seen(spark, cfg).collect()}
    assert set(urls).isdisjoint(eff)

    # resume re-fetches exactly the invalidated URLs and membership
    # converges back — identical end state to the live-delete roundtrip
    cfg2 = FP.CrawlConfig(state_dir=cfg.state_dir, world_dir=world,
                          max_epochs=100, frontier_partitions=8,
                          seen_filter="cuckoo")
    result = FP.crawl(spark, cfg2, resume=True)
    assert result["total_fetched"] == len(urls)
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


def test_invalidate_propagates_to_ann_index(spark, crawled, capsys):
    """--ann-index closes the r4 gap 'invalidation does not propagate to
    the persisted ANN index': one jobs/invalidate.py pass revokes the
    URLs from the crawl's seen set AND tombstones their vectors, so a
    re-crawled page's stale embedding stops serving immediately —
    rebuild-free (the compaction story lives in jobs/ann.py)."""
    import ann as ann_job
    import invalidate as inv_job

    from tests.conftest import run_job
    from whakoom_webscrapper_spark.operators.fetch import page_id

    cfg = crawled
    d = tempfile.mkdtemp(prefix="inv_ann_")
    pages = (
        spark.read.parquet(f"{cfg.state_dir}/pages")
        .filter(F.col("embedding").isNotNull())
        .dropDuplicates(["page_id"])
    )
    run_job(
        ann_job,
        ["build", "--input", f"{cfg.state_dir}/pages", "--out", f"{d}/ix",
         "--id-col", "page_id", "--n-centroids", "16"],
        capsys,
    )
    victims = [r["url"] for r in pages.select("url").orderBy("url")
               .limit(3).collect()]
    vic_ids = {
        r["pid"]
        for r in spark.createDataFrame([(u,) for u in victims], ["url"])
        .select(page_id(F.col("url")).alias("pid")).collect()
    }
    # the victims' own vectors are their exact top-1 — the sharpest probe
    pages.filter(F.col("page_id").isin(vic_ids)).select(
        F.col("page_id").alias("query_id"), "embedding"
    ).write.parquet(f"{d}/q")

    with open(f"{d}/urls.txt", "w") as fh:
        fh.write("\n".join(victims))
    res = run_job(
        inv_job,
        ["--out", cfg.state_dir, "--urls", f"{d}/urls.txt",
         "--ann-index", f"{d}/ix"],
        capsys,
    )
    assert res["invalidated"] == len(victims)
    assert res["ann"]["revoked"] == len(vic_ids)

    run_job(
        ann_job,
        ["query", "--index", f"{d}/ix", "--queries", f"{d}/q",
         "--k", "3", "--nprobe", "4", "--id-col", "page_id",
         "--out", f"{d}/hits"],
        capsys,
    )
    served = {r["page_id"] for r in spark.read.parquet(f"{d}/hits").collect()}
    assert served.isdisjoint(vic_ids)
    assert served  # neighbors still serve
