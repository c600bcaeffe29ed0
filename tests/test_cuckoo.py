"""Cuckoo-filter invariants: no false negatives, bounded FPR, deletion,
merge-as-union, sharded ≡ monolith membership, distributed build ≡
local, and crawl-backend equivalence with the Bloom path (the north
rule's "Bloom/cuckoo URL-seen set" — SURVEY.md §1)."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from whakoom_webscrapper_spark.operators.cuckoo import (
    Cuckoo,
    ShardedCuckoo,
    add_keys_distributed,
    build_cuckoo,
    prefilter_maybe_seen,
)


def _keys(n, seed, lo=-(2**62), hi=2**62):
    return np.random.default_rng(seed).integers(lo, hi, n, dtype=np.int64)


def test_no_false_negatives():
    c = Cuckoo.sized_for(10_000)
    keys = np.unique(_keys(10_000, 1))
    c.add_many(keys)
    assert c.may_contain_many(keys).all()


def test_fpr_far_below_bloom_default():
    c = Cuckoo.sized_for(10_000)
    keys = np.unique(_keys(10_000, 2))
    c.add_many(keys)
    probe = _keys(200_000, 3)
    probe = probe[~np.isin(probe, keys)]
    fpr = c.may_contain_many(probe).mean()
    # 16-bit fp, 2 buckets x 4 slots: expected ~0.012%; assert well
    # under the Bloom default with slack for load variance
    assert fpr < 0.002


def test_insert_at_design_load():
    """Fill to 84% of slot capacity — bulk placement + eviction must
    succeed without overflowing the stash."""
    c = Cuckoo(1 << 12)  # 16384 slots
    keys = np.unique(_keys(20_000, 4))[: int(16384 * 0.84)]
    c.add_many(keys)
    assert c.may_contain_many(keys).all()
    assert len(c.stash_fp) <= 64


def test_delete_removes_membership():
    c = Cuckoo.sized_for(10_000)
    keys = np.unique(_keys(10_000, 5))
    c.add_many(keys)
    gone, kept = keys[: len(keys) // 2], keys[len(keys) // 2:]
    assert c.delete_many(gone).all()
    assert c.may_contain_many(kept).all()          # no collateral FNs
    # deleted keys drop to the false-positive floor, not to "all true"
    assert c.may_contain_many(gone).mean() < 0.01


def test_delete_then_reinsert_roundtrip():
    c = Cuckoo.sized_for(1_000)
    keys = np.unique(_keys(1_000, 6))
    c.add_many(keys)
    assert c.delete_many(keys).all()
    c.add_many(keys)
    assert c.may_contain_many(keys).all()


def test_merge_is_union():
    a, b = Cuckoo(1 << 12), Cuckoo(1 << 12)
    ka, kb = np.arange(2_000, dtype=np.int64), np.arange(2_000, 4_000, dtype=np.int64)
    a.add_many(ka)
    b.add_many(kb)
    a.merge(b)
    assert a.may_contain_many(ka).all() and a.may_contain_many(kb).all()


def test_roundtrip_bytes():
    c = Cuckoo.sized_for(5_000)
    keys = np.unique(_keys(5_000, 7))
    c.add_many(keys)
    c2 = Cuckoo.from_bytes(c.to_bytes(), c.n_buckets)
    assert (c2.table == c.table).all()
    assert c2.may_contain_many(keys).all()


def test_serialize_with_stash_refuses():
    c = Cuckoo(1 << 4)
    c.stash_fp, c.stash_bucket = [7], [3]
    with pytest.raises(ValueError):
        c.to_bytes()


def test_overload_raises():
    c = Cuckoo(1 << 4)  # 64 slots
    with pytest.raises(RuntimeError):
        c.add_many(np.arange(4_000, dtype=np.int64))


def test_sharded_membership_equals_monolith():
    keys = np.unique(_keys(20_000, 8))
    probe = _keys(20_000, 9)
    mono = Cuckoo.sized_for(20_000)
    mono.add_many(keys)
    sharded = ShardedCuckoo.sized_for(20_000, n_shards=8)
    sharded.add_many(keys)
    assert sharded.may_contain_many(keys).all()
    # shards hash disjoint key populations — FPR profile equivalent
    assert abs(sharded.may_contain_many(probe).mean()
               - mono.may_contain_many(probe).mean()) < 0.002


def test_sharded_negative_keys_route_consistently():
    keys = np.array([-1, -17, -(2**61), 5, 0], dtype=np.int64)
    s = ShardedCuckoo.sized_for(1_000, n_shards=16)
    s.add_many(keys)
    assert s.may_contain_many(keys).all()
    assert s.delete_many(keys).all()


def test_distributed_build_matches_local(spark):
    keys = np.unique(_keys(30_000, 10))
    df = spark.createDataFrame(
        [(int(k),) for k in keys], "url_hash long").repartition(8)
    template = ShardedCuckoo.sized_for(30_000, n_shards=4)
    dist = build_cuckoo(df, "url_hash", template)
    local = ShardedCuckoo.sized_for(30_000, n_shards=4)
    local.add_many(keys)
    # merge is re-insert (slot layout may differ) — equivalence is on
    # membership: zero false negatives both, FPR floor both
    assert dist.may_contain_many(keys).all()
    probe = _keys(100_000, 11)
    probe = probe[~np.isin(probe, keys)]
    assert dist.may_contain_many(probe).mean() < 0.002
    assert local.may_contain_many(probe).mean() < 0.002


def test_incremental_distributed_fold_matches_rebuild(spark):
    k1, k2 = np.unique(_keys(10_000, 12)), np.unique(_keys(10_000, 13))
    template = ShardedCuckoo.sized_for(40_000, n_shards=4)
    df1 = spark.createDataFrame([(int(k),) for k in k1], "url_hash long")
    df2 = spark.createDataFrame([(int(k),) for k in k2], "url_hash long")
    filt = build_cuckoo(df1, "url_hash", template)
    add_keys_distributed(filt, df2, "url_hash")
    assert filt.may_contain_many(k1).all() and filt.may_contain_many(k2).all()


def test_distributed_delete_matches_driver_delete(spark):
    """delete_keys_distributed ≡ delete_many on the driver: same found
    count, identical post-delete membership on kept keys, deleted keys
    gone (no colliding-fp keeper in this keyspace) — the fold that
    replaced the O(|batch|) Row collect in re-crawl invalidation."""
    from whakoom_webscrapper_spark.operators.cuckoo import (
        delete_keys_distributed,
    )

    keys = np.unique(_keys(30_000, 15))
    dele, keep = keys[: len(keys) // 2], keys[len(keys) // 2:]
    a = ShardedCuckoo.sized_for(30_000, n_shards=4)
    a.add_many(keys)
    b = ShardedCuckoo.sized_for(30_000, n_shards=4)
    b.add_many(keys)

    df = spark.createDataFrame(
        [(int(k),) for k in dele], "url_hash long").repartition(8)
    found_dist, total = delete_keys_distributed(a, df, "url_hash")
    found_drv = int(b.delete_many(dele).sum())
    assert total == len(dele)
    assert found_dist == found_drv == len(dele)
    # bit-for-bit identical membership answers on both populations
    probe = np.concatenate([dele, keep, _keys(20_000, 16)])
    assert (a.may_contain_many(probe) == b.may_contain_many(probe)).all()
    assert a.may_contain_many(keep).all()


def test_prefilter_split_is_exact_partition(spark):
    keys = np.unique(_keys(5_000, 14))
    filt = ShardedCuckoo.sized_for(5_000, n_shards=4)
    filt.add_many(keys[:2_500])
    df = spark.createDataFrame([(int(k),) for k in keys], "url_hash long")
    new, maybe = prefilter_maybe_seen(df, "url_hash", filt, spark)
    n_new, n_maybe = new.count(), maybe.count()
    assert n_new + n_maybe == len(keys)
    # every inserted key must land in maybe_seen (no false negatives)
    inserted = {int(k) for k in keys[:2_500]}
    got = {r.url_hash for r in maybe.collect()}
    assert inserted <= got


def test_crawl_with_cuckoo_matches_bloom_backend(spark):
    """Same world, seen_filter='cuckoo' vs 'bloom': identical pages
    fetched and identical seen membership — the approximate filter is a
    prefilter only, so the backend must never change crawl results."""
    from whakoom_webscrapper_spark import datagen
    from whakoom_webscrapper_spark.plans import frontier as FP

    world = tempfile.mkdtemp(prefix="ck_world_")
    datagen.write_world(spark, world, 200, 8, fanout=5, n_seeds=4,
                        partitions=4)
    results = {}
    for backend in ("bloom", "cuckoo"):
        d = tempfile.mkdtemp(prefix=f"ck_state_{backend}_")
        cfg = FP.CrawlConfig(state_dir=d, world_dir=world, max_epochs=12,
                             frontier_partitions=4, seen_filter=backend)
        FP.crawl(spark, cfg)
        pages = spark.read.parquet(f"{d}/pages")
        seen = spark.read.parquet(f"{d}/seen")
        results[backend] = (
            {r.url for r in pages.select("url").collect()},
            {r.url_hash for r in seen.select("url_hash").collect()},
        )
    assert results["bloom"][0] == results["cuckoo"][0]
    assert results["bloom"][1] == results["cuckoo"][1]
