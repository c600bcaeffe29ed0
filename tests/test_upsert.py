"""Upsert / MERGE-emulation tests (K1/K2/K4/K5 in SURVEY.md §2.2)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.operators import upsert as UP


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v", "status"])


def test_merge_upsert_updates_win(spark):
    target = _df(spark, [(1, "a", "pending"), (2, "b", "pending")])
    updates = _df(spark, [(2, "B", "completed"), (3, "c", "pending")])
    out = {(r["k"], r["v"], r["status"]) for r in UP.merge_upsert(
        target, updates, ["k"]).collect()}
    assert out == {(1, "a", "pending"), (2, "B", "completed"), (3, "c", "pending")}


def test_upsert_parquet_durable_and_idempotent(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="upsert_"), "t")
    UP.upsert_parquet(spark, path, _df(spark, [(1, "a", "s")]), ["k"])
    UP.upsert_parquet(spark, path, _df(spark, [(1, "A", "s2"), (2, "b", "s")]), ["k"])
    # re-apply the same updates: no change (idempotent writes, J2)
    UP.upsert_parquet(spark, path, _df(spark, [(1, "A", "s2")]), ["k"])
    out = {(r["k"], r["v"], r["status"]) for r in spark.read.parquet(path).collect()}
    assert out == {(1, "A", "s2"), (2, "b", "s")}


def test_status_rollup_update(spark):
    target = _df(spark, [(1, "a", "pending"), (2, "b", "pending"), (3, "c", "failed")])
    done = spark.createDataFrame([(1,), (3,)], ["k"])
    out = {(r["k"], r["status"]) for r in UP.status_rollup_update(
        target, done, "k").collect()}
    assert out == {(1, "completed"), (2, "pending"), (3, "completed")}


def test_name_routed_write_ops(spark):
    """S5 write side — the reference reaches INSERT_OR_UPDATE_LIST /
    UPDATE_LIST_STATUS by catalog name (queries/lists.sql:1-9,37-40 via
    pipelines.py:140-150); the engine routes the same names to the
    set-oriented operators."""
    from whakoom_webscrapper_spark import catalog

    target = spark.createDataFrame(
        [(1, 10, "O", 5.0, "1-URGENT")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    )
    updates = spark.createDataFrame(
        [(1, 10, "F", 6.0, "1-URGENT"), (2, 11, "O", 7.0, "3-MEDIUM")],
        target.columns,
    )
    merged = catalog.run_named_op("INSERT_OR_UPDATE_ORDERS", target, updates)
    out = {(r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
           for r in merged.collect()}
    assert out == {(1, "F", 6.0), (2, "O", 7.0)}

    done = spark.createDataFrame([(2,)], ["o_orderkey"])
    flipped = catalog.run_named_op("UPDATE_ORDER_STATUS", merged, done)
    out2 = {(r["o_orderkey"], r["o_orderstatus"]) for r in flipped.collect()}
    assert out2 == {(1, "F"), (2, "completed")}


def test_feed_export_json_roundtrip(spark):
    """K5 — `scrapy crawl -o lists.json` analog (settings.py:141)."""
    d = os.path.join(tempfile.mkdtemp(prefix="feed_"), "out")
    df = _df(spark, [(1, "a", "s"), (2, "b", "t")])
    df.write.json(d)
    back = spark.read.json(d)
    assert {(r["k"], r["v"], r["status"]) for r in back.collect()} == {
        (1, "a", "s"), (2, "b", "t")
    }


def test_upsert_parquet_recovers_half_swap(spark):
    """Crash between the two renames leaves the table only under
    __old_* — the next call must restore it, not treat the table as
    empty (ADVICE r2: the migrations analog of this bug lost the table)."""
    path = os.path.join(tempfile.mkdtemp(prefix="upsert_"), "t")
    UP.upsert_parquet(spark, path, _df(spark, [(1, "a", "s")]), ["k"])
    os.rename(path, f"{path}__old_deadbeef")  # simulate the crash window
    UP.upsert_parquet(spark, path, _df(spark, [(2, "b", "s")]), ["k"])
    out = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert out == {(1, "a"), (2, "b")}  # row 1 survived the crash


def test_snapshot_upsert_merge_and_time_travel(spark):
    tdir = os.path.join(tempfile.mkdtemp(prefix="snap_"), "t")
    g1 = UP.snapshot_upsert(spark, tdir, _df(spark, [(1, "a", "s")]), ["k"])
    g2 = UP.snapshot_upsert(
        spark, tdir, _df(spark, [(1, "A", "s2"), (2, "b", "s")]), ["k"]
    )
    live = {(r["k"], r["v"]) for r in UP.snapshot_read(spark, tdir).collect()}
    assert live == {(1, "A"), (2, "b")}
    # time travel to the first retained snapshot
    old = {(r["k"], r["v"]) for r in UP.snapshot_read(spark, tdir, at=g1).collect()}
    assert old == {(1, "a")}
    assert UP.snapshot_current(tdir).endswith(g2)


def test_snapshot_upsert_gc_keeps_bounded_history(spark):
    tdir = os.path.join(tempfile.mkdtemp(prefix="snap_"), "t")
    for i in range(5):
        UP.snapshot_upsert(
            spark, tdir, _df(spark, [(i, f"v{i}", "s")]), ["k"], keep_snapshots=2
        )
    gens = UP.snapshot_list(tdir)
    assert len(gens) == 2  # bounded history
    # live data still has all 5 keys (history GC never touches the merge)
    assert UP.snapshot_read(spark, tdir).count() == 5
    # gen numbers stay strictly increasing even after GC
    nums = [int(g.split("-")[1]) for g in gens]
    assert nums == sorted(nums) and len(set(nums)) == 2


def test_snapshot_pointer_crash_before_flip_is_invisible(spark):
    """An unreferenced gen dir (crash after data write, before pointer
    flip) must not change what readers see, and the next commit sweeps
    it via normal GC."""
    tdir = os.path.join(tempfile.mkdtemp(prefix="snap_"), "t")
    UP.snapshot_upsert(spark, tdir, _df(spark, [(1, "a", "s")]), ["k"])
    # simulate the orphan: data written, pointer never flipped
    orphan = os.path.join(tdir, "gen-000099-orphan00")
    _df(spark, [(9, "x", "s")]).write.parquet(orphan)
    assert {(r["k"],) for r in UP.snapshot_read(spark, tdir).select("k").collect()} == {(1,)}


def test_recover_swap_restores_newest_and_sweeps_leftovers(spark):
    """ADVICE r3: recovery must restore the NEWEST __old_* by mtime (an
    interrupted rmtree can leave a partially-deleted STALE __old_* beside
    the real predecessor) and sweep remaining __old_*/__tmp_* orphans."""
    import shutil
    import time

    base = tempfile.mkdtemp(prefix="recover_")
    path = os.path.join(base, "t")
    UP.upsert_parquet(spark, path, _df(spark, [(1, "a", "s")]), ["k"])

    # fabricate a crash: live dir renamed away, plus an OLDER stale __old_
    # (partial contents) and an orphaned __tmp_ from an interrupted swap
    stale = f"{path}__old_zzz"   # lexicographically LAST — the old bug
    os.makedirs(stale)           # picked it up front when sorted() chose
    open(os.path.join(stale, "part-junk.parquet"), "w").close()
    past = time.time() - 3600
    os.utime(stale, (past, past))
    orphan_tmp = f"{path}__tmp_dead"
    os.makedirs(orphan_tmp)
    os.rename(path, f"{path}__old_aaa")  # the REAL predecessor (newest)

    UP._recover_swap(path)
    assert {r["v"] for r in spark.read.parquet(path).collect()} == {"a"}
    assert not os.path.exists(stale)
    assert not os.path.exists(orphan_tmp)
    assert not os.path.exists(f"{path}__old_aaa")


def test_snapshot_upsert_conflict_raises(spark, monkeypatch):
    """ADVICE r3: a writer whose base snapshot was superseded mid-merge
    must fail loudly (SnapshotConflictError), not silently drop the other
    writer's commit. Emulated by injecting a competing commit between the
    victim's snapshot read and its pointer flip."""
    import pytest as _pytest

    t = os.path.join(tempfile.mkdtemp(prefix="snapconf_"), "tbl")
    UP.snapshot_upsert(spark, t, _df(spark, [(1, "a", "s")]), ["k"])

    orig = UP.merge_upsert
    fired = {}

    def sneaky(target, updates, keys, order=None):
        merged = orig(target, updates, keys, order)
        if not fired:
            fired["x"] = True
            UP.snapshot_upsert(
                spark, t, _df(spark, [(9, "z", "s")]), ["k"]
            )  # writer B lands while writer A is still merging
        return merged

    monkeypatch.setattr(UP, "merge_upsert", sneaky)
    with _pytest.raises(UP.SnapshotConflictError):
        UP.snapshot_upsert(spark, t, _df(spark, [(2, "b", "s")]), ["k"])
    # writer B's commit is intact; no orphaned gen dir from writer A
    assert {r["k"] for r in UP.snapshot_read(spark, t).collect()} == {1, 9}
