"""Migration apply/rollback semantics (S6/K4 — reference
sqlmanager.py:169-264: pending-diff, ordered apply, rollback-on-error,
applied-set recording)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from whakoom_webscrapper_spark import catalog, datagen, migrations
from whakoom_webscrapper_spark.functions import text as TXT
from whakoom_webscrapper_spark.plans import frontier as FP


@pytest.fixture(scope="module")
def mini_world(spark):
    d = tempfile.mkdtemp(prefix="mig_world_")
    datagen.write_world(spark, d, 200, 8, fanout=4, n_seeds=4, partitions=4)
    return d


def _crawl(spark, world, state, max_epochs, resume=False):
    cfg = FP.CrawlConfig(state_dir=state, world_dir=world, max_epochs=max_epochs,
                         frontier_partitions=4)
    FP.crawl(spark, cfg, resume=resume)
    return cfg


def _downgrade_to_v1(spark, state):
    """Simulate a state written by a v1 engine: strip the v2 column and
    stamp version 1 (what an old run on disk looks like)."""
    migrations._v2_down(spark, state)
    catalog.write_version(state, 1)
    # v1 engines had no migrations log
    p = migrations._applied_log_path(state)
    if os.path.exists(p):
        os.remove(p)


def test_fresh_state_is_latest_version(spark, mini_world):
    state = tempfile.mkdtemp(prefix="mig_state_") + "/s"
    _crawl(spark, mini_world, state, 3)
    assert catalog.read_version(state) == catalog.SCHEMA_VERSION
    pages = spark.read.parquet(f"{state}/pages")
    assert "caption_tokens" in pages.columns
    # natively-written values match the migration's backfill expression
    bad = pages.filter(
        F.col("caption_tokens") != TXT.token_count(F.col("caption")).cast("int")
    ).count()
    assert bad == 0


def test_v1_state_refuses_resume_then_migrates_then_resumes(spark, mini_world):
    full_state = tempfile.mkdtemp(prefix="mig_full_") + "/s"
    _crawl(spark, mini_world, full_state, 8)

    state = tempfile.mkdtemp(prefix="mig_part_") + "/s"
    _crawl(spark, mini_world, state, 3)
    _downgrade_to_v1(spark, state)

    # resume across the bump must fail fast (catalog.check_version)
    with pytest.raises(RuntimeError, match="migration"):
        _crawl(spark, mini_world, state, 8, resume=True)

    # pending-diff sees exactly v2; apply; idempotent re-apply is a no-op
    assert [m.version for m in migrations.pending_migrations(state)] == [2]
    assert migrations.migrate(spark, state) == [2]
    assert catalog.read_version(state) == 2
    assert migrations.migrate(spark, state) == []
    log = migrations.applied_migrations(state)
    assert [e["version"] for e in log] == [2]

    # backfilled column equals the recomputed expression
    pages = spark.read.parquet(f"{state}/pages")
    bad = pages.filter(
        F.col("caption_tokens") != TXT.token_count(F.col("caption")).cast("int")
    ).count()
    assert bad == 0

    # resume across the (now applied) bump → identical end state
    _crawl(spark, mini_world, state, 8, resume=True)

    def snap(s):
        seen = {(r["url"], r["status"])
                for r in spark.read.parquet(f"{s}/seen").collect()}
        pages = {(r["url"], r["fetch_epoch"], r["host_rank"], r["caption_tokens"])
                 for r in spark.read.parquet(f"{s}/pages")
                 .select("url", "fetch_epoch", "host_rank", "caption_tokens")
                 .collect()}
        return seen, pages

    assert snap(state) == snap(full_state)


def test_rollback_roundtrip(spark, mini_world):
    state = tempfile.mkdtemp(prefix="mig_rb_") + "/s"
    _crawl(spark, mini_world, state, 3)
    n = spark.read.parquet(f"{state}/pages").count()
    migrations.rollback(spark, state, to_version=1)
    assert catalog.read_version(state) == 1
    pages_v1 = spark.read.parquet(f"{state}/pages")
    assert "caption_tokens" not in pages_v1.columns
    assert pages_v1.count() == n
    migrations.migrate(spark, state)
    pages_v2 = spark.read.parquet(f"{state}/pages")
    assert "caption_tokens" in pages_v2.columns and pages_v2.count() == n


def test_failed_migration_leaves_original_intact(spark, mini_world):
    state = tempfile.mkdtemp(prefix="mig_fail_") + "/s"
    _crawl(spark, mini_world, state, 2)
    _downgrade_to_v1(spark, state)
    before = spark.read.parquet(f"{state}/pages").count()

    def boom(spark_, sd):  # fails before any swap
        raise RuntimeError("disk full")

    broken = dict(migrations.MIGRATIONS)
    broken[2] = migrations.Migration(2, "broken", boom, migrations._v2_down)
    orig = migrations.MIGRATIONS
    try:
        migrations.MIGRATIONS = broken
        with pytest.raises(RuntimeError, match="disk full"):
            migrations.migrate(spark, state)
    finally:
        migrations.MIGRATIONS = orig

    # original untouched, version unchanged, log empty → retry possible
    assert catalog.read_version(state) == 1
    assert spark.read.parquet(f"{state}/pages").count() == before
    assert migrations.applied_migrations(state) == []
    assert migrations.migrate(spark, state) == [2]
