"""Versioned state-directory migrations — S6/K4 in SURVEY.md §2.1/§2.2.

The reference scans ``migrations/*.sql``, splits each file into ``-- Up``
/ ``-- Down`` halves, computes the pending set against an applied-
migrations table, applies pending IN ORDER inside a transaction with
rollback-on-error, and records each applied version
(reference: sqlmanager.py:169-264, migrations/001_initial_schema.sql).

The engine's state is epoch-partitioned parquet, so a migration is a
Spark REWRITE JOB, not a DDL statement:

- each ``Migration`` carries ``version``, ``description``, and
  ``up(spark, state_dir)`` / ``down(spark, state_dir)`` callables;
- ``migrate`` computes pending = registry versions > current, applies
  ascending, bumps ``_meta/version.json`` and appends to
  ``_meta/migrations.json`` after EACH success (so a crash mid-sequence
  resumes exactly at the failed step — the applied prefix is durable);
- atomicity per step is write-new-then-swap (the same protocol as
  operators/upsert.py): the rewritten table lands in ``<table>__mig_tmp``
  and replaces the original with two renames; a crash before the swap
  leaves the original untouched and the tmp dir is garbage-collected on
  the next attempt. This is the Spark analog of the reference's
  transaction rollback (sqlmanager.py:249-264).

At 100 TB this is exactly how you want schema changes to happen: an
explicit, resumable, epoch-partition-preserving rewrite job — never an
implicit on-read patch.

Current history:

- v1: initial state layout (frontier/seen/pages/lineage).
- v2: ``pages`` gains ``caption_tokens int`` (whitespace token count of
  the caption — the text-stats column training-data consumers read).
  Fresh crawls write it natively; v1 states backfill via this migration.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whakoom_webscrapper_spark import catalog
from whakoom_webscrapper_spark.functions import text as TXT


@dataclass(frozen=True)
class Migration:
    version: int  # the version this migration upgrades TO
    description: str
    up: Callable[[SparkSession, str], None]
    down: Callable[[SparkSession, str], None]


def _swap_table(df: DataFrame, path: str, partition_col: str | None) -> None:
    """Write ``df`` next to ``path`` then swap directories (write-new-
    then-rename; crash-safe: the original survives any failure before
    the final rename)."""
    tmp = f"{path}__mig_tmp_{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)
    old = f"{path}__mig_old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def _gc_tmp_dirs(state_dir: str) -> None:
    """Remove leftovers of interrupted migration attempts.

    Crash-recovery invariant: if a crash landed between _swap_table's two
    renames, the ORIGINAL table exists only as ``<table>__mig_old_*`` —
    deleting it would be silent permanent loss (the next up() would see no
    table and record a vacuous success). So: restore any orphaned
    ``__mig_old_*`` whose base path is missing; only then GC."""
    for d in glob.glob(os.path.join(state_dir, "*__mig_old_*")):
        base = d.rsplit("__mig_old_", 1)[0]
        if not os.path.exists(base):
            os.rename(d, base)
    for d in glob.glob(os.path.join(state_dir, "*__mig_tmp_*")) + glob.glob(
        os.path.join(state_dir, "*__mig_old_*")
    ):
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# v2: pages gains caption_tokens (backfill = token_count(caption))
# ---------------------------------------------------------------------------
def _v2_up(spark: SparkSession, state_dir: str) -> None:
    pages_path = os.path.join(state_dir, "pages")
    if not os.path.exists(pages_path):
        return  # nothing fetched yet — vacuous upgrade
    pages = spark.read.parquet(pages_path)
    if "caption_tokens" in pages.columns:
        return  # already upgraded (idempotent re-apply)
    upgraded = pages.withColumn(
        "caption_tokens", TXT.token_count(F.col("caption")).cast("int")
    )
    _swap_table(upgraded, pages_path, "epoch")


def _v2_down(spark: SparkSession, state_dir: str) -> None:
    pages_path = os.path.join(state_dir, "pages")
    if not os.path.exists(pages_path):
        return
    pages = spark.read.parquet(pages_path)
    if "caption_tokens" not in pages.columns:
        return
    _swap_table(pages.drop("caption_tokens"), pages_path, "epoch")


MIGRATIONS: dict[int, Migration] = {
    2: Migration(
        version=2,
        description="pages: add caption_tokens int (backfilled token count)",
        up=_v2_up,
        down=_v2_down,
    ),
}


# ---------------------------------------------------------------------------
# Apply / rollback drivers
# ---------------------------------------------------------------------------
def _applied_log_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_meta", "migrations.json")


def applied_migrations(state_dir: str) -> list[dict]:
    p = _applied_log_path(state_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def _record_applied(state_dir: str, mig: Migration, direction: str) -> None:
    log = applied_migrations(state_dir)
    log.append(
        {
            "version": mig.version,
            "description": mig.description,
            "direction": direction,
        }
    )
    os.makedirs(os.path.join(state_dir, "_meta"), exist_ok=True)
    with open(_applied_log_path(state_dir), "w") as f:
        json.dump(log, f, indent=1)


def pending_migrations(state_dir: str, target: int | None = None) -> list[Migration]:
    """Registry versions above the state's current version, ascending —
    the reference's pending-diff (sqlmanager.py:197-234)."""
    target = catalog.SCHEMA_VERSION if target is None else target
    current = catalog.read_version(state_dir) or 1
    return [
        MIGRATIONS[v]
        for v in sorted(MIGRATIONS)
        if current < v <= target
    ]


def migrate(spark: SparkSession, state_dir: str, target: int | None = None) -> list[int]:
    """Apply pending migrations in order; returns applied versions.
    Each step: GC stale tmp dirs → up() (write-new-then-swap) → record
    in _meta/migrations.json → bump version.json. A failure leaves the
    state at the last durable version; re-running resumes there."""
    applied: list[int] = []
    for mig in pending_migrations(state_dir, target):
        _gc_tmp_dirs(state_dir)
        mig.up(spark, state_dir)
        _record_applied(state_dir, mig, "up")
        catalog.write_version(state_dir, mig.version)
        applied.append(mig.version)
    return applied


def rollback(spark: SparkSession, state_dir: str, to_version: int) -> list[int]:
    """Apply Down migrations from the current version back to
    ``to_version`` (exclusive), descending — the reference's -- Down
    half (sqlmanager.py:218-234)."""
    current = catalog.read_version(state_dir) or 1
    rolled: list[int] = []
    for v in sorted((v for v in MIGRATIONS if to_version < v <= current), reverse=True):
        mig = MIGRATIONS[v]
        _gc_tmp_dirs(state_dir)
        mig.down(spark, state_dir)
        _record_applied(state_dir, mig, "down")
        # stamp the next-LOWER registered version (not v-1): with a gapped
        # registry (e.g. v2 and v4) rolling back v4 must land on v2, never
        # on an undefined v3 that would corrupt later pending computations
        prev = max((u for u in MIGRATIONS if u < v), default=1)
        catalog.write_version(state_dir, max(prev, to_version))
        rolled.append(v)
    return rolled
