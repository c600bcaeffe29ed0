"""Upsert (MERGE) emulation over Parquet — K1/K2 in SURVEY.md §2.2.

The reference upserts with ``INSERT ... ON CONFLICT (list_id) DO UPDATE``
(reference: queries/lists.sql:1-9, executed via pipelines.py:140-150) and
flips statuses with per-row UPDATEs (queries/lists.sql:37-40). On Iceberg
this is ``MERGE INTO``; the Parquet fallback here keeps the same
semantics two ways:

- ``merge_upsert``       eager rewrite: union + keep-latest-per-key
- ``upsert_parquet``     write-new-then-swap directory protocol (the
                         atomicity analog of the reference's
                         transaction+rollback, sqlmanager.py:249-264)

Both are set-oriented: one shuffle per merge regardless of row count —
replacing the reference's per-row connection-per-statement loop
(sqlmanager.py:135-139), which is the single biggest scalability fix the
engine makes to the write path.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order: list[Column] | None = None,
) -> DataFrame:
    """MERGE semantics as a DataFrame: rows from ``updates`` win over rows
    from ``target`` with the same key; unmatched rows pass through.
    ``order`` breaks ties among updates themselves (defaults to none —
    updates assumed unique per key, like the reference's single upsert)."""
    tagged = target.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    order = order or []
    w = Window.partitionBy(*keys).orderBy(F.desc("_src"), *order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def _recover_swap(path: str) -> None:
    """Crash-recovery for the rename-swap protocol: a crash between the
    two renames leaves the live table only under ``<path>__old_*`` —
    restore it before anything GCs or overwrites (same invariant as
    migrations._gc_tmp_dirs; ADVICE r2). The NEWEST ``__old_*`` by mtime
    is the real predecessor (an interrupted ``rmtree(ignore_errors)`` of
    an earlier swap can leave a partially-deleted stale ``__old_*``
    beside it — lexicographic order would resurrect that partial table;
    ADVICE r3). Leftover ``__old_*``/``__tmp_*`` dirs from interrupted
    swaps are swept here, so orphaned temp data cannot leak forever."""
    import glob

    olds = glob.glob(f"{path}__old_*")
    if not os.path.exists(path) and olds:
        newest = max(olds, key=os.path.getmtime)
        os.rename(newest, path)
        olds.remove(newest)
    if os.path.exists(path):
        # live table present → every __old_*/__tmp_* is garbage from an
        # interrupted swap (the committed data lives under `path`)
        for leftover in olds + glob.glob(f"{path}__tmp_*"):
            shutil.rmtree(leftover, ignore_errors=True)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order: list[Column] | None = None,
) -> None:
    """Durable upsert into a parquet directory: read-modify-write to a
    temp dir, then atomic-ish directory swap. Crash between write and
    swap leaves the original intact (write-new-then-rename, K4), and
    ``_recover_swap`` heals the half-swapped state on the next call.
    Local-FS protocol — on object stores use ``snapshot_upsert``, whose
    pointer flip is a single-object PUT instead of directory renames."""
    _recover_swap(path)
    if os.path.exists(path):
        merged = merge_upsert(spark.read.parquet(path), updates, keys, order)
    else:
        merged = updates
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


# ---------------------------------------------------------------------------
# Snapshot-pointer tables (Iceberg's metadata-pointer commit protocol in
# miniature — SURVEY §1/§4 map upserts to Iceberg MERGE INTO; no Iceberg
# runtime jar ships in this sandbox, so the engine carries the part of
# Iceberg that the crash-safety argument actually needs: immutable
# snapshot directories + one atomically-replaced pointer object. On S3/GCS
# the pointer flip is a single-object PUT — no directory rename anywhere,
# which is exactly what the rename-swap protocol above cannot offer.)
# ---------------------------------------------------------------------------
_CURRENT = "__CURRENT"


class SnapshotConflictError(RuntimeError):
    """Another writer committed between this merge's snapshot read and
    its pointer flip; the caller should re-read and retry the merge."""


def _pointer_file(table_dir: str) -> str:
    return os.path.join(table_dir, _CURRENT)


def snapshot_current(table_dir: str) -> str | None:
    """Resolve the live snapshot directory, or None for an empty table."""
    ptr = _pointer_file(table_dir)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    snap = os.path.join(table_dir, name)
    return snap if os.path.isdir(snap) else None


def snapshot_list(table_dir: str) -> list[str]:
    """All retained snapshot generation names, oldest first."""
    if not os.path.isdir(table_dir):
        return []
    return sorted(
        d for d in os.listdir(table_dir) if d.startswith("gen-")
    )


def snapshot_read(spark: SparkSession, table_dir: str, at: str | None = None):
    """Read the live snapshot (or a retained older one by name — time
    travel). Readers only ever see a fully-written immutable snapshot:
    the pointer is flipped after the parquet commit completes."""
    snap = (
        os.path.join(table_dir, at) if at is not None else snapshot_current(table_dir)
    )
    if snap is None or not os.path.isdir(snap):
        raise FileNotFoundError(f"no snapshot in {table_dir!r} (at={at!r})")
    return spark.read.parquet(snap)


def snapshot_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
    order: list[Column] | None = None,
    keep_snapshots: int = 2,
) -> str:
    """MERGE into a snapshot-pointer table; returns the new snapshot name.

    Commit sequence (each step safe to die after):
      1. write merged data to a fresh immutable ``gen-<n>-<uuid>`` dir
      2. atomically replace the ``__CURRENT`` pointer (tmp file + rename
         on POSIX; single-object PUT on an object store)
      3. GC snapshots older than the last ``keep_snapshots``
    A crash before (2) leaves an unreferenced gen dir for (3) to sweep;
    a crash inside (3) leaves extra history. The pointer is never in a
    partial state, so a concurrent reader always resolves a complete
    snapshot — reader-side snapshot isolation.

    Writer concurrency (ADVICE r3): this protocol guarantees READER
    isolation, not multi-writer serialization. The flip re-checks that
    ``__CURRENT`` still names the snapshot this merge read and raises
    ``SnapshotConflictError`` on mismatch (optimistic concurrency), which
    turns a silent lost-merge into a loud retryable failure — but the
    check-then-rename pair is not itself atomic, so two writers racing
    inside that window can still both land. True multi-writer commits
    need a compare-and-swap primitive the storage provides (Iceberg
    delegates exactly this to its catalog's atomic CAS; on S3 it is a
    conditional PUT). Single-writer-per-table remains the supported
    deployment, as in the crawl (one driver owns all state commits)."""
    os.makedirs(table_dir, exist_ok=True)
    cur = snapshot_current(table_dir)
    based_on = os.path.basename(cur) if cur is not None else None
    if cur is not None:
        merged = merge_upsert(spark.read.parquet(cur), updates, keys, order)
    else:
        merged = updates
    # next gen number = max existing + 1 (a count would collide after GC
    # shrinks the list, breaking the name-sorted oldest-first ordering)
    n = 1 + max(
        (int(g.split("-")[1]) for g in snapshot_list(table_dir)), default=-1
    )
    name = f"gen-{n:06d}-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(os.path.join(table_dir, name))

    tmp = os.path.join(table_dir, f".{_CURRENT}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    # optimistic-concurrency check: if another writer flipped the pointer
    # since this merge read its base snapshot, committing would silently
    # discard that writer's merge — fail loudly instead (see docstring)
    now_cur = snapshot_current(table_dir)
    now_name = os.path.basename(now_cur) if now_cur is not None else None
    if now_name != based_on:
        os.remove(tmp)
        shutil.rmtree(os.path.join(table_dir, name), ignore_errors=True)
        raise SnapshotConflictError(
            f"{table_dir!r}: pointer moved {based_on!r} -> {now_name!r} "
            "during merge; re-read and retry"
        )
    os.rename(tmp, _pointer_file(table_dir))  # the atomic commit point

    live = {name}
    retained = snapshot_list(table_dir)
    # keep the newest keep_snapshots REFERENCED-or-newer gens; sweep the rest
    for old in retained[: max(0, len(retained) - keep_snapshots)]:
        if old not in live:
            shutil.rmtree(os.path.join(table_dir, old), ignore_errors=True)
    return name


def status_rollup_update(
    target: DataFrame, done_keys: DataFrame, key: str, status_col: str = "status"
) -> DataFrame:
    """The set-oriented form of the reference's close_spider loop
    (pipelines.py:66-71: one UPDATE per processed id): a single broadcast
    semi-join marks every matched row completed."""
    flag = F.broadcast(done_keys.select(key).withColumn("_done", F.lit(True)))
    return (
        target.join(flag, key, "left")
        .withColumn(
            status_col,
            F.when(F.col("_done"), F.lit("completed")).otherwise(F.col(status_col)),
        )
        .drop("_done")
    )
