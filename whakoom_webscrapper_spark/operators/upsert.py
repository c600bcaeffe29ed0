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


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order: list[Column] | None = None,
) -> None:
    """Durable upsert into a parquet directory: read-modify-write to a
    temp dir, then atomic-ish directory swap. Crash between write and
    swap leaves the original intact (write-new-then-rename, K4)."""
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
