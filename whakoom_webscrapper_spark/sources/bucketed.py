"""Bucketed world tables — the beyond-broadcast fetch-join path.

The crawl's fetch join broadcasts the politeness-bounded admitted set
(plans/frontier.py) — correct while Σ per-host budgets stays broadcast-
sized. The bound grows linearly with host count: at 10^7+ hosts an
epoch's admitted set outgrows broadcast limits (docs/SCALE.md). The
fallback is classic Spark: write the linkgraph/images tables BUCKETED
on their join keys (url / image_id) once at ingest; then every epoch's
fetch join is a SortMergeJoin where the bucketed side needs NO exchange
— only the (new, per-epoch) admitted side shuffles to match the bucket
layout. The multi-TB binary table never moves.

``bucketBy`` requires a catalog table (Spark bucketing metadata lives in
the metastore, not in parquet footers), so these are ``saveAsTable``
managed tables rather than plain world-dir parquet. On a real cluster
this is the Iceberg/Hive table the north rule names; locally it lands in
spark-warehouse/.

Threshold guidance (CrawlConfig.broadcast_fetch_max): broadcast cost is
~rows × row-width × executors of network egress plus driver collect;
keep it under a few hundred MB — the default 2M admitted rows ≈ 250 MB
at ~128 B/row. Above that, auto mode switches to the bucketed join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _drop_if_exists(spark: SparkSession, table: str) -> None:
    """Drop the table AND its managed location — an in-memory catalog
    forgets tables across sessions but the warehouse directory persists,
    which would fail the next saveAsTable with LOCATION_ALREADY_EXISTS."""
    # resolve the real location from the catalog BEFORE dropping — a table
    # in a non-default database lives at <warehouse>/<db>.db/<table>, so a
    # hand-built <warehouse>/<table> path would miss it and the next
    # saveAsTable would still hit LOCATION_ALREADY_EXISTS
    loc = None
    try:
        tbl = spark.catalog.getTable(table)
        db = tbl.namespace[0] if tbl.namespace else "default"
        row = spark.sql(f"DESCRIBE TABLE EXTENDED {db}.{tbl.name}").where(
            "col_name = 'Location'"
        ).collect()
        if row:
            loc = row[0]["data_type"].replace("file:", "")
    except Exception:
        pass  # table not in catalog — fall back to the conventional path
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).replace("file:", "")
    parts = table.split(".")
    if loc is None:
        loc = (
            os.path.join(warehouse, f"{parts[-2]}.db", parts[-1])
            if len(parts) > 1 and parts[-2] != "default"
            else os.path.join(warehouse, parts[-1])
        )
    if os.path.exists(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed_world(
    spark: SparkSession,
    world_dir: str,
    linkgraph_table: str,
    images_table: str | None = None,
    n_buckets: int = 32,
) -> None:
    """One-time ingest: bucket linkgraph by url (and images by image_id)
    into managed tables. Bucket count should be ~2-3x executor count at
    the design point so one bucket wave fills the cluster."""
    _drop_if_exists(spark, linkgraph_table)
    if images_table is not None:
        _drop_if_exists(spark, images_table)
    lg = spark.read.parquet(os.path.join(world_dir, "linkgraph"))
    (
        lg.write.mode("overwrite")
        .bucketBy(n_buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(linkgraph_table)
    )
    if images_table is not None:
        im = spark.read.parquet(os.path.join(world_dir, "images"))
        (
            im.write.mode("overwrite")
            .bucketBy(n_buckets, "image_id")
            .sortBy("image_id")
            .format("parquet")
            .saveAsTable(images_table)
        )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
