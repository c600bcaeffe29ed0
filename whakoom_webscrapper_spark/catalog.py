"""Table catalog + named-view registry.

The reference keeps a dict of named SQL queries parsed from ``queries/*.sql``
(reference: sqlmanager.py:36-67, ``_load_queries_from_files``) and a
migrations table for schema versioning (sqlmanager.py:169-264). The engine's
equivalents:

- ``load_tables``/``register_views`` — one ``spark.read.parquet`` per table,
  registered as a temp view so both the DataFrame API and ``spark.sql`` can
  address it. Parquet scans get predicate pushdown + column pruning for free.
- ``NAMED_QUERIES`` — the named-query registry: name → SQL string over the
  registered views (the Spark-side analog of the ``# NAME\\nSQL`` blocks in
  reference queries/lists.sql:1-64).

Schema versioning: each engine state directory carries ``_meta/version``; a
mismatch at open time is the analog of a pending migration
(sqlmanager.py:197-234). Iceberg would give us this via snapshot/schema
history; the Parquet fallback keeps it explicit.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# bumped by migrations.py history (v2: pages.caption_tokens) — fresh
# states are born at the latest version; older states must run the
# migration job (jobs/migrate.py) before resume
SCHEMA_VERSION = 2


def with_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Raise a DataFrame's partition count to the session's core count
    before an expression-heavy map stage; no-op when the input layout
    already provides it.

    Why: parquet splits cannot cross row-group boundaries, so a scan's
    parallelism is capped by the input's row-group count — a
    single-row-group file (this sandbox's testdata; in production a
    consolidated small table or one fat unsplittable object) serializes
    every downstream narrow transformation onto ONE core until the first
    shuffle. For regex/HOF-heavy stages (shingling, HTML extraction,
    text stats) that turns a 32-core box into a 1-core box: measured
    4.7 s -> 0.6 s on the sf0.1 shingle explode at local[32].

    At cluster scale a 100 TB table scans as ~10^5 row groups, the guard
    sees partitions >= cores and this is a NO-OP — it never adds a
    shuffle to a well-laid-out input. When it does fire, it round-robins
    only the raw input rows (pre-explosion, the narrowest point of the
    plan), which is the cheapest place to buy parallelism."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Scan one driver-provided parquet table (predicate pushdown kept).

    ``parallel=True`` applies :func:`with_min_parallelism` — use it for
    queries whose cost is dominated by per-row expression work directly
    over the scan (text/shingle/HTML/embedding paths), not for
    filter-then-aggregate relational queries where the scan should stay
    fused with its pushed-down predicates."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return with_min_parallelism(df) if parallel else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (idempotent)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


# Named-query registry — analog of reference queries/lists.sql named blocks.
# Keys mirror the reference's GET_/INSERT_ naming convention where a direct
# analog exists (queries/lists.sql:11-64).
NAMED_QUERIES: dict[str, str] = {
    # GET_PENDING_LISTS (queries/lists.sql:11-22): status filter + ORDER BY
    "GET_PENDING_ORDERS": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderstatus = 'O' ORDER BY o_orderkey
    """,
    # GET_LISTS_BY_PROFILE (queries/lists.sql:24-35): equality filter
    "GET_ORDERS_BY_PRIORITY": """
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderpriority = '1-URGENT' ORDER BY o_orderkey
    """,
    # README.md:461-473 operational log queries → recent-events view
    "GET_RECENT_EVENTS": """
        SELECT event_id, ts, user_id, event_type, value
        FROM events ORDER BY ts DESC, event_id DESC LIMIT 10
    """,
    # GET_LIST_BY_ID (queries/lists.sql:42-52): point lookup by key —
    # parameterized with a named marker, bound at execution time
    "GET_ORDER_BY_ID": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderpriority, o_orderdate
        FROM orders WHERE o_orderkey = :key
    """,
    # GET_ALL_LISTS (queries/lists.sql:54-64): full ordered scan
    "GET_ALL_ORDERS": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderpriority, o_orderdate
        FROM orders ORDER BY o_orderkey
    """,
}


def run_named_query(spark: SparkSession, name: str, args: dict | None = None) -> DataFrame:
    """Execute a registry query by name (views must be registered).
    ``args`` binds named parameter markers (``:key``) — the engine analog
    of the reference's ``?`` placeholders (sqlmanager.py:93-117)."""
    return spark.sql(NAMED_QUERIES[name], args=args)


# Name-routed WRITE operations — the reference reaches its upsert/status
# statements by name too (INSERT_OR_UPDATE_LIST / UPDATE_LIST_STATUS,
# queries/lists.sql:1-9,37-40 via pipelines.py:140-150). Each value is a
# callable over DataFrames; dispatch is by the same name-lookup lifecycle.
def _named_ops():
    from whakoom_webscrapper_spark.operators import upsert as UP

    return {
        "INSERT_OR_UPDATE_ORDERS": lambda target, updates: UP.merge_upsert(
            target, updates, ["o_orderkey"]
        ),
        "UPDATE_ORDER_STATUS": lambda target, done_keys: UP.status_rollup_update(
            target, done_keys, "o_orderkey", "o_orderstatus"
        ),
    }


def run_named_op(name: str, *args) -> DataFrame:
    """Execute a registered write operation by name."""
    return _named_ops()[name](*args)


def write_version(path: str, version: int = SCHEMA_VERSION) -> None:
    """Record the state-directory schema version (migration analog)."""
    os.makedirs(os.path.join(path, "_meta"), exist_ok=True)
    with open(os.path.join(path, "_meta", "version.json"), "w") as f:
        json.dump({"schema_version": version}, f)


def read_version(path: str) -> int | None:
    p = os.path.join(path, "_meta", "version.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["schema_version"])


def check_version(path: str) -> None:
    """Fail fast on schema mismatch — the analog of an unapplied migration
    (reference: sqlmanager.py:236-264 applies pending migrations; we refuse
    instead, because state rewrites at 100 TB must be explicit jobs)."""
    v = read_version(path)
    if v is not None and v != SCHEMA_VERSION:
        raise RuntimeError(
            f"state dir {path} has schema_version={v}, engine expects "
            f"{SCHEMA_VERSION}; run the migration job first"
        )
