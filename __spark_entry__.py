"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementations live in ``whakoom_webscrapper_spark/`` — see
``queries.py`` (relational + text + embedding registry, each with its
DuckDB oracle) and ``plans/frontier.py`` (the crawl engine itself,
exposed here as rows-only entries since an iterative crawl is not
expressible as one ANSI-SQL statement).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from whakoom_webscrapper_spark import queries as Q  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.SPARK_QUERIES["pricing_summary"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every oracle-checkable query."""
    # The image-corpus oracles read the materialized corpus parquet via
    # read_parquet(); build it here (pyarrow, no SparkSession needed) so
    # the file exists even if the oracle side runs before the Spark side.
    from whakoom_webscrapper_spark import images_corpus

    images_corpus.materialize()
    return dict(Q.ORACLE_SQL)
