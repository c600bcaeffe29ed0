"""Local replica of the driver's DuckDB correctness gate.

Runs every registered query via Spark and (when an oracle exists) via
DuckDB on the same parquet, compares row count, column names, and an
order-insensitive multiset of stringified rows (floats repr'd after the
queries' own rounding). Usage::

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from whakoom_webscrapper_spark import queries as Q
from whakoom_webscrapper_spark.catalog import TESTDATA_TABLES
from whakoom_webscrapper_spark.session import get_spark


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name, fn in Q.SPARK_QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in Q.ORACLE_SQL:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(Q.ORACLE_SQL[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sm, om = rows_to_multiset(srows, scols), rows_to_multiset(orows, ocols)
            if sm != om:
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                problems.append(f"values spark-only={diff_s} duck-only={diff_o}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
