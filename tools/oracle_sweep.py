"""Full oracle sweep with a committed JSON artifact.

Runs tools/oracle_check.py's exact comparison over EVERY registered
query (the judge's command) and writes a JSON ledger so each round can
commit the complete correctness surface, not just the driver's 50-row
sample (round-5 verdict item 6). Usage::

    python tools/oracle_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import duckdb

import oracle_check as OC
from whakoom_webscrapper_spark import queries as Q
from whakoom_webscrapper_spark.catalog import TESTDATA_TABLES
from whakoom_webscrapper_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/oracle_sweep_r6.json"
    spark = get_spark("oracle_sweep", master="local[8]")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    results: dict[str, dict] = {}
    n_fail = 0
    for name, fn in Q.SPARK_QUERIES.items():
        row: dict = {"oracle": name in Q.ORACLE_SQL}
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            row["spark_rows"] = len(srows)
        except Exception as e:  # noqa: BLE001 - ledger records the error
            row["status"] = f"spark error: {e}"
            n_fail += 1
            results[name] = row
            continue
        if name not in Q.ORACLE_SQL:
            row["status"] = "rows_only"
            results[name] = row
            continue
        res = con.execute(Q.ORACLE_SQL[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        row["oracle_rows"] = len(orows)
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append("columns")
        if len(srows) != len(orows):
            problems.append("rowcount")
        if not problems and OC.rows_to_multiset(srows, scols) != OC.rows_to_multiset(orows, ocols):
            problems.append("values")
        row["status"] = "green" if not problems else "FAIL:" + ",".join(problems)
        if problems:
            n_fail += 1
        results[name] = row
    ledger = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_oracle_paired": sum(1 for r in results.values() if r["oracle"]),
        "n_fail": n_fail,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(ledger, f, indent=1)
    print(f"{out_path}: {len(results)} queries, {n_fail} failures")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
