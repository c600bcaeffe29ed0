"""Dump ``explain("formatted")`` for registry queries to files.

Usage::

    SPARK_GRAFT_CPUS=32 python tools/dump_plans.py <outdir> <tag> [query ...]

Writes ``<outdir>/<query>_<tag>.txt`` for each query (default: the
bench.py HEADLINE set). Used to commit the plans/r06 before/after
evidence the optimization round requires.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from whakoom_webscrapper_spark import queries as Q
from whakoom_webscrapper_spark.session import get_spark


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    for name in names:
        df = Q.SPARK_QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
