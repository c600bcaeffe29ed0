"""Dump ``explain("formatted")`` for registry queries to files.

Usage::

    SPARK_GRAFT_CPUS=32 python tools/dump_plans.py [--no-ckpt] <outdir> <tag> [query ...]

Writes ``<outdir>/<query>_<tag>.txt`` for each query (default: the
bench.py HEADLINE set). Used to commit the plans/r06 before/after
evidence the optimization round requires.

``--no-ckpt`` monkeypatches ``DataFrame.localCheckpoint`` to identity
before building the queries: round-6 queries materialize shared
subtrees via lazy localCheckpoint, which truncates the dumped plan at a
``Scan ExistingRDD`` boundary — this flag exposes the full logical
pipeline those checkpoints execute (the dumped file notes the mode).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from whakoom_webscrapper_spark import queries as Q
from whakoom_webscrapper_spark.session import get_spark


def main() -> None:
    args = list(sys.argv[1:])
    no_ckpt = "--no-ckpt" in args
    if no_ckpt:
        args.remove("--no-ckpt")
        try:  # Spark 4: the runtime class lives in sql.classic
            from pyspark.sql.classic.dataframe import DataFrame
        except ImportError:  # pragma: no cover - older Spark
            from pyspark.sql import DataFrame

        DataFrame.localCheckpoint = lambda self, eager=True: self
    outdir, tag = args[0], args[1]
    names = args[2:]
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
            if no_ckpt:
                f.write(
                    "-- dumped with --no-ckpt: localCheckpoint patched to"
                    " identity so the full pipeline behind the checkpoint"
                    " boundaries is visible --\n"
                )
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
