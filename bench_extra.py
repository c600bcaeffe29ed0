"""Extra benchmarks for optimization work (guide §1.4) — NOT the driver
contract; ``bench.py`` stays frozen. This harness times an arbitrary
subset of registry queries in isolation so a single query's cost is not
polluted by its neighbours' GC/JIT pressure.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [--reps N] [--noop] [query ...]

With no query names, runs the full bench.py HEADLINE set. ``--noop``
consumes results via the no-op sink (computes every column, discards);
default is bench.py's exhaust (count of xxhash64 over all columns) so
numbers are comparable with the driver protocol.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whakoom_webscrapper_spark import queries as Q
from whakoom_webscrapper_spark.session import get_spark


def exhaust(df) -> None:
    from pyspark.sql import functions as F

    df.agg(F.count(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def noop_sink(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    use_noop = False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--noop":
            use_noop = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    if not names:
        import bench

        names = list(bench.HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_extra")
    consume = noop_sink if use_noop else exhaust
    sc = spark.sparkContext

    samples: dict[str, list[float]] = {n: [] for n in names}
    for name in names:  # warm-up, untimed
        sc.setJobDescription(f"warmup:{name}")
        consume(Q.SPARK_QUERIES[name](spark, sf_dir))
    for _rep in range(reps):
        for name in names:
            sc.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            consume(Q.SPARK_QUERIES[name](spark, sf_dir))
            samples[name].append(round(time.perf_counter() - t0, 3))
    sc.setJobDescription(None)

    timings = {n: round(statistics.median(ts), 3) for n, ts in samples.items()}
    print(
        json.dumps(
            {
                "metric": "bench_extra",
                "sink": "noop" if use_noop else "exhaust",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
