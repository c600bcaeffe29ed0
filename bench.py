"""Benchmark harness — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed twice: a warm-up pass (JVM/code-gen warm, file
listing cached) and a timed pass; the timed number is what lands in the
JSON. Results are consumed as ``count(xxhash64(*all_columns))`` — a
one-row aggregate that forces EVERY output column to materialize.
A plain ``count(*)`` would let Catalyst column-prune the projected
expressions for select-only queries (url_canonicalize, text_stats),
timing just the parquet scan; hashing every column closes that hole
while still avoiding driver-side collect costs.

The crawl-engine scaling bench (local[8] vs local[32], BASELINE.json:14)
is a separate long-running protocol — see BENCH/BASELINE.md and
tools/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whakoom_webscrapper_spark import queries as Q
from whakoom_webscrapper_spark.session import get_spark

# Headline set: one per operator family, weighted toward the shuffles and
# UDF-free scans that dominate at 100 TB.
HEADLINE = [
    "pricing_summary",
    "region_rollup",
    "order_revenue_topk",
    "orders_without_items",
    "events_dedup",
    "events_hourly",
    "url_canonicalize",
    "html_extract_links",
    "text_stats",
    "lang_id_counts",
    "exact_dedup_stats",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_fast",  # production xxhash64 variant of the above
    "embedding_knn",
    "embedding_knn_ivf",
    "embedding_dup_pairs",
]


def exhaust(df) -> int:
    """Force evaluation of every output column (see module docstring)."""
    from pyspark.sql import functions as F

    return df.agg(F.count(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()[
        0
    ][0]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.SPARK_QUERIES[name]
        exhaust(fn(spark, sf_dir))  # warm-up
        t0 = time.perf_counter()
        exhaust(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
