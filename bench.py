"""Benchmark harness — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed once as warm-up (JVM/code-gen warm, file listing
cached) and then THREE timed passes, interleaved across the whole
headline set (q1,q2,...,qN, q1,q2,...,qN, ...) so slow drift in
shared-host load spreads over every query instead of biasing whichever
ran during a stall; the per-query number is the MEDIAN of the three
(VERDICT r3 item 3: single runs on this ±10-60%-noise host made every
cross-round delta unfalsifiable). Results are consumed as
``count(xxhash64(*all_columns))`` — a one-row aggregate that forces
EVERY output column to materialize.
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
    "sessions_gap",
    "url_canonicalize",
    "url_blocklist_filter",  # dot-suffix domain blocklist (new in r5)
    "html_extract_links",
    "text_stats",
    "lang_id_counts",
    "exact_dedup_stats",
    "repetition_stats",  # Gopher repetition rules (new in r5)
    "train_split_assign",  # deterministic md5 train/holdout split (new in r5)
    "source_cap_sample",  # per-source cap window (new in r5)
    "pii_scrub_stats",  # staged regex PII scrub + counts (new in r5)
    "doc_length_percentiles",  # exact per-lang length profile (new in r5)
    "passage_dup_stats",  # exact-substring (span-hash) dedup (new in r5)
    "passage_dedup_docs",  # its removal variant (new in r5)
    "contamination_check",  # benchmark n-gram overlap (new in r5)
    "images_phash_neardup",  # image-payload near-dup (new in r4)
    "images_thumbnail_profile",  # decode→box-resize→PNG re-encode (new in r5)
    "video_frame_sample",  # FVID index-table partial-decode sampling (new in r5)
    "audio_profile",  # WAV decode + resample + windowed features (new in r5)
    "stratified_sample_docs",  # deterministic per-lang rebalancing sample (new in r5)
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_verified_pairs",  # LSH candidates + exact-Jaccard verify (new in r5)
    "minhash_lsh_pairs_fast",  # production xxhash64 variant of the above
    "embedding_knn",
    "embedding_knn_ivf",
    "embedding_knn_pq",  # PQ/ADC compression path (new in r4)
    "embedding_knn_ivfpq",  # composed IVFADC (new in r4)
    "embedding_dup_pairs",
    "dup_clusters",  # large-star/small-star dup clustering (new in r4)
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

    import statistics

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    for name in HEADLINE:  # warm-up pass, untimed
        exhaust(Q.SPARK_QUERIES[name](spark, sf_dir))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _rep in range(reps):  # interleaved: whole set per rep
        for name in HEADLINE:
            t0 = time.perf_counter()
            exhaust(Q.SPARK_QUERIES[name](spark, sf_dir))
            samples[name].append(round(time.perf_counter() - t0, 3))

    timings = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "samples": samples,
                "reps": reps,
                "aggregation": "per-query median of interleaved reps",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
