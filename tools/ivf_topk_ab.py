"""A/B: salted two-stage top-k vs single-salt (old WindowExec shape) on
the embedding_knn_ivf registry query (VERDICT r4 item 5).

The r3→r4 bench regression on `embedding_knn_ivf` (1.08→1.49s) had two
ingredients: per-invocation quantizer retraining (fixed — the registry
memoizes trained artifacts per sf_dir, `queries.py:_ann_index`) and the
salted two-stage per-query top-k that replaced the single-partition
WindowExec (`operators/similarity.py:_per_query_topk`). This tool pins
the residual cost of the second ingredient: the SAME trained index, the
SAME query plan, timed with n_salts=<defaultParallelism> (shipped) vs
n_salts=1 (one rank group per query — the old single-partition ranking
shape), interleaved A,B,A,B,... with per-variant medians.

    python tools/ivf_topk_ab.py [sf_dir] [reps]

Writes BENCH/ivf_topk_ab.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from whakoom_webscrapper_spark import queries as Q  # noqa: E402
from whakoom_webscrapper_spark.operators import similarity as S  # noqa: E402
from whakoom_webscrapper_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()

    corpus, q = Q._emb_corpus_queries(spark, sf_dir)
    centroids = Q._ann_index(spark, sf_dir, "centroids")
    n_par = spark.sparkContext.defaultParallelism

    def run(n_salts: int) -> float:
        df = S.ivf_topk(
            corpus, q, k=10, n_centroids=32, nprobe=4,
            centroids=centroids, topk_salts=n_salts,
        )
        t0 = time.perf_counter()
        df.agg(F.count(F.xxhash64(*df.columns))).collect()
        return time.perf_counter() - t0

    variants = {"salted": n_par, "single": 1}
    # warm-up once per variant (codegen, file listing)
    for n in variants.values():
        run(n)
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for name, n in variants.items():
            times[name].append(round(run(n), 3))

    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    out = {
        "query": "embedding_knn_ivf (trained index memoized; only the "
                 "per-query top-k variant differs)",
        "sf_dir": sf_dir,
        "reps": reps,
        "protocol": "interleaved salted,single per rep; median per variant",
        "n_salts_salted": n_par,
        "times": times,
        "medians": med,
        "salted_minus_single_s": round(med["salted"] - med["single"], 3),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "ivf_topk_ab.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["medians"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
