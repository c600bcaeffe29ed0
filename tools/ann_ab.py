"""A/B bench: the four ANN strategies on the same 1M-vector corpus.

Correctness gates (tests/test_similarity.py) pin recall at toy scale;
this measures whether the scale paths actually PAY at a size where the
exact scan hurts: brute-force cosine vs IVF routing vs PQ/ADC byte
codes vs the composed IVFADC, one shared clustered corpus (the shape of
real embedding corpora), identical query batch, trained index built
once per strategy OUTSIDE the timed region (production reuses an index
across query batches; the registry queries price index build
separately — see BENCH/BASELINE.md).

    python tools/ann_ab.py --n 1000000 --reps 3 --out BENCH/ann_ab.json

Interleaved strategy x reps (whole set per rep, like bench.py), one
Spark session, corpus persisted and counted before any timing; reports
per-strategy median wall, recall@10 vs the exact baseline, and the
candidate fraction where the strategy admits one.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from whakoom_webscrapper_spark import datagen  # noqa: E402
from whakoom_webscrapper_spark.operators import similarity as S  # noqa: E402
from whakoom_webscrapper_spark.session import get_spark  # noqa: E402

N_QUERIES = 8
K = 10


def topk_sets(df) -> dict:
    got: dict = {}
    for r in df.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    return got


def recall_vs(exact: dict, got: dict) -> float:
    return sum(
        len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
    ) / len(exact)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--n-clusters", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--master", default=None)
    ap.add_argument("--out", default="BENCH/ann_ab.json")
    ap.add_argument("--n-centroids", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(app_name="ann_ab", master=args.master)
    emb = datagen.gen_clustered_embeddings(
        spark, args.n, n_clusters=args.n_clusters, partitions=32
    ).persist()
    n_corpus = emb.count() - N_QUERIES
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)

    # index build happens ONCE, outside the timed region — in production
    # the PQ codes / IVF cells are stored index columns per corpus
    # version, not per query batch. PQ codebooks for the composed path
    # are RESIDUAL-trained (see train_pq docstring).
    t0 = time.monotonic()  # index build = sample + train + encode+persist
    sample = S._sample_matrix(corpus, 50_000, "vec_id", "embedding")
    cents = S.train_centroids(
        corpus, n_centroids=args.n_centroids, sample=sample
    )
    books_raw = S.train_pq(corpus, sample=sample)
    books_res = S.train_pq(corpus, sample=sample, centroids=cents)
    train_s = round(time.monotonic() - t0, 3)
    coded_raw = S.pq_encode(corpus, books_raw).persist()
    coded_raw.count()
    coded_res = S.ivf_pq_encode(corpus, cents, books_res).persist()
    coded_res.count()
    index_build_s = round(time.monotonic() - t0, 3)
    # shortlist sized for the corpus's near-tie mass: ~n/n_clusters
    # cluster members sit nearly equidistant from a query, so the
    # re-rank pool must cover that, not just k
    shortlist = max(64, min(1024, args.n // args.n_clusters))

    strategies = {
        "exact": lambda: S.brute_force_topk(corpus, q, k=K),
        "ivf": lambda: S.ivf_topk(
            corpus, q, k=K, nprobe=args.nprobe, centroids=cents
        ),
        "pq": lambda: S.pq_topk(
            corpus, q, k=K, codebooks=books_raw, shortlist=shortlist,
            coded=coded_raw,
        ),
        "ivfpq": lambda: S.ivf_pq_topk(
            corpus, q, k=K, nprobe=args.nprobe, shortlist=shortlist,
            centroids=cents, residual_codebooks=books_res, coded=coded_res,
        ),
    }

    out = {
        "n_corpus": int(n_corpus),
        "n_queries": N_QUERIES,
        "k": K,
        "n_clusters": args.n_clusters,
        "n_centroids": args.n_centroids,
        "nprobe": args.nprobe,
        "pq": {"m": 8, "n_codes": 256, "shortlist": shortlist,
               "ivfpq_codebooks": "residual"},
        "index_build_s": index_build_s,  # sample+train+encode+persist
        "train_s": train_s,
        "reps": args.reps,
        "master": spark.sparkContext.master,
        "protocol": "interleaved whole-set reps; index trained once "
        "outside timing; corpus persisted+counted first; medians",
        "walls": {name: [] for name in strategies},
    }
    results: dict = {}
    for _rep in range(args.reps):
        for name, fn in strategies.items():
            t0 = time.monotonic()
            results[name] = topk_sets(fn())
            out["walls"][name].append(round(time.monotonic() - t0, 3))

    exact = results["exact"]
    out["medians"] = {
        name: round(statistics.median(w), 3) for name, w in out["walls"].items()
    }
    out["recall_at_10"] = {
        name: round(recall_vs(exact, results[name]), 4) for name in strategies
    }
    out["probe_fraction"] = {
        "ivf": round(
            S.ivf_candidates(
                corpus, q, nprobe=args.nprobe, centroids=cents
            ).count() / (N_QUERIES * n_corpus),
            5,
        ),
        "exact": 1.0,
        "pq": 1.0,  # scans all codes, but at 8 bytes/vector
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("medians", "recall_at_10", "probe_fraction")}))


if __name__ == "__main__":
    main()
