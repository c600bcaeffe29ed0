"""ANN operator tests: exact baseline + LSH recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


def _tables(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.filter(F.col("vec_id") >= 3)
    return corpus, q


def test_brute_force_topk_shape_and_order(spark):
    corpus, q = _tables(spark)
    res = S.brute_force_topk(corpus, q, k=5).collect()
    assert len(res) == 15  # 3 queries x 5
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for rows in by_q.values():
        rows.sort()
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall_vs_exact(spark):
    corpus, q = _tables(spark)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in S.brute_force_topk(corpus, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in S.lsh_topk(
            corpus, q, k=10, dim=64, n_bits=6, n_tables=12
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_deterministic(spark):
    corpus, q = _tables(spark)
    a = sorted(map(tuple, S.lsh_topk(corpus, q, k=5).collect()))
    b = sorted(map(tuple, S.lsh_topk(corpus, q, k=5).collect()))
    assert a == b
