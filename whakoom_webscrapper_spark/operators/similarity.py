"""Approximate-nearest-neighbor search over embedding columns.

Two strategies over ``array<float>`` embeddings:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set, one pass over the corpus, JVM-side higher-order-function math
  (functions/vectors.py), TakeOrderedAndProject for the top-k. The
  correctness baseline; O(n·q·d).
- ``lsh_topk`` — the scale path: random-hyperplane LSH buckets both
  sides; candidates are corpus rows sharing a bucket with the query
  under any of ``n_tables`` independent hash tables; exact cosine is
  computed only for candidates. At 100 TB the bucket equi-join replaces
  the full scan: shuffle is keyed on (table_id, bucket), corpus side is
  bucketed once and reusable across query batches.

The hyperplanes are seeded driver-side constants folded into the plan
(functions/vectors.py:lsh_bucket) — every executor derives identical
buckets with no side channel.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from whakoom_webscrapper_spark.functions import vectors as V

DEFAULT_SEED = 7


def _planes(dim: int, n_bits: int, table: int, seed: int = DEFAULT_SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed * 10_007 + table)
    return rng.standard_normal((n_bits, dim)).tolist()


def _dcast(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` must be broadcastable
    (query batches are small by construction; at scale, chunk them)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    cos = V.cosine(_dcast(F.col(vec_col)), _dcast(F.col("_qvec")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        corpus.crossJoin(q)
        .withColumn("cos_sim", cos)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(query_id_col, id_col, F.col("cos_sim"), F.col("_rk").alias("rank"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bits: int = 10,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """LSH-bucketed approximate top-k: equi-join on (table, bucket), exact
    cosine on candidates only. Recall grows with n_tables; n_bits trades
    bucket size vs collision rate (2^n_bits buckets per table)."""

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        out = []
        for t in range(n_tables):
            planes = _planes(dim, n_bits, t, seed)
            out.append(
                df.select(
                    F.col(idc),
                    F.col(vec_col),
                    F.lit(t).alias("_table"),
                    V.lsh_bucket(_dcast(F.col(vec_col)), planes).alias("_bucket"),
                )
            )
        res = out[0]
        for o in out[1:]:
            res = res.unionByName(o)
        return res

    c_b = with_buckets(corpus, id_col)
    q_b = F.broadcast(
        with_buckets(queries, query_id_col).withColumnRenamed(vec_col, "_qvec")
    )
    cand = (
        c_b.join(q_b, ["_table", "_bucket"])
        .select(id_col, vec_col, query_id_col, "_qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    cos = V.cosine(_dcast(F.col(vec_col)), _dcast(F.col("_qvec")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        cand.withColumn("cos_sim", cos)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(query_id_col, id_col, F.col("cos_sim"), F.col("_rk").alias("rank"))
    )
