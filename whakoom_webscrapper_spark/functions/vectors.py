"""Vector math over array<float> embedding columns — built-in higher-order
functions only (F.zip_with / F.aggregate run JVM-side; no Python UDF, no
Arrow transfer for the distance math).

Used by the similarity-search and embedding-dedup operators. At 100 TB the
dot products dominate; keeping them in codegen instead of a pandas UDF
avoids serializing the embedding column to Arrow entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def lsh_bucket(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed into a
    long. ``planes`` is a small driver-side list (constant-folded into the
    plan, effectively a broadcast). len(planes) <= 62."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bit = F.when(dot(a, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return bucket
