"""Partitioned Bloom filter over 64-bit keys (the URL-seen structure).

The reference dedups with in-memory Python sets (reference:
pipelines.py:32-34) and DB UNIQUE keys (001_initial_schema.sql:4,19).
At 10^10 URLs neither works: the engine keeps the exact seen-set as a
partitioned table and uses a Bloom filter as a fast approximate
PRE-filter in front of the exact anti-join (J1 in SURVEY.md §2.4) —
the Bloom removes ~99% of definitely-new URLs from the seen-join's
shuffle; the anti-join then guarantees exactness for the rest.

Design for 10^10 keys at 1% FPR: m ≈ 9.6 bits/key ≈ 12 GB total —
too big for one broadcast, so filters are built PER PARTITION of the
seen table (mapInPandas → one row per partition holding its bitmap),
OR-merged on the driver, and the merged filter is broadcast per epoch.
At 1% FPR the bitmap is the only structure that must scale with |seen|;
everything else is per-epoch. In the sandbox m is a few MB.

Hashing: double hashing over the already-computed ``url_hash`` int64 —
h_i(x) = h1(x) + i*h2(x) mod m, with h1 = x (xxhash64 output is already
uniform) and h2 = odd mix of x. All numpy-vectorized (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MIX = np.uint64(0x9E3779B97F4A7C15)


class Bloom:
    """Vectorized Bloom filter over int64 keys."""

    def __init__(self, m_bits: int, k: int = 7, bits: np.ndarray | None = None):
        if m_bits % 64:
            m_bits += 64 - (m_bits % 64)
        self.m_bits = m_bits
        self.k = k
        self.words = (
            bits if bits is not None else np.zeros(m_bits // 64, dtype=np.uint64)
        )

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) array of bit positions for each key."""
        with np.errstate(over="ignore"):
            h1 = keys.astype(np.int64).view(np.uint64)
            h2 = (h1 * _MIX) | np.uint64(1)
            i = np.arange(self.k, dtype=np.uint64).reshape(-1, 1)
            return (h1 + i * h2) % np.uint64(self.m_bits)

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def may_contain_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "Bloom") -> "Bloom":
        assert self.m_bits == other.m_bits and self.k == other.k
        self.words |= other.words
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, m_bits: int, k: int) -> "Bloom":
        return cls(m_bits, k, np.frombuffer(data, dtype=np.uint64).copy())

    @classmethod
    def sized_for(cls, n_keys: int, fpr: float = 0.01) -> "Bloom":
        n_keys = max(n_keys, 1024)
        m = int(-n_keys * np.log(fpr) / (np.log(2) ** 2))
        k = max(int(round(m / n_keys * np.log(2))), 1)
        return cls(m, k)


_BLOOM_ROW_SCHEMA = T.StructType(
    [
        T.StructField("partition_bits", T.BinaryType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)


def build_bloom(df: DataFrame, key_col: str, m_bits: int, k: int = 7) -> Bloom:
    """Build per-partition Bloom filters with mapInPandas (one bitmap row
    per partition), OR-merge on the driver. The driver transfers
    partitions * m_bits/8 bytes once per (re)build — for the 10^10 design
    point filters are rebuilt incrementally (add only this epoch's keys to
    the already-merged filter; see ``add_keys_local``)."""

    def per_partition(iterator):
        bloom = Bloom(m_bits, k)
        n = 0
        for pdf in iterator:
            keys = pdf[key_col].values.astype(np.int64)
            bloom.add_many(keys)
            n += len(keys)
        yield pd.DataFrame(
            [{"partition_bits": bloom.to_bytes(), "n_keys": n}]
        )

    parts = df.select(key_col).mapInPandas(per_partition, _BLOOM_ROW_SCHEMA).collect()
    merged = Bloom(m_bits, k)
    for row in parts:
        merged.merge(Bloom.from_bytes(row["partition_bits"], merged.m_bits, k))
    return merged


def add_keys_local(bloom: Bloom, df: DataFrame, key_col: str) -> Bloom:
    """Incremental epoch update: fold this epoch's (small) key set into an
    existing merged filter driver-side — avoids a full rebuild scan.
    Arrow-path toPandas: ~20x faster than row-object collect() for the
    driver-side transfer (measured seconds per 100k rows saved)."""
    pdf = df.select(key_col).toPandas()
    bloom.add_many(pdf[key_col].values.astype(np.int64))
    return bloom


def prefilter_maybe_seen(
    df: DataFrame, key_col: str, bloom: Bloom, spark
) -> tuple[DataFrame, DataFrame]:
    """Split df into (definitely_new, maybe_seen) using a broadcast Bloom.
    ``definitely_new`` rows skip the exact seen anti-join entirely — at
    scale that is the whole point (the anti-join's shuffle only carries
    the ~FPR fraction + true dups)."""
    bc = spark.sparkContext.broadcast((bloom.to_bytes(), bloom.m_bits, bloom.k))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(keys: pd.Series) -> pd.Series:
        data, m_bits, k = bc.value
        b = Bloom.from_bytes(data, m_bits, k)
        return pd.Series(b.may_contain_many(keys.values.astype(np.int64)))

    flagged = df.withColumn("_maybe_seen", maybe_seen(F.col(key_col)))
    return (
        flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen"),
        flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen"),
    )
