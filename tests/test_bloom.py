"""Bloom filter invariants: no false negatives, bounded FPR, merge."""

from __future__ import annotations

import numpy as np

from whakoom_webscrapper_spark.operators.bloom import Bloom, build_bloom


def test_no_false_negatives():
    b = Bloom.sized_for(10_000, 0.01)
    keys = np.random.default_rng(1).integers(-(2**62), 2**62, 10_000, dtype=np.int64)
    b.add_many(keys)
    assert b.may_contain_many(keys).all()


def test_fpr_bounded():
    b = Bloom.sized_for(10_000, 0.01)
    rng = np.random.default_rng(2)
    keys = rng.integers(-(2**62), 2**62, 10_000, dtype=np.int64)
    b.add_many(keys)
    probe = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    fpr = b.may_contain_many(probe).mean()
    assert fpr < 0.03


def test_merge_is_union():
    a, b = Bloom(1 << 16, 5), Bloom(1 << 16, 5)
    ka = np.arange(100, dtype=np.int64)
    kb = np.arange(100, 200, dtype=np.int64)
    a.add_many(ka)
    b.add_many(kb)
    a.merge(b)
    assert a.may_contain_many(ka).all() and a.may_contain_many(kb).all()


def test_roundtrip_bytes():
    b = Bloom(1 << 12, 3)
    b.add_many(np.array([7, -9, 123456789], dtype=np.int64))
    c = Bloom.from_bytes(b.to_bytes(), b.m_bits, b.k)
    assert c.may_contain_many(np.array([7, -9, 123456789], dtype=np.int64)).all()


def test_distributed_build_matches_local(spark):
    df = spark.range(0, 5000, 1, 8).selectExpr("xxhash64(id) as url_hash")
    bloom = build_bloom(df, "url_hash", 1 << 17, 5)
    keys = np.array([r[0] for r in df.collect()], dtype=np.int64)
    assert bloom.may_contain_many(keys).all()
