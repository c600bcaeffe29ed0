"""Image-corpus pHash near-dup: combination-block banding vs brute force.

The operator under test is ``operators/dedup.py:hamming_dup_pairs`` over
the materialized input-hint table (``images_corpus.py``). Gates:

1. the banded plan returns EXACTLY the brute-force O(n^2) numpy pair set
   (the guarantee is exact recall, not approximate — pigeonhole over
   combination blocks, see the operator docstring);
2. every planted twin pair is found (the corpus plants them within the
   threshold by construction);
3. the exact-recall precondition raises when violated;
4. decoding the corpus bytes and recomputing the pHash reproduces the
   stored ``phash`` column bit-for-bit (ties the stored column to the
   decode path the crawl validates per row).
"""

from __future__ import annotations

import numpy as np
import pytest

from whakoom_webscrapper_spark import images_corpus as IC
from whakoom_webscrapper_spark import imaging as I
from whakoom_webscrapper_spark.operators import dedup as D


def _brute_pairs(ids: list[str], hashes: list[int], max_hamming: int) -> set:
    h = np.array(hashes, dtype=np.int64).astype(np.uint64)
    x = h[:, None] ^ h[None, :]
    pc = np.zeros_like(x, dtype=np.int64)
    v = x.copy()
    for _ in range(64):
        pc += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    out = set()
    n = len(ids)
    for a in range(n):
        for b in range(n):
            if ids[a] < ids[b] and pc[a, b] <= max_hamming:
                out.add((ids[a], ids[b], int(pc[a, b])))
    return out


@pytest.fixture(scope="module")
def corpus_pdf():
    return IC.corpus_pdf(400)  # 400 base + 80 twins: fast, same generator


def test_banded_equals_brute_force(spark, corpus_pdf):
    df = spark.createDataFrame(corpus_pdf[["image_id", "phash"]])
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_dup_pairs(
            df, max_hamming=IC.TWIN_MAX_HAMMING, n_blocks=8, combo=2
        ).collect()
    }
    want = _brute_pairs(
        corpus_pdf["image_id"].tolist(),
        corpus_pdf["phash"].tolist(),
        IC.TWIN_MAX_HAMMING,
    )
    assert got == want
    assert len(want) >= 80  # at least the planted twins


def test_planted_twins_all_found(spark, corpus_pdf):
    df = spark.createDataFrame(corpus_pdf[["image_id", "phash"]])
    got = {
        (r.id_a, r.id_b)
        for r in D.hamming_dup_pairs(
            df, max_hamming=IC.TWIN_MAX_HAMMING, n_blocks=8, combo=2
        ).collect()
    }
    planted = {
        (IC.D.image_id_of(i), IC.twin_id_of(i)) for i in range(0, 400, IC.TWIN_EVERY)
    }
    assert planted <= got


def test_guarantee_precondition_raises(spark, corpus_pdf):
    df = spark.createDataFrame(corpus_pdf[["image_id", "phash"]].head(4))
    with pytest.raises(ValueError, match="exact-recall"):
        D.hamming_dup_pairs(df, max_hamming=7, n_blocks=8, combo=2)
    with pytest.raises(ValueError, match="divisible"):
        D.hamming_dup_pairs(df, max_hamming=3, n_blocks=7, combo=2)


def test_stored_phash_matches_decode(corpus_pdf):
    sample = corpus_pdf.iloc[:: len(corpus_pdf) // 24]
    for _, row in sample.iterrows():
        px = I.decode_image(bytes(row["bytes"]), row["fmt"])
        if row["fmt"] == "jpeg":
            # lossy: recomputed pHash must sit within the near-dup radius
            ham = bin(
                (I.phash64(px) ^ int(row["phash"])) & ((1 << 64) - 1)
            ).count("1")
            assert ham <= IC.TWIN_MAX_HAMMING
        else:
            assert I.phash64(px) == int(row["phash"])
