"""MinHash production-path invariants (operators/dedup.py).

The portable md5 twin is pinned bit-exact by the DuckDB oracle
(queries.py:minhash_signatures). The xxhash64+affine production path has
no SQL oracle, so its contract is tested here: signature shape, value
range, determinism, and — the property that matters — LSH over the fast
signatures finds the planted near-dup pairs that the portable path finds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.operators import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),
    (2, "completely different text about spark shuffle partitions and joins"),
    (3, "completely different text about spark shuffle partitions and joins"),
    (4, "unrelated third document mentioning bloom filters and url frontiers"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_fast_signatures_shape_and_range(spark):
    sig = D.minhash_signatures(_docs(spark), n_perms=8, portable=False)
    rows = sig.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["perm"])
        assert 0 <= r["minhash"] < D.MINHASH_PRIME
    assert all(perms == set(range(8)) for perms in per_doc.values())


def test_fast_signatures_deterministic(spark):
    a = sorted(map(tuple, D.minhash_signatures(_docs(spark), portable=False).collect()))
    b = sorted(map(tuple, D.minhash_signatures(_docs(spark), portable=False).collect()))
    assert a == b


def test_fast_lsh_finds_planted_pairs(spark):
    """Exact dups MUST pair under any hash; the near-dup (0,1) pair must
    be found by the fast path wherever the portable path finds it (same
    banding, both are uniform hashes of the same shingle sets)."""
    docs = _docs(spark)
    fast = D.lsh_candidate_pairs(
        D.minhash_signatures(docs, portable=False), band_rows=2
    )
    pairs_fast = {(r["id_a"], r["id_b"]) for r in fast.collect()}
    assert (2, 3) in pairs_fast  # exact dup: identical signatures always band
    portable = D.lsh_candidate_pairs(
        D.minhash_signatures(docs, portable=True), band_rows=2
    )
    pairs_portable = {(r["id_a"], r["id_b"]) for r in portable.collect()}
    assert (2, 3) in pairs_portable
    # no false pairs against the unrelated doc under either hash
    assert not any(4 in p for p in pairs_fast)


def test_affine_params_distinct_and_in_range():
    a, b = D._affine_params(16)
    assert len(set(zip(a, b))) == 16
    assert all(1 <= x < D.MINHASH_PRIME for x in a)
    assert all(0 <= x < D.MINHASH_PRIME for x in b)


def test_fast_band_join_matches_banded_signatures(spark):
    """The int64-band-hash path (lsh_candidate_pairs_fast) must produce
    exactly the pairs that banding the same affine signatures the
    portable way (collect_list + string band key) produces — the key
    representation is the only difference."""
    docs = _docs(spark)
    sig = D.minhash_signatures(docs, n_perms=8, shingle_k=3, portable=False)
    via_strings = sorted(
        map(tuple, D.lsh_candidate_pairs(sig, band_rows=2).collect())
    )
    via_hash = sorted(
        map(
            tuple,
            D.lsh_candidate_pairs_fast(
                docs, n_perms=8, shingle_k=3, band_rows=2
            ).collect(),
        )
    )
    assert via_hash == via_strings
    assert [2, 3] in [sorted(p) for p in via_hash]  # exact dup pair survives


# ---------------------------------------------------------------------------
# LSH candidate -> exact-Jaccard verify composition (minhash_verified_pairs)
# ---------------------------------------------------------------------------


def test_minhash_verified_pairs_is_thresholded_candidates(spark):
    """verified == {candidate pairs with exact 3-shingle Jaccard >= tau},
    cross-checked against a pure-Python Jaccard on the same corpus."""
    import re

    from whakoom_webscrapper_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in Q.SPARK_QUERIES["minhash_lsh_pairs"](spark, sf).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in Q.SPARK_QUERIES["minhash_verified_pairs"](spark, sf).collect()
    }
    assert set(verified) <= cand

    def shingles(text):
        words = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
        if len(words) < 3:
            return {" ".join(words)}
        return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}

    docs = {
        r["doc_id"]: shingles(r["text"])
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    for a, b in cand:
        sa, sb = docs[a], docs[b]
        jac = len(sa & sb) / len(sa | sb)
        if jac >= Q.VERIFY_TAU:
            assert (a, b) in verified
            assert abs(verified[(a, b)] - jac) < 1e-4
        else:
            assert (a, b) not in verified


def test_verified_canonical_keeps_superset_of_unverified(spark):
    """Verification only removes edges, so dup clusters can only split,
    and per-cluster argmax survivors of the unverified pipeline remain
    survivors of the verified one: kept_unverified <= kept_verified."""
    from whakoom_webscrapper_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    unverified = {
        r["doc_id"]
        for r in Q.SPARK_QUERIES["docs_dedup_canonical"](spark, sf).collect()
    }
    verified = {
        r["doc_id"]
        for r in Q.SPARK_QUERIES["docs_dedup_verified_canonical"](
            spark, sf
        ).collect()
    }
    assert unverified <= verified


def test_verify_pairs_jaccard_small_corpus_and_null_text(spark):
    """Focused gate for the round-6 map-only set build inside
    verify_pairs_jaccard: exact Jaccard against a pure-Python reference
    on a tiny corpus, plus the null-text edge — a candidate pair naming
    a null-text doc carries a null set (it used to have NO set row) and
    must be dropped by the tau filter either way."""
    docs = spark.createDataFrame(
        DOCS + [(5, None)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (0, 4), (4, 5)], ["id_a", "id_b"]
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.verify_pairs_jaccard(
            docs, pairs, text_col="text", id_col="doc_id",
            shingle_k=3, tau=0.5,
        ).collect()
    }

    def sh(text):
        w = text.strip().lower().split()
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    ref = {}
    by_id = dict(DOCS)
    for a, b in [(0, 1), (2, 3), (0, 4)]:
        sa, sb = sh(by_id[a]), sh(by_id[b])
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            ref[(a, b)] = j
    assert set(out) == set(ref)
    for k, j in ref.items():
        assert abs(out[k] - j) < 1e-9
    assert (4, 5) not in out  # null-text pair dropped, not erroring
