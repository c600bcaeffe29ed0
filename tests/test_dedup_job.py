"""End-to-end gate for jobs/dedup.py (pairs → clusters → survivors).

The job is the operational wrapper around operators/dedup.py pair
generation + operators/components.py closure/survivor selection; the
unit invariants live in test_dedup.py / test_components.py. Pinned
here: the CLI wiring itself — arg parsing, stats JSON contract, parquet
output — against a hand-checkable world, for both the default
latest-wins policy and --prefer ranking.
"""

from __future__ import annotations

import os
import tempfile

import dedup as dedup_job
import pytest
from pyspark.sql import functions as F

from tests.conftest import run_job


@pytest.fixture(scope="module")
def table(spark):
    """30 rows, 10 distinct texts (ids i and i%10 collide) → every
    cluster is {i, i+10, i+20}; quality q descends with id so prefer-q
    and latest-wins pick different survivors."""
    d = tempfile.mkdtemp(prefix="dedup_job_")
    path = os.path.join(d, "docs")
    # longtext: 30 words drawn from a per-group-disjoint vocabulary, so
    # cross-group Jaccard is 0 and minhash must find the same 10 clusters
    # the exact method does on `text`
    rows = [
        (
            i,
            f"text body number {i % 10}",
            " ".join(f"w{(i % 10) * 37 + j}" for j in range(30)),
            100 - i,
        )
        for i in range(30)
    ]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, longtext: string, q: long"
    ).write.mode("overwrite").parquet(path)
    return path


def _run(argv, capsys):
    return run_job(dedup_job, argv, capsys)


def test_exact_dedup_latest_wins(spark, table, capsys):
    out_dir = tempfile.mkdtemp(prefix="dedup_out_") + "/survivors"
    stats = _run(
        ["--input", table, "--id-col", "doc_id", "--method", "exact",
         "--text-col", "text", "--out", out_dir],
        capsys,
    )
    assert stats == {
        "rows_in": 30,
        "dup_pairs": 30,  # 10 clusters x C(3,2) pairs
        "clustered_rows": 30,
        "clusters": 10,
        "rows_out": 10,
        "dropped": 20,
        "method": "exact",
    }
    survivors = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert survivors == set(range(20, 30))  # highest id per cluster


def test_exact_dedup_prefer_column(spark, table, capsys):
    stats = _run(
        ["--input", table, "--id-col", "doc_id", "--method", "exact",
         "--text-col", "text", "--prefer", "q"],
        capsys,
    )
    assert stats["rows_out"] == 10
    # without --out the job still counts survivors; re-run the selection
    # to check WHICH rows win under the quality policy (q = 100 - id →
    # the LOWEST id per cluster)
    from whakoom_webscrapper_spark.operators import components as C

    df = spark.read.parquet(table)

    class A:
        method, id_col, text_col = "exact", "doc_id", "text"

    pairs = dedup_job.build_pairs(df, A)
    surv = {
        r["doc_id"]
        for r in C.dedup_canonical(
            df, pairs, "doc_id", src="id_a", dst="id_b", prefer="q"
        ).collect()
    }
    assert surv == set(range(10))


def test_exact_dedup_ignores_null_text(spark, capsys):
    """Null-text rows must not be clustered together (Spark's xxhash64
    returns the seed for all-null input, so without the filter every
    null-text row would collide into one giant bogus component)."""
    d = tempfile.mkdtemp(prefix="dedup_null_")
    path = os.path.join(d, "docs")
    rows = [(0, "same"), (1, "same"), (2, None), (3, None), (4, None)]
    spark.createDataFrame(rows, "doc_id: long, text: string").write.mode(
        "overwrite"
    ).parquet(path)
    stats = _run(
        ["--input", path, "--id-col", "doc_id", "--method", "exact",
         "--text-col", "text"],
        capsys,
    )
    # only the real duplicate pair (0,1) clusters; null-text rows survive
    assert stats["dup_pairs"] == 1
    assert stats["clusters"] == 1
    assert stats["rows_out"] == 4  # 5 - 1 dropped duplicate


def test_simhash_refuses_wide_radius(spark, table, capsys):
    """--max-hamming > 3 exceeds what the 4-band simhash structure
    guarantees recall for; the job must refuse, not silently clamp."""
    with pytest.raises(ValueError, match="max-hamming"):
        _run(
            ["--input", table, "--id-col", "doc_id", "--method", "simhash",
             "--text-col", "longtext", "--max-hamming", "6"],
            capsys,
        )


def test_minhash_method_runs(spark, table, capsys):
    stats = _run(
        ["--input", table, "--id-col", "doc_id", "--method", "minhash",
         "--text-col", "longtext"],
        capsys,
    )
    # identical texts are trivially minhash-identical; disjoint
    # vocabularies across groups → exactly the exact-method clusters
    assert stats["rows_out"] == 10
    assert stats["clusters"] == 10


def test_minhash_verify_tau_keeps_true_dups_drops_near_miss(spark, capsys):
    """--verify-tau re-checks LSH candidates with exact Jaccard: a pair
    of texts sharing only a sliver of vocabulary (banding can still
    propose them on a lucky band) must NOT merge under a high tau, while
    identical texts always do."""
    d = tempfile.mkdtemp(prefix="dedup_vtau_")
    path = os.path.join(d, "docs")
    dup = " ".join(f"a{j}" for j in range(30))
    rows = [(0, dup), (1, dup),
            (2, " ".join(f"b{j}" for j in range(30))),
            (3, " ".join(f"c{j}" for j in range(30)))]
    spark.createDataFrame(rows, "doc_id: long, text: string").write.mode(
        "overwrite"
    ).parquet(path)
    base = ["--input", path, "--id-col", "doc_id", "--method", "minhash",
            "--text-col", "text"]
    stats = _run(base + ["--verify-tau", "0.9"], capsys)
    assert stats["verify_tau"] == 0.9
    assert stats["rows_out"] == 3  # {0,1} merged, 2 and 3 survive alone
    assert stats["clusters"] == 1
    # verified survivor set is a superset of the unverified one:
    # verification only removes edges, clusters only split
    unverified = _run(base, capsys)
    assert unverified["rows_out"] <= stats["rows_out"]


def test_verify_tau_rejects_non_minhash(spark, table, capsys):
    with pytest.raises(ValueError, match="verify-tau"):
        _run(
            ["--input", table, "--id-col", "doc_id", "--method", "exact",
             "--text-col", "text", "--verify-tau", "0.5"],
            capsys,
        )


def test_passage_method_rewrites_text_in_place(spark, capsys):
    """--method passage is sub-document surgery: rows all survive, the
    repeated chunk is cut everywhere but its first occurrence, null-text
    rows pass through untouched."""
    d = tempfile.mkdtemp(prefix="dedup_passage_")
    ten = " ".join(f"c{i}" for i in range(10))
    tail_a = " ".join(f"a{i}" for i in range(10))
    tail_b = " ".join(f"b{i}" for i in range(10))
    rows = [(0, f"{ten} {tail_a}"), (1, f"{ten} {tail_b}"), (2, None)]
    spark.createDataFrame(rows, "doc_id: long, text: string").write.parquet(
        f"{d}/docs"
    )
    stats = _run(
        ["--input", f"{d}/docs", "--id-col", "doc_id", "--method", "passage",
         "--text-col", "text", "--out", f"{d}/out"],
        capsys,
    )
    assert stats["rows_in"] == stats["rows_out"] == 3
    assert stats["chunks_total"] == 4 and stats["chunks_removed"] == 1
    got = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(f"{d}/out").collect()}
    assert got[0] == f"{ten} {tail_a}"   # first occurrence keeps the chunk
    assert got[1] == tail_b              # later copy loses it
    assert got[2] is None                # null text untouched


# ---------------------------------------------------------------------------
# Incremental mode (--against / --against-bands / --emit-bands)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def epoch_world(spark):
    """A deduped corpus (3 unique docs) + a new epoch batch containing:
    one exact dup of a corpus doc, one near-dup of a corpus doc (same
    30-word body), one intra-batch dup pair, and one genuinely new doc."""
    d = tempfile.mkdtemp(prefix="dedup_incr_")
    corpus_path, batch_path = os.path.join(d, "corpus"), os.path.join(d, "batch")

    def body(k):
        return " ".join(f"v{k * 53 + j}" for j in range(30))

    corpus = [(i, body(i), 50 - i) for i in range(3)]
    batch = [
        (100, body(0), 1),   # duplicate of corpus doc 0
        (101, body(7), 2),   # intra-batch pair with 102
        (102, body(7), 3),
        (103, body(9), 4),   # genuinely new
    ]
    spark.createDataFrame(corpus, "doc_id: long, text: string, q: long") \
        .write.mode("overwrite").parquet(corpus_path)
    spark.createDataFrame(batch, "doc_id: long, text: string, q: long") \
        .write.mode("overwrite").parquet(batch_path)
    return corpus_path, batch_path


@pytest.mark.parametrize("method", ["exact", "minhash"])
def test_incremental_against_corpus(spark, epoch_world, method, capsys):
    corpus_path, batch_path = epoch_world
    out_dir = tempfile.mkdtemp(prefix="dedup_incr_out_") + "/survivors"
    stats = _run(
        ["--input", batch_path, "--id-col", "doc_id", "--method", method,
         "--text-col", "text", "--against", corpus_path, "--out", out_dir],
        capsys,
    )
    assert stats["incremental"] is True
    assert stats["rows_in"] == 4
    assert stats["vs_corpus_dropped"] == 1          # doc 100 ≡ corpus doc 0
    assert stats["rows_out"] == 2                   # one of {101,102} + 103
    kept = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert 103 in kept
    assert len(kept & {101, 102}) == 1
    assert 100 not in kept


def test_incremental_bands_sidecar_equivalent(spark, epoch_world, capsys):
    """--against-bands on a persisted sidecar must reproduce the full
    --against run, and --emit-bands must write keys identical to
    recomputing them from the survivor parquet."""
    from whakoom_webscrapper_spark.operators import dedup as D

    corpus_path, batch_path = epoch_world
    d = tempfile.mkdtemp(prefix="dedup_bands_")
    sidecar = os.path.join(d, "corpus_bands")
    out_dir = os.path.join(d, "survivors")
    emitted = os.path.join(d, "survivor_bands")
    D.lsh_band_keys(spark.read.parquet(corpus_path)).write.parquet(sidecar)
    stats = _run(
        ["--input", batch_path, "--id-col", "doc_id", "--method", "minhash",
         "--text-col", "text", "--against", corpus_path,
         "--against-bands", sidecar, "--out", out_dir,
         "--emit-bands", emitted],
        capsys,
    )
    assert stats["vs_corpus_dropped"] == 1 and stats["rows_out"] == 2
    got = {tuple(r) for r in spark.read.parquet(emitted).collect()}
    expect = {
        tuple(r)
        for r in D.lsh_band_keys(spark.read.parquet(out_dir)).collect()
    }
    assert got == expect and len(got) > 0


def test_incremental_rejects_unsupported_method(spark, epoch_world, capsys):
    corpus_path, batch_path = epoch_world
    with pytest.raises(ValueError, match="exact/minhash"):
        _run(
            ["--input", batch_path, "--id-col", "doc_id", "--method",
             "simhash", "--text-col", "text", "--against", corpus_path],
            capsys,
        )
