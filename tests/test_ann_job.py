"""End-to-end gate for jobs/ann.py: persisted IVFADC index + query.

Build writes codebooks.npz + the coded corpus; query reloads BOTH from
disk (nothing retrained, nothing re-encoded) and must still clear the
recall gate against brute force on the clustered corpus — proving the
index artifact is the whole state a query session needs.
"""

from __future__ import annotations

import os
import tempfile

import ann as ann_job
from pyspark.sql import functions as F

from tests.conftest import run_job
from whakoom_webscrapper_spark import datagen
from whakoom_webscrapper_spark.operators import similarity as S


def _run(argv, capsys):
    return run_job(ann_job, argv, capsys)


def test_ann_index_build_then_query_from_disk(spark, capsys):
    d = tempfile.mkdtemp(prefix="ann_job_")
    emb = datagen.gen_clustered_embeddings(spark, 2000, n_clusters=20)
    corpus_path, queries_path = f"{d}/emb", f"{d}/queries"
    corpus = emb.filter(F.col("vec_id") >= 8)
    corpus.write.parquet(corpus_path)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    q.write.parquet(queries_path)

    stats = _run(
        ["build", "--input", corpus_path, "--out", f"{d}/ix",
         "--n-centroids", "128"],
        capsys,
    )
    assert stats["rows_indexed"] == 1992
    assert os.path.exists(f"{d}/ix/codebooks.npz")

    qstats = _run(
        ["query", "--index", f"{d}/ix", "--queries", queries_path,
         "--k", "10", "--nprobe", "5", "--shortlist", "192",
         "--out", f"{d}/hits"],
        capsys,
    )
    assert qstats["hits"] == 80  # 8 queries x k=10

    exact = {}
    for r in S.brute_force_topk(corpus, q, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in spark.read.parquet(f"{d}/hits").collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(
        len(exact[qid] & got.get(qid, set())) / len(exact[qid]) for qid in exact
    ) / len(exact)
    assert recall >= 0.9, f"from-disk index recall {recall}"


def test_query_refuses_uncommitted_index(spark, capsys, tmp_path):
    """codebooks.npz is the build's commit record (written last, via
    tmp+rename): a crash mid-build leaves coded data but no npz, and
    query must refuse it loudly instead of serving a half-built index."""
    import pytest

    (tmp_path / "ix").mkdir()
    with pytest.raises(SystemExit, match="did not[\\s\\S]*commit"):
        _run(
            ["query", "--index", str(tmp_path / "ix"),
             "--queries", "/nonexistent.parquet"],
            capsys,
        )


def test_trainers_raise_on_empty_corpus(spark):
    empty = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        F.lit(False)
    )
    import pytest

    with pytest.raises(ValueError, match="empty corpus"):
        S.train_centroids(empty)
    with pytest.raises(ValueError, match="empty corpus"):
        S.train_pq(empty)


def _build_small_index(spark, capsys, d):
    emb = datagen.gen_clustered_embeddings(spark, 1000, n_clusters=10)
    corpus = emb.filter(F.col("vec_id") >= 4)
    corpus.write.parquet(f"{d}/emb")
    emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).write.parquet(f"{d}/queries")
    stats = _run(
        ["build", "--input", f"{d}/emb", "--out", f"{d}/ix",
         "--n-centroids", "64"],
        capsys,
    )
    return corpus, stats


def _hit_ids(spark, d):
    return {
        r["vec_id"] for r in spark.read.parquet(f"{d}/hits").collect()
    }


def test_invalidate_excludes_revoked_ids_from_query(spark, capsys):
    """Query-after-invalidate serves no revoked id — WITHOUT a rebuild:
    the tombstone ledger is anti-joined on every serve, mirroring the
    crawl's read_seen ledger subtraction (r4 verdict: the coded corpus
    was append-only; dedup/re-crawl had no way to stop a vector)."""
    d = tempfile.mkdtemp(prefix="ann_inv_")
    _build_small_index(spark, capsys, d)
    qargs = ["query", "--index", f"{d}/ix", "--queries", f"{d}/queries",
             "--k", "5", "--nprobe", "4", "--shortlist", "96",
             "--out", f"{d}/hits"]
    _run(qargs, capsys)
    before = _hit_ids(spark, d)
    assert before, "baseline query returned nothing"

    # revoke every id the baseline served — the strongest exclusion test
    spark.createDataFrame(
        [(int(i),) for i in before], "vec_id long"
    ).write.parquet(f"{d}/revoked")
    inv = _run(
        ["invalidate", "--index", f"{d}/ix", "--ids", f"{d}/revoked"],
        capsys,
    )
    assert inv["revoked"] == len(before)
    assert inv["tombstones_total"] == len(before)

    _run(qargs, capsys)
    after = _hit_ids(spark, d)
    assert after.isdisjoint(before)
    assert len(after) > 0  # next-best neighbors now serve


def test_compact_rewrites_coded_and_clears_ledger(spark, capsys):
    d = tempfile.mkdtemp(prefix="ann_cmp_")
    _build_small_index(spark, capsys, d)
    n0 = spark.read.parquet(f"{d}/ix/coded").count()
    revoked = spark.read.parquet(f"{d}/emb").select("vec_id").limit(50)
    revoked.write.parquet(f"{d}/revoked")
    _run(["invalidate", "--index", f"{d}/ix", "--ids", f"{d}/revoked"],
         capsys)

    # below min-frac: refuse (the anti-join is cheap; don't churn IO)
    out = _run(["compact", "--index", f"{d}/ix", "--min-frac", "0.9"],
               capsys)
    assert not out["compacted"] and out["reason"] == "below_min_frac"
    assert os.path.isdir(f"{d}/ix/tombstones")

    out = _run(["compact", "--index", f"{d}/ix", "--min-frac", "0.0"],
               capsys)
    assert out["compacted"] and out["removed"] == 50
    assert spark.read.parquet(f"{d}/ix/coded").count() == n0 - 50
    assert not os.path.isdir(f"{d}/ix/tombstones")
    # idempotent: nothing left to compact
    out = _run(["compact", "--index", f"{d}/ix", "--min-frac", "0.0"],
               capsys)
    assert not out["compacted"] and out["reason"] == "no_tombstones"

    # revoked ids stay excluded after the ledger is folded into coded
    _run(["query", "--index", f"{d}/ix", "--queries", f"{d}/queries",
          "--k", "5", "--nprobe", "4", "--shortlist", "96",
          "--out", f"{d}/hits"], capsys)
    gone = {r["vec_id"] for r in revoked.collect()}
    assert _hit_ids(spark, d).isdisjoint(gone)


def test_compaction_crash_windows_recover(spark, capsys):
    """The swap is two renames; the only window with no coded dir is
    between them and tombstones are never cleared before the swap — so
    recovery restores the old dir (ledger still applies) and the served
    results are identical to the pre-crash index."""
    import shutil

    d = tempfile.mkdtemp(prefix="ann_crash_")
    _build_small_index(spark, capsys, d)
    spark.read.parquet(f"{d}/emb").select("vec_id").limit(
        20).write.parquet(f"{d}/revoked")
    _run(["invalidate", "--index", f"{d}/ix", "--ids", f"{d}/revoked"],
         capsys)
    qargs = ["query", "--index", f"{d}/ix", "--queries", f"{d}/queries",
             "--k", "5", "--nprobe", "4", "--shortlist", "96",
             "--out", f"{d}/hits"]
    _run(qargs, capsys)
    want = _hit_ids(spark, d)

    # crash between the two renames: coded gone, .coded_old_* holds it
    os.rename(f"{d}/ix/coded", f"{d}/ix/.coded_old_deadbeef")
    _run(qargs, capsys)
    assert _hit_ids(spark, d) == want
    assert os.path.isdir(f"{d}/ix/coded")

    # crash after the swap, before cleanup: stale tmp + old dirs linger
    shutil.copytree(f"{d}/ix/coded", f"{d}/ix/.coded_old_feedface")
    shutil.copytree(f"{d}/ix/coded", f"{d}/ix/.coded_compact_tmp_ab")
    _run(qargs, capsys)
    assert _hit_ids(spark, d) == want
    assert not os.path.isdir(f"{d}/ix/.coded_old_feedface")
    assert not os.path.isdir(f"{d}/ix/.coded_compact_tmp_ab")
