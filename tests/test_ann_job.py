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
