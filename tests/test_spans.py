"""Exact-substring (passage-level) dedup — planted repeated passages.

The ladder rung between whole-document exact dedup and shingle near-dup
(operators/dedup.py:token_span_rows + the passage_* registry queries):
cross-document repeated PASSAGES inside otherwise-distinct documents.
The reference's dedup unit is a URL (reference: pipelines.py:32-34);
this surface comes from the task directive's LLM-pipeline brief.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whakoom_webscrapper_spark.operators import dedup as D

# Each word distinct so no span collides by accident.
_PASSAGE = " ".join(f"p{i}" for i in range(12))  # 12-token shared passage


def _docs(spark):
    # doc 0 and doc 2 share the 12-token passage embedded in distinct
    # prefixes/suffixes; doc 1 is unrelated; doc 3 is shorter than one
    # span (whole-doc span).
    rows = [
        (0, "alpha beta gamma " + _PASSAGE + " delta epsilon zeta"),
        (1, " ".join(f"u{i}" for i in range(30))),
        (2, "one two three four five " + _PASSAGE + " six seven"),
        (3, "tiny doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_span_rows_positions_and_short_doc(spark):
    spans = D.token_span_rows(
        _docs(spark), "text", "doc_id", span_k=10, stride=5
    ).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["_pos"], r["_span"]))
    # doc 3 has 2 tokens < span_k → exactly one whole-doc span at pos 1
    assert by_doc[3] == [(1, "tiny doc")]
    # doc 1 has 30 tokens → starts 1,6,11,16,21 (last full start = 21)
    assert [p for p, _ in sorted(by_doc[1])] == [1, 6, 11, 16, 21]
    # every span except short-doc spans is exactly span_k tokens
    for doc, pairs in by_doc.items():
        for _pos, span in pairs:
            if doc != 3:
                assert len(span.split(" ")) == 10


def _crossdoc_dup_docs(df, stride):
    spans = D.token_span_rows(df, "text", "doc_id", span_k=10, stride=stride)
    h = spans.select("doc_id", F.md5("_span").alias("sh"))
    return {
        r["doc_id"]
        for r in h.groupBy("sh")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.collect_set("doc_id").alias("ds"),
        )
        .filter(F.col("nd") > 1)
        .select(F.explode("ds").alias("doc_id"))
        .collect()
    }


def test_stride1_catches_planted_passage_at_any_offset(spark):
    """stride=1 (the detection mode passage_dup_stats runs) catches an
    exact repeated span_k-token passage wherever the copies sit; a
    strided sampling (stride=5, offsets 3 vs 7 — not congruent mod 5)
    provably misses the same pair, which is why detection must be
    exhaustive over positions."""
    passage = " ".join(f"q{i}" for i in range(10))  # exactly span_k
    rows = [
        (0, "alpha beta gamma " + passage + " tail0 tail1"),  # offset 3
        (1, " ".join(f"u{i}" for i in range(30))),
        (2, "x0 x1 x2 x3 x4 x5 x6 " + passage),  # offset 7
    ]
    df = _spark_df(spark, rows)
    assert _crossdoc_dup_docs(df, stride=1) == {0, 2}
    assert _crossdoc_dup_docs(df, stride=5) == set()


def _spark_df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_disjoint_chunk_removal_keeps_first_occurrence(spark):
    """Removal semantics: disjoint chunks, globally-first occurrence of a
    repeated chunk survives, documents reconstruct from kept chunks."""
    ten = " ".join(f"c{i}" for i in range(10))  # one exact chunk
    rows = [
        (0, ten + " " + " ".join(f"a{i}" for i in range(10))),
        (1, ten + " " + " ".join(f"b{i}" for i in range(10))),
    ]
    df = _spark_df(spark, rows)
    chunks = D.token_span_rows(
        df, "text", "doc_id", span_k=10, stride=10
    ).withColumn("sh", F.md5("_span"))
    first = chunks.groupBy("sh").agg(
        F.min(F.struct(F.col("doc_id"), F.col("_pos"))).alias("f")
    )
    marked = chunks.join(first, "sh").withColumn(
        "kept",
        (F.col("doc_id") == F.col("f.doc_id"))
        & (F.col("_pos") == F.col("f._pos")),
    )
    out = {
        r["doc_id"]: (r["n"], r["txt"])
        for r in marked.groupBy("doc_id")
        .agg(
            F.count(F.when(F.col("kept"), 1)).alias("n"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("_pos", "_span"))
                        )
                    ),
                    lambda s: s["_span"],
                ),
                " ",
            ).alias("txt"),
        )
        .collect()
    }
    # doc 0 (lower id) keeps both chunks; doc 1 loses the shared one
    assert out[0] == (2, rows[0][1])
    assert out[1] == (1, " ".join(f"b{i}" for i in range(10)))


def test_registry_passage_queries_consistent(spark):
    """passage_dup_stats ⊆ docs with dup spans; passage_dedup_docs drops
    exactly (n_chunks - n_kept) chunks per doc and never grows text."""
    from whakoom_webscrapper_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    stats = Q.SPARK_QUERIES["passage_dup_stats"](spark, sf).collect()
    assert all(0 < r["n_dup_spans"] <= r["n_spans"] for r in stats)
    assert all(0.0 < r["dup_frac"] <= 1.0 for r in stats)
    ded = Q.SPARK_QUERIES["passage_dedup_docs"](spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    joined = ded.join(docs, "doc_id").collect()
    assert len(joined) == docs.count()
    for r in joined:
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        assert len(r["dedup_text"]) <= len(" ".join(r["text"].split()))


def test_contamination_flags_planted_leak(spark):
    """A training doc that contains a benchmark doc verbatim is flagged
    (overlap vs that bench doc ≈ 1); unrelated docs are not."""
    from whakoom_webscrapper_spark.functions import text as T

    bench_text = " ".join(f"e{i}" for i in range(20))
    rows = [
        (25, bench_text),  # benchmark doc (25 % 25 == 0)
        (7, bench_text + " extra0 extra1"),  # leaked: contains it verbatim
        (8, " ".join(f"z{i}" for i in range(20))),  # clean
    ]
    df = _spark_df(spark, rows)
    sh = df.select(
        "doc_id",
        F.explode(F.array_distinct(T.word_shingles(F.col("text"), 3))).alias(
            "shingle"
        ),
    )
    is_bench = F.col("doc_id") % 25 == 0
    bench = sh.filter(is_bench).select(
        F.col("doc_id").alias("bench_doc"), "shingle"
    )
    train = sh.filter(~is_bench)
    sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    hits = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = {
        r["doc_id"]: (r["bench_doc"], r["n_shared"] / r["n"])
        for r in hits.join(sizes, "doc_id").collect()
    }
    assert out[7][0] == 25 and out[7][1] >= 0.5
    assert 8 not in out


def test_span_rows_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        D.token_span_rows(_docs(spark), "text", "doc_id", span_k=0)
    with pytest.raises(ValueError):
        D.token_span_rows(_docs(spark), "text", "doc_id", stride=0)
