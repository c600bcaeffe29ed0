"""operators/quality.py — repetition stats, split assignment, per-source
cap, PII scrub. Planted inputs with hand-computed expectations."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from whakoom_webscrapper_spark.operators import quality as Q


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_stats_planted(spark):
    rows = [
        # "a b a b a b": bigrams = [a b, b a, a b, b a, a b] -> top "a b" 3/5
        # 5-grams: [a b a b a, b a b a b] distinct -> dup 0
        (1, "s", "a b a b a b"),
        # all same word: bigrams all "x x" -> top 1.0; 5-grams 4 total,
        # 1 distinct -> dup 3/4
        (2, "s", "x x x x x x x x"),
        # no repetition at all
        (3, "s", "one two three four five six"),
        # shorter than every n-gram width
        (4, "s", "solo"),
        # empty
        (5, "s", ""),
    ]
    out = {
        r["doc_id"]: r
        for r in Q.repetition_stats(_docs(spark, rows)).collect()
    }
    assert out[1]["n_words"] == 6
    assert out[1]["top_2gram_frac"] == pytest.approx(3 / 5, abs=1e-5)
    assert out[1]["dup_5gram_frac"] == 0.0
    assert out[2]["top_2gram_frac"] == 1.0
    assert out[2]["dup_5gram_frac"] == pytest.approx(3 / 4, abs=1e-5)
    assert out[3]["top_2gram_frac"] == pytest.approx(1 / 5, abs=1e-5)
    assert out[3]["dup_5gram_frac"] == 0.0
    assert out[4]["n_words"] == 1
    assert out[4]["top_2gram_frac"] == 0.0
    assert out[4]["dup_5gram_frac"] == 0.0
    assert out[5]["n_words"] == 0
    assert out[5]["top_2gram_frac"] == 0.0


def test_word_ngrams_hof(spark):
    df = spark.range(1).select(
        Q.word_ngrams(F.lit("a b c d"), 3).alias("g"),
        Q.word_ngrams(F.lit("a b"), 3).alias("short"),
        Q.word_ngrams(F.lit("a b c"), 1).alias("uni"),
    )
    r = df.first()
    assert r["g"] == ["a b c", "b c d"]
    assert r["short"] == []
    assert r["uni"] == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# assign_split
# ---------------------------------------------------------------------------


def test_assign_split_matches_python_md5_and_is_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: (r["bucket"], r["split"]) for r in Q.assign_split(df).collect()}
    for doc_id in (0, 1, 7, 42, 1999):
        expect = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 256
        assert got[doc_id][0] == expect
        assert got[doc_id][1] == ("holdout" if expect < 13 else "train")
    # partitioning-independence: same assignment after a repartition
    again = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in Q.assign_split(df.repartition(7)).collect()
    }
    assert again == got
    # holdout fraction near 13/256 on 2000 ids
    n_hold = sum(1 for b, s in got.values() if s == "holdout")
    assert 0.02 < n_hold / 2000 < 0.09


def test_assign_split_bad_buckets():
    with pytest.raises(ValueError):
        Q.md5_bucket(F.lit("x"), n_buckets=100)


# ---------------------------------------------------------------------------
# cap_per_source
# ---------------------------------------------------------------------------


def test_cap_per_source_keeps_longest_deterministically(spark):
    rows = [
        (1, "a", "xxxx"),
        (2, "a", "xxx"),
        (3, "a", "xx"),
        (4, "a", "xxx"),  # same length as 2 -> doc_id tie-break keeps 2 first
        (5, "b", "y"),
    ]
    out = Q.cap_per_source(_docs(spark, rows), cap=2).collect()
    kept = {(r["source"], r["doc_id"]): r["src_rank"] for r in out}
    assert kept == {("a", 1): 1, ("a", 2): 2, ("b", 5): 1}


def test_cap_per_source_salted_equals_single_window_on_skewed_fixture(spark):
    """Round-5 verdict item 1 done-criterion: the salted two-stage
    top-cap must reproduce the single-window ranking EXACTLY on a skewed
    fixture (one source with 100x the rows of the others), for several
    salt counts including degenerate n_salts=1."""
    from pyspark.sql import Window

    rows = [
        # mega-source: 300 rows, text lengths cycle so there are plenty
        # of length ties resolved by the doc_id tie-break
        *[(i, "mega", "x" * (1 + i % 7)) for i in range(300)],
        *[(1000 + i, "s1", "y" * (1 + i)) for i in range(3)],
        (2000, "s2", "z"),
    ]
    df = _docs(spark, rows)
    w = Window.partitionBy("source").orderBy(
        F.length(F.col("text")).desc(), F.col("doc_id")
    )
    expected = sorted(
        (r["doc_id"], r["source"], r["src_rank"])
        for r in df.withColumn("src_rank", F.row_number().over(w))
        .filter(F.col("src_rank") <= 10)
        .collect()
    )
    for n_salts in (1, 4, 32):
        got = sorted(
            (r["doc_id"], r["source"], r["src_rank"])
            for r in Q.cap_per_source(df, cap=10, n_salts=n_salts)
            .select("doc_id", "source", "src_rank")
            .collect()
        )
        assert got == expected, f"n_salts={n_salts}"


def test_repetition_stats_plan_is_map_only(spark):
    """Round-6 rewrite gate: both Gopher metrics are per-document, so the
    plan must contain no Exchange (and no join) at all."""
    df = _docs(spark, [(1, "s", "a b a b"), (2, "s", "c d e")])
    out = Q.repetition_stats(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------------
# pii_scrub / pii_counts
# ---------------------------------------------------------------------------


def test_pii_scrub_and_counts(spark):
    txt = (
        "mail bob.smith+x@corp.example.org or root@10.1.2.3 "
        "call +44 020 7946 0958 backup 192.168.0.1 clean words"
    )
    n_e, n_i, n_p = Q.pii_counts(F.lit(txt))
    r = spark.range(1).select(
        Q.pii_scrub(F.lit(txt)).alias("s"),
        n_e.alias("e"),
        n_i.alias("i"),
        n_p.alias("p"),
    ).first()
    assert r["e"] == 1  # root@10.1.2.3 is NOT an email (TLD must be alpha)
    assert r["i"] == 2  # 10.1.2.3 and 192.168.0.1
    assert r["p"] == 1
    assert "<EMAIL>" in r["s"] and "<IP>" in r["s"] and "<PHONE>" in r["s"]
    assert "bob.smith" not in r["s"]
    assert "192.168" not in r["s"]
    assert "7946" not in r["s"]
    assert "clean words" in r["s"]


def test_pii_scrub_no_pii_is_identity(spark):
    txt = "just ordinary words with no contact details at all"
    r = spark.range(1).select(Q.pii_scrub(F.lit(txt)).alias("s")).first()
    assert r["s"] == txt


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_membership_matches_python_md5(spark):
    df = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, F.lit("en")).otherwise(F.lit("es")),
        )
    )
    rates = {"en": 3277 / 65536, "es": 16384 / 65536}
    kept = {
        r["doc_id"]: (r["lang"], r["sample_bucket"])
        for r in Q.stratified_sample(df, rates).collect()
    }
    # exact membership: replay the md5 arithmetic in pure Python
    for doc_id in range(3000):
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        thresh = 3277 if doc_id % 3 == 0 else 16384
        assert (doc_id in kept) == (b < thresh), doc_id
        if doc_id in kept:
            assert kept[doc_id][1] == b
    # kept fractions near the configured rates
    n_en = sum(1 for lg, _ in kept.values() if lg == "en")
    n_es = len(kept) - n_en
    assert 0.02 < n_en / 1000 < 0.09  # ~5%
    assert 0.18 < n_es / 2000 < 0.32  # ~25%


def test_stratified_sample_stable_under_repartition_and_default_rate(spark):
    df = (
        spark.range(0, 500)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 2 == 0, F.lit("en")).otherwise(F.lit("xx")),
        )
    )
    rates = {"en": 0.25}
    one = sorted(r["doc_id"] for r in Q.stratified_sample(df, rates).collect())
    two = sorted(
        r["doc_id"] for r in Q.stratified_sample(df.repartition(11), rates).collect()
    )
    assert one == two
    # default_rate=0 drops every stratum without a configured rate
    assert all(d % 2 == 0 for d in one)
    # default_rate=1 keeps all of them
    everything = Q.stratified_sample(df, rates, default_rate=1.0)
    n_xx = everything.filter(F.col("lang") == "xx").count()
    assert n_xx == 250


def test_stratified_sample_rejects_bad_rate(spark):
    df = spark.range(1).withColumnRenamed("id", "doc_id").withColumn(
        "lang", F.lit("en")
    )
    with pytest.raises(ValueError):
        Q.stratified_sample(df, {"en": 1.5})
