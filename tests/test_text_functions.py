"""functions/text.py round-6 rewrites — lang_id (single-pass packed
argmax) and the tokenize-once shingle helpers must be value-identical to
the original formulations they replaced."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from whakoom_webscrapper_spark.functions import text as T


def _ref_lang_id(text: str) -> str:
    """The ORIGINAL lang_id semantics, verbatim in Python: per-language
    word-bounded marker hit counts, argmax with ties broken in
    en,es,fr,de order, 'und' when nothing fires."""
    low = text.lower()
    hits = {
        lg: sum(
            len(re.findall(rf"\b{w}\b", low)) for w in T.LANG_MARKERS[lg]
        )
        for lg in T.LANG_MARKERS
    }
    best = max(hits.values())
    for lg in T.LANG_MARKERS:  # insertion order = tie order
        if hits[lg] > 0 and hits[lg] == best:
            return lg
    return "und"


LANG_FIXTURE = [
    "the cat and the dog",  # en, repeated marker
    "el perro que ladra la noche",  # es
    "le chien est dans les jardins",  # fr
    "der hund ist nicht die katze",  # de
    "zzz qqq www",  # no marker -> und
    "",  # empty -> und
    "   ",  # whitespace-only -> und
    "the el",  # en/es tie at 1 -> en (tie order)
    "la le",  # es/fr tie -> es
    "les der der",  # de wins 2-1
    "lest estival destiny",  # substrings only, no \b match -> und
    "und ist la",  # de 2 vs es 1 -> de
    "That IS the point",  # case folding: en
    "que-que,que.le",  # punctuation boundaries: es 3 vs fr 1 -> es
    "is ist",  # en/de tie -> en
]


def test_lang_id_matches_original_semantics(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(LANG_FIXTURE)], "i long, t string"
    )
    got = {
        r["i"]: r["lang"]
        for r in df.select("i", T.lang_id(F.col("t")).alias("lang")).collect()
    }
    for i, t in enumerate(LANG_FIXTURE):
        assert got[i] == _ref_lang_id(t), f"{t!r}: {got[i]}"


def test_lang_id_null_text_is_und(spark):
    df = spark.createDataFrame([(1, None)], "i long, t string")
    assert (
        df.select(T.lang_id(F.col("t")).alias("lang")).collect()[0]["lang"]
        == "und"
    )


def test_distinct_shingle_rows_equals_word_shingles_explode(spark):
    texts = [
        "one two three four five",
        "a a a a",  # duplicate shingles collapse
        "two words",  # shorter than k -> whole-doc shingle
        "",  # empty -> single empty shingle
        "  Mixed   CASE\ttabs  and\nnewlines  ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    new = T.distinct_shingle_rows(df, "text", "doc_id", 3)
    old = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(T.word_shingles(F.col("text"), 3))
        ).alias("shingle"),
    )
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )


def test_shingle_plan_tokenizes_once(spark):
    """The whole point of the helper: exactly ONE split() of the text per
    row in the plan, not one per array element."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = T.distinct_shingle_rows(df, "text", "doc_id", 3)._sc._jvm.PythonSQLUtils.explainString(
        T.distinct_shingle_rows(df, "text", "doc_id", 3)._jdf.queryExecution(),
        "formatted",
    )
    assert plan.count("split(") == 1, plan
