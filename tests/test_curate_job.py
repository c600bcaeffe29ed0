"""End-to-end gate for jobs/curate.py (the staged curation pipeline).

Operator semantics are unit-pinned in test_quality.py; pinned here is
the CLI wiring — stage order, per-stage stats, flag gating — on a
hand-built corpus where every stage has exactly one designed victim.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import curate as curate_job
import pytest
from pyspark.sql import functions as F

from tests.conftest import run_job

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "wanders home across the quiet field while evening settles in"
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Six docs, one casualty per stage:

    0  good english doc                      survives everything
    1  punctuation soup                      dies at --min-quality
    2  one bigram repeated 30x               dies at --max-top2gram
    3  good doc + an email address           survives, text rewritten
    4  null text                             dies at --min-quality
    5  good doc from an over-crawled host    dies at --cap-per-source
    """
    d = tempfile.mkdtemp(prefix="curate_job_")
    path = os.path.join(d, "docs")
    rows = [
        (0, GOOD, "host-a"),
        (1, "!!! ??? ;;; ::: @@@ ### $$$ %%% ^^^ &&& *** ((()))", "host-a"),
        (2, "badger " * 60, "host-a"),
        (3, GOOD + " contact us at alice@example.com for details", "host-a"),
        (4, None, "host-a"),
        (5, GOOD + " but from the giant host", "host-b"),
        (6, GOOD + " also from the giant host and slightly longer text", "host-b"),
    ]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, source: string"
    ).write.mode("overwrite").parquet(path)
    return path


def _run(argv, capsys):
    return run_job(curate_job, argv, capsys)


def test_full_pipeline_stage_counts(spark, corpus, capsys):
    out = tempfile.mkdtemp(prefix="curate_out_") + "/curated"
    stats = _run(
        ["--input", corpus, "--min-quality", "0.75",
         "--max-top2gram", "0.5", "--pii-scrub",
         "--cap-per-source", "1", "--holdout-buckets", "13",
         "--out", out],
        capsys,
    )
    assert stats["rows_in"] == 7
    assert stats["after_quality"] == 5      # drops 1 (punct) and 4 (null)
    assert stats["after_repetition"] == 4   # drops 2 (badger^60)
    assert stats["after_cap"] == 2          # each host capped to its longest
    assert stats["rows_out"] == 2
    assert stats["dropped"] == 5
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {3, 6}  # longest text per host (3 > 0, 6 > 5)
    # PII scrub rewrote doc 3's email
    assert "alice@example.com" not in rows[3]["text"]
    # split assignment matches the md5 arithmetic exactly
    for doc_id, r in rows.items():
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 256
        assert r["bucket"] == b
        assert r["split"] == ("holdout" if b < 13 else "train")


def test_stages_are_opt_in(spark, corpus, capsys):
    """With no stage flags the job is a pure copy: nothing dropped, no
    appended columns, no per-stage keys in the stats line."""
    stats = _run(["--input", corpus], capsys)
    assert stats == {"rows_in": 7, "rows_out": 7, "dropped": 0}


def test_lang_rates_stage(spark, corpus, capsys):
    """lang en=1.0 keeps every english doc; default-rate 0 drops docs
    whose text identifies as anything else (null text -> und -> dropped)."""
    stats = _run(
        ["--input", corpus, "--lang-rates", "en=1.0"], capsys
    )
    assert stats["after_sample"] == stats["rows_out"]
    assert 0 < stats["rows_out"] < 7


def test_bad_lang_rates_rejected(spark, corpus, capsys):
    with pytest.raises(ValueError, match="lang=rate"):
        _run(["--input", corpus, "--lang-rates", "en:0.5"], capsys)
