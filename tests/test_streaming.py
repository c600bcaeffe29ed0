"""Structured Streaming parity tests (SURVEY.md §2.8)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from whakoom_webscrapper_spark.streaming import events as SE

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def src():
    """File-stream sources read directories of arriving files; stage the
    single driver parquet into one."""
    d = tempfile.mkdtemp(prefix="events_src_")
    shutil.copy(f"{SF}/events.parquet", f"{d}/part-000.parquet")
    return d


def test_hourly_stream_matches_batch_finalized_windows(spark, src):
    out = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    SE.hourly_event_counts_stream(spark, src, ckpt, out)

    got = {
        (r["hour_start"], r["event_type"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("hour_start"),
            "event_type",
            "n_events",
        )
    )
    expected_all = {
        (r["hour_start"], r["event_type"], r["n_events"]) for r in batch.collect()
    }
    # append mode only emits watermark-finalized windows: stream output must
    # be a subset of batch, exact on every emitted window, and non-trivial
    assert got <= expected_all
    assert len(got) > 0
    # windows older than (max_ts - watermark) must all have been emitted
    max_ts = spark.read.parquet(src).agg(
        F.max(F.col("ts").cast("timestamp").cast("long"))
    ).collect()[0][0]
    horizon = max_ts - 2 * 3600 - 3600
    must_emit = {t for t in expected_all if t[0] < horizon}
    assert must_emit <= got


def test_dedup_stream_key_membership(spark, src):
    out = tempfile.mkdtemp(prefix="dstream_out_")
    ckpt = tempfile.mkdtemp(prefix="dstream_ckpt_")
    SE.dedup_stream(spark, src, ckpt, out)
    res = spark.read.parquet(out)
    keys = [(r["user_id"], r["event_type"]) for r in res.collect()]
    assert len(keys) == len(set(keys))  # one row per key
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(src).select("user_id", "event_type").distinct().collect()
    }
    assert set(keys) == batch_keys
