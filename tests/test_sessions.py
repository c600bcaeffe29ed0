"""Stateful-streaming sessionization (applyInPandasWithState) vs the
batch window-function oracle."""

from __future__ import annotations

import datetime
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from whakoom_webscrapper_spark.streaming import sessions as SS

GAP = 600  # 10 min
BASE = int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp())
SENTINEL = 9_999


def _gen_events(spark, out_dir):
    """Deterministic per-user event times, written as ts-ordered parquet
    files (one file per hour bucket) so micro-batches arrive in event-time
    order. Users 0-9 emit bursts separated by > GAP (several sessions
    each); the SENTINEL user emits two very late events that only advance
    the watermark (and are excluded from the comparison)."""
    rows = []
    for u in range(10):
        t = BASE + u * 37
        for s in range(3):           # 3 sessions per user
            for k in range(4 + (u % 3)):  # 4-6 events per session
                rows.append((u, t))
                t += 60 + (u + k) % 120          # intra-session gaps < GAP
            t += GAP + 900 + u * 13              # inter-session gap > GAP
    horizon = max(t for _, t in rows)
    # sentinel events far past everyone's last session + watermark, split
    # across the last two files so the final micro-batch runs with a
    # watermark high enough to time out every open session of users 0-9
    rows.append((SENTINEL, horizon + 3 * 3600))
    rows.append((SENTINEL, horizon + 4 * 3600))
    df = spark.createDataFrame(
        [(u, datetime.datetime.fromtimestamp(ts, datetime.timezone.utc)) for u, ts in rows],
        "user_id long, ts timestamp",
    ).orderBy("ts")
    # one file per 30-minute bucket, in event-time order
    pdf = df.toPandas().sort_values("ts")
    os.makedirs(out_dir, exist_ok=True)
    bucket = ((pdf["ts"].astype("int64") // 10**9 - BASE) // 1800).astype(int)
    for i, b in enumerate(sorted(bucket.unique())):
        part = pdf[bucket == b]
        spark.createDataFrame(part).write.mode("overwrite").parquet(
            f"{out_dir}/f{i:04d}"
        )
    # flatten: move part files up so the stream source sees a flat dir
    import glob
    import shutil

    flat = out_dir + "_flat"
    os.makedirs(flat, exist_ok=True)
    k = 0
    for d in sorted(glob.glob(f"{out_dir}/f*")):
        for p in sorted(glob.glob(f"{d}/*.parquet")):
            dst = f"{flat}/{k:04d}.parquet"
            shutil.copy(p, dst)
            # the file stream source orders by mtime in MILLISECONDS; fast
            # sequential copies tie and arrive scrambled — stamp strictly
            # increasing mtimes so micro-batches follow event time (the
            # operator itself tolerates disorder inside the watermark, but
            # the test wants deterministic batch boundaries)
            os.utime(dst, (1_000_000 + k, 1_000_000 + k))
            k += 1
    return flat


@pytest.fixture(scope="module")
def session_world(spark):
    base = tempfile.mkdtemp(prefix="sess_")
    src = _gen_events(spark, f"{base}/events")
    return base, src


def test_stateful_sessions_match_batch_oracle(spark, session_world):
    base, src = session_world
    SS.sessionize_stream(
        spark, src, f"{base}/ckpt", f"{base}/out",
        gap_seconds=GAP, watermark="30 minutes", max_files_per_trigger=1,
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(f"{base}/out").collect()
        if r["user_id"] != SENTINEL  # its 2nd event may finalize its 1st
    }
    events = spark.read.parquet(src)
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in SS.sessionize_batch(events, GAP).collect()
        if r["user_id"] != SENTINEL
    }
    # the sentinel watermark-driver events guarantee every non-sentinel
    # session either closed by a successor or timed out — exact equality
    assert got == expect
    assert len(expect) == 30  # 10 users x 3 sessions


def test_stateful_sessions_resume_from_checkpoint(spark, session_world):
    """Kill-and-resume: draining the same source twice against the SAME
    checkpoint emits no duplicates (exactly-once sink semantics)."""
    base, src = session_world
    out, ckpt = f"{base}/out2", f"{base}/ckpt2"
    SS.sessionize_stream(spark, src, ckpt, out, gap_seconds=GAP,
                         watermark="30 minutes", max_files_per_trigger=1)
    n1 = spark.read.parquet(out).count()
    SS.sessionize_stream(spark, src, ckpt, out, gap_seconds=GAP,
                         watermark="30 minutes", max_files_per_trigger=1)
    n2 = spark.read.parquet(out).count()
    # 30 user sessions + the sentinel's first (finalized by its second)
    assert n1 == n2 == 31
