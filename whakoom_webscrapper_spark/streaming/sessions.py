"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.8; task directive: custom
stateful operators on Structured Streaming).

Semantics (the classic session window): per user, consecutive events
belong to one session while the gap between adjacent events is ≤
``gap_seconds``; a longer gap closes the session and starts a new one.
Closed sessions are emitted as (user_id, session_start, session_end,
n_events).

Why applyInPandasWithState and not F.session_window: the built-in
session window covers plain aggregation, but a crawl-state machine
(e.g. per-host politeness windows with carry-over, or per-user
funnels) needs arbitrary per-key state transitions — this operator is
the template: Arrow-batched per-key state, event-time timeout tied to
the watermark, explicit state schema.

Emission rule: a session is emitted exactly when the WATERMARK proves it
final — watermark > session_end + gap means any future in-horizon event
(ts > watermark) cannot extend it. Until then its events stay buffered
in state: micro-batches carry no cross-batch event-time ordering
guarantee, so folding incrementally in arrival order would mis-split
sessions; the fold always runs over the key's sorted buffer. Open
sessions at end-of-input stay in state (a restart resumes them from the
checkpoint) — batch-parity tests compare the emitted prefix.

Scale shape: state is per (user) key, hash-partitioned by the streaming
engine; each micro-batch touches only keys with new events plus timed-out
keys. State size is O(events inside the watermark horizon) per active
key — the same bound every out-of-order-correct session operator pays
(Spark's built-in session_window keeps the same horizon).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.LongType(), False),
        T.StructField("session_end", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

# the state is the key's buffered in-horizon event times: micro-batches
# carry NO cross-batch ordering guarantee (the file source orders by
# modification time, and real sources interleave), so sessions can only
# be folded from the SORTED buffer, and emitted once the watermark
# proves them final. Buffer size is bounded by the watermark horizon.
STATE_SCHEMA = T.StructType(
    [T.StructField("buf", T.ArrayType(T.LongType(), False), False)]
)


def _sessionize_fn(gap_seconds: int):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        buf = list(state.get[0]) if state.exists else []
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(int(t) for t in pdf["ts_epoch"])
        buf.sort()
        wm = state.getCurrentWatermarkMs() // 1000
        # fold the sorted buffer into sessions; a session is FINAL when
        # watermark passed end+gap (no in-horizon event can extend it:
        # any future event has ts > wm > end+gap)
        sessions = []
        cur = []
        for t in buf:
            if cur and t - cur[-1] > gap_seconds:
                sessions.append(cur)
                cur = [t]
            else:
                cur.append(t)
        if cur:
            sessions.append(cur)
        emit, keep = [], []
        for s in sessions:
            if s[-1] + gap_seconds < wm:
                emit.append(s)
            else:
                keep.extend(s)
        if keep:
            state.update((keep,))
            # re-check at the next watermark advance
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        else:
            state.remove()
        if emit:
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": s[0],
                        "session_end": s[-1],
                        "n_events": len(s),
                    }
                    for s in emit
                ]
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    max_files_per_trigger: int = 2,
) -> None:
    """Drain ``source_dir`` (parquet with user_id long, ts timestamp-like)
    through the stateful sessionizer; closed sessions land in ``out_dir``."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("ts_epoch", F.col("ts").cast("long"))
    )
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch oracle for the stateful operator: gap > gap_seconds starts a
    new session (lag + running sum of session-start flags — pure window
    functions, no Python)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_epoch")
    with_flag = (
        events.select("user_id", F.col("ts").cast("timestamp").cast("long").alias("ts_epoch"))
        .withColumn("_prev", F.lag("ts_epoch").over(w))
        .withColumn(
            "_new_session",
            (F.col("_prev").isNull() | (F.col("ts_epoch") - F.col("_prev") > gap_seconds))
            .cast("long"),
        )
        .withColumn("_session_id", F.sum("_new_session").over(w))
    )
    return with_flag.groupBy("user_id", "_session_id").agg(
        F.min("ts_epoch").alias("session_start"),
        F.max("ts_epoch").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("_session_id")
