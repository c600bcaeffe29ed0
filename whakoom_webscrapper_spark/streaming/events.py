"""Structured Streaming skin: windowed event aggregation with watermark.

The reference's crawl loop is iterative, not streaming (SURVEY.md §2.8
chose a driver epoch loop for the frontier so checkpointing stays
explicit). This module is the complementary surface: the same windowed
aggregation the batch query ``events_hourly`` computes, expressed as a
Structured Streaming job — file source → watermark → windowed count →
parquet sink — so a live event feed (the ``scraping_log`` analog,
reference: sqlmanager.py:266-302) can be consumed incrementally.

``Trigger.AvailableNow`` drains whatever is present and stops, which is
both the test harness mode and the "catch-up" production mode; a
continuous deployment just drops the trigger. State is bounded by the
watermark (late rows beyond 2 hours are dropped — the streaming analog
of the epoch model's eligible_epoch cutoff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_counts_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "2 hours",
) -> None:
    """Run the hourly windowed aggregation as an available-now stream.
    Produces parquet rows (hour_start long, event_type string,
    n_events long) — the same shape as queries.events_hourly minus the
    non-streamable exact sum (sums over late data are watermark-bounded).
    """
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
        # watermarks require TIMESTAMP (tz-aware); parquet NTZ is cast in
        # the session timezone (UTC)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("hour_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "2 hours",
) -> None:
    """Streaming dedup: first event per (user_id, event_type) within the
    watermark horizon — the streaming analog of the seen-set (J1).
    ``dropDuplicates`` keeps streaming state per key, expired by the
    watermark, exactly how the crawl's Bloom+anti-join pair works across
    epochs."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )
    q = (
        deduped.select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").cast("long").alias("ts_epoch"),
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
