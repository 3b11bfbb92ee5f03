"""Watermarked tumbling-window aggregation — the built-in stateful path.

Complements the custom stateful sessionizer (streaming/stateful.py) with
Structured Streaming's native event-time machinery (reference scope: the
stream consumer SURVEY.md §2 S4 describes is a fixed-batch loop; event-time
windows + watermarks are what that loop becomes on Spark):

- ``withWatermark`` bounds state: a window's accumulator is evicted once the
  watermark (max observed event time − delay) passes the window end, so
  state is O(active windows × group keys), not O(history).
- Append output mode emits each window exactly once, when it is finalized —
  the contract a downstream idempotent sink (sinks/writers.py upsert) wants.
- Late rows within the delay repair their still-open window; rows later
  than the watermark are DROPPED — both behaviors are exercised and
  hash-checked against the batch oracle by the ``streaming_windowed_counts``
  query, which plants both kinds of late data in its replay.

Scale: the aggregation shuffles each micro-batch once on (window, key);
state lives in the per-partition state store and partitions with the
shuffle — no global structure, same as any batch groupBy at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_stream(
    events_stream: DataFrame,
    window_duration: str = "1 day",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window counts/sums per event_type with a
    watermark.  Returns the append-mode aggregate stream (column ``w`` is
    the window struct)."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


def run_windowed_counts_over_files(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 day",
    watermark_delay: str = "1 hour",
    queryName: str = "windowed_counts",
) -> DataFrame:
    """Drive the windowed aggregation over a directory of time-sliced
    parquet files (one micro-batch per file, oldest modification time
    first, availableNow) and return the finalized windows.

    Only windows whose end the final watermark passed are in the result —
    Spark runs no-data micro-batches after the last file so the watermark
    advances to (global max ts − delay) and everything below it flushes;
    the trailing partial window is intentionally withheld (it would emit
    on the next day's data in production).
    """
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    out = windowed_counts_stream(
        stream, window_duration=window_duration, watermark_delay=watermark_delay
    )
    q = (
        out.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(queryName).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


def session_window_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """JVM-native gap sessionization via ``session_window``: Spark merges
    each user's overlapping ``[ts, ts+gap)`` intervals in the state store
    and finalizes a session once the watermark passes its end — the
    built-in, codegen'd alternative to the custom
    ``applyInPandasWithState`` sessionizer (stateful.py), with the same
    watermark-bounded state and none of the Python worker round-trips.
    Note the half-open merge semantics: an event exactly ``gap`` after its
    predecessor starts a NEW session."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.session_window(F.col("ts"), gap).alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def run_session_window_over_files(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
    queryName: str = "session_window",
) -> DataFrame:
    """Drive native session windows over time-sliced parquet files
    (availableNow, one file per micro-batch) and return the finalized
    sessions."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    out = session_window_stream(
        stream, gap=gap, watermark_delay=watermark_delay
    )
    q = (
        out.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(queryName).select(
        "user_id",
        F.unix_micros("first_ts").alias("session_start_us"),
        "n_events",
        (F.unix_micros("last_ts") - F.unix_micros("first_ts")).alias(
            "duration_us"
        ),
    )
