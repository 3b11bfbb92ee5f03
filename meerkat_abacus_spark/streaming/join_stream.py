"""Stream-stream interval join with watermark-bounded state.

The remaining big Structured Streaming primitive after windowed
aggregation (windowed.py), custom state (stateful.py), and streaming dedup
(dedup_stream.py): correlate two live streams — impressions↔conversions,
request↔response, case-report↔lab-result — where each left row matches
right rows on a key within a bounded event-time interval.

Spark's state cleanup needs BOTH sides watermarked and a time-range join
condition; then a buffered row is dropped as soon as the other stream's
watermark passes the end of its match window, so state is
O(rows in the interval window), not O(stream history).

``streaming_interval_join`` (queries/streaming.py) proves the semantics:
the joined output over a time-sliced replay hash-equals the batch interval
join of the same events, including pairs that straddle micro-batch
boundaries (the buffered-state case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meerkat_abacus_spark.streaming.windowed import EVENT_SCHEMA


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Inner join: right rows within ``[left.ts, left.ts + gap]`` on ``key``.

    ``watermark_delay`` must be >= ``gap`` plus expected disorder, or
    straddling pairs get dropped with their evicted state.
    """
    a = (
        left.withWatermark("ts", watermark_delay)
        .select(
            F.col(key).alias("k"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("left_ts"),
        )
    )
    b = (
        right.withWatermark("ts", watermark_delay)
        .select(
            F.col(key).alias("bk"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("right_ts"),
        )
    )
    return a.join(
        b,
        (F.col("k") == F.col("bk"))
        & (F.col("right_ts") >= F.col("left_ts"))
        & (F.col("right_ts") <= F.col("left_ts") + F.expr(f"INTERVAL {gap}")),
        "inner",
    ).select("k", "left_id", "right_id", "left_ts", "right_ts")


def run_interval_join_over_files(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
    queryName: str = "stream_ijoin",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive the interval join over time-sliced parquet files
    (availableNow): even event ids form the left stream, odd the right.
    Returns the joined rows.

    ``max_files_per_trigger`` sets the replay batching (VERDICT r13 ask
    #5).  The default ``None`` replays the whole backlog as ONE large
    micro-batch — measured on the STREAM_SCALE_r13 1x leg, per-file
    batching cost 19.3 s against 7.74 s one-big-batch with IDENTICAL
    joined rows, because each availableNow commit pays ~3 s of two-sided
    state-store maintenance across every shuffle partition regardless of
    row count (RocksDB was WORSE at this state size: 28.4 s).  Pass 1
    (one micro-batch per file, oldest mtime first) to exercise
    cross-batch buffered state — what the certified
    ``streaming_interval_join`` query pins explicitly, since straddling
    pairs across batch seams is exactly what it certifies — or any k to
    bound per-batch input on a backlog too large for one batch."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    out = interval_join_stream(
        stream.filter(F.col("event_id") % 2 == 0),
        stream.filter(F.col("event_id") % 2 == 1),
        gap=gap,
        watermark_delay=watermark_delay,
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
    return spark.table(queryName)
