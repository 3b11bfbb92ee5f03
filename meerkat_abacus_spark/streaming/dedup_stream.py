"""Streaming deduplication with bounded state.

Training-data ingestion replays records — at-least-once sources (SQS-shaped
envelopes per SURVEY.md §2 S4, Kinesis, file re-drops) deliver the same
record more than once, and a 100 TB pipeline cannot keep a forever-growing
seen-set.  ``dropDuplicatesWithinWatermark`` is the Spark-native answer:

- each key's first arrival is emitted immediately (append mode);
- replays arriving while the key's state is alive are suppressed;
- state is EVICTED once the watermark passes the key's event time + delay,
  so the state store is O(keys per watermark window), not O(all history);
- rows older than the watermark never reach the operator (late filter), so
  a replay of an ancient record cannot double-emit after its state is gone.

The ``streaming_dedup`` query proves all three behaviors against a batch
oracle: within-delay replays are dropped as duplicates, beyond-delay
replays are dropped as late, and the emitted stream hash-equals the plain
batch DISTINCT of the original events.

Scale: the dedup shuffles each micro-batch once on the key columns; state
partitions with the shuffle exactly like a batch groupBy — no global seen
structure, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from meerkat_abacus_spark.streaming.windowed import EVENT_SCHEMA


def dedup_within_watermark(
    events_stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming dedup on ``keys``; emits first arrivals only."""
    return events_stream.withWatermark(
        "ts", watermark_delay
    ).dropDuplicatesWithinWatermark(list(keys))


def run_dedup_over_files(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    keys: tuple[str, ...] = ("event_id",),
    watermark_delay: str = "1 hour",
    queryName: str = "stream_dedup",
) -> DataFrame:
    """Drive the streaming dedup over a directory of parquet files (one
    micro-batch per file, oldest mtime first, availableNow) and return the
    emitted (first-arrival) rows."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    out = dedup_within_watermark(
        stream, keys=keys, watermark_delay=watermark_delay
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
