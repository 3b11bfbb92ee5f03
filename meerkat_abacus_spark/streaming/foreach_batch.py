"""Streaming ingest (S4): Structured Streaming + foreachBatch batch reuse.

Reference: consumer/get_data.py:128-165 — SQS long-poll of ``{formId, data}``
JSON envelopes dispatched through the *identical* pipeline as batch; late /
duplicate data is handled by the idempotent (uuid, type) upsert, not by
watermarks (the reference has no watermark concept — state is the DB).

Spark shape: any streaming source (file drop standing in for SQS here; Kafka
/ Kinesis in production) → ``from_json`` envelope parse → ``foreachBatch``
running the same batch transform → upsert sink.  Exactly-once comes from the
sink's key-based idempotency plus checkpointing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType


def envelope_schema() -> StructType:
    """``{formId, data}`` JSON envelope (get_data.py:143-152)."""
    return StructType(
        [
            StructField("formId", StringType()),
            StructField("data", MapType(StringType(), StringType())),
        ]
    )


def stream_pipeline(
    spark: SparkSession,
    source_dir: str,
    batch_transform: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
):
    """File-drop stream of JSON envelopes → batch transform → sink.

    ``batch_transform`` is the same function used for batch bootstrap —
    the SURVEY §3.2 guarantee that incremental reprocessing equals batch.
    Returns the StreamingQuery (call ``.awaitTermination()`` or stop it).
    """
    raw = (
        spark.readStream.format("json")
        .schema(envelope_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int):
        transformed = batch_transform(batch_df)
        sink(transformed, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
