"""Streaming threshold alerts with watermarked windowed aggregation.

The reference's streaming path has no watermarks — late/duplicate data is
absorbed by the keyed upsert (SURVEY.md §3.2).  This module adds the
Spark-native alternative for true streaming deployments: an event-time
tumbling-window count per clinic with a watermark bounding state, emitting
alert rows once windows close.  Semantics match
:func:`operators.alerts.threshold_alerts` for on-time data (test-asserted);
data later than the watermark is dropped by Spark instead of retracting —
deployments that must accept unbounded lateness keep the foreachBatch +
upsert path instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_threshold_alerts(
    events: DataFrame,
    var_predicate,
    clinic_col: str = "clinic",
    ts_col: str = "ts",
    uuid_col: str = "uuid",
    daily_limit: int = 3,
    watermark: str = "2 days",
) -> DataFrame:
    """readStream DataFrame → per-(clinic, day-window) alert rows.

    State is bounded by the watermark: a clinic-day window is kept only
    until event time passes window end + watermark, so state size is
    O(active clinics × watermark days) regardless of stream length.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .filter(var_predicate)
        .groupBy(
            F.col(clinic_col).alias("clinic"),
            F.window(F.col(ts_col), "1 day").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.array_sort(F.collect_list(F.col(uuid_col))).alias("uuids"),
        )
        .filter(F.col("count") >= daily_limit)
        .select(
            "clinic",
            F.col("w.start").alias("period_start"),
            F.lit("day").alias("period"),
            "count",
            "uuids",
        )
    )
