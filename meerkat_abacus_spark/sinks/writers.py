"""Sinks (K1-K4).

The reference's delete+insert idempotency (K2, write_to_db.py:40-49) is the
moral equivalent of ``MERGE INTO ... WHEN MATCHED DELETE/INSERT`` keyed on
(uuid, type).  Without a Delta/Iceberg runtime in this container, upsert is
implemented as a partition-pruned read → anti-join → dynamic partition
overwrite: only the partitions present in the incoming batch are read and
rewritten.  On a lakehouse table format the same function body becomes a
single ``MERGE INTO`` statement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_sink(df: DataFrame, path: str, partition_by: list[str] | None = None):
    """K1 — bulk append (write_to_db.py:55-81's buffered INSERT)."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def csv_sink(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
):
    """K3 — CSV export (reference util/__init__.py:289-310 ``write_csv``).

    ``single_file`` coalesces to one partition for small config-style
    exports (fake data, corrected rows) — never use it on a large table;
    the default keeps one file per partition so the write stays parallel.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


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

    Scale contract: with ``partition_by`` set (e.g. ``["type", "epi_year"]``),
    only the partitions PRESENT IN THE INCOMING BATCH are read (partition-
    pruned scan), anti-joined, and rewritten via dynamic partition overwrite
    — a 15k-row micro-batch against a 100 TB table touches a handful of
    partition directories, not the table.  Two constraints, both standard
    lakehouse practice:

    - partition columns must be stable under reprocessing (a corrected row
      that MOVES partition leaves its stale version behind — pick stable
      partition keys, or use a real MERGE on Delta/Iceberg);
    - the survivors of each affected partition are pinned via
      ``localCheckpoint`` (lineage must not reference the overwritten path);
      on a real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
      ``checkpoint()`` or a lakehouse MERGE.

    Without ``partition_by`` this degrades to a full-table merge — test-only.
    """
    first_writer = df.write.mode("overwrite")
    if partition_by:
        first_writer = first_writer.partitionBy(*partition_by)
    try:
        existing = spark.read.parquet(path)
    except Exception:
        first_writer.parquet(path)
        return

    incoming_keys = df.select(*keys).distinct()
    if partition_by:
        # The affected-partition set is small (it is bounded by the batch,
        # not the table) — collecting it to the driver is what makes the
        # existing-side scan partition-pruned.
        parts = df.select(*partition_by).distinct().collect()
        part_cond = reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda a, b: a & b,
                    [
                        F.col(c).eqNullSafe(F.lit(row[c]))
                        for c in partition_by
                    ],
                )
                for row in parts
            ],
            F.lit(False),
        )
        affected = existing.filter(part_cond)
        survivors = affected.join(incoming_keys, on=keys, how="left_anti")
        merged = survivors.unionByName(df, allowMissingColumns=True)
        (
            merged.localCheckpoint()
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )
        return

    # Unpartitioned fallback: whole-table merge.  Fine for fixtures and
    # unit tests; at scale ALWAYS pass partition_by.
    survivors = existing.join(incoming_keys, on=keys, how="left_anti")
    merged = survivors.unionByName(df, allowMissingColumns=True)
    merged.localCheckpoint().write.mode("overwrite").parquet(path)


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
