"""Batch sources (S1-S3).

Reference: util/__init__.py:442-456 (csv), consumer/get_data.py:65-79 (S3),
util/__init__.py:368-374 (RDS/JDBC).  Form schemas are all-string (ODK
export semantics — SURVEY.md §1.2): we read CSVs with header + string
schema, never inferring numerics, exactly like DictReader.

S2 (S3) is the same reader pointed at ``s3a://`` URIs; chunking/backpressure
(S6) disappears — Spark's own partitioning covers it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_form_csv(
    spark: SparkSession, path: str, multiline: bool = False
) -> DataFrame:
    """S1/S2 — header CSV with every column as STRING (DictReader parity)."""
    return (
        spark.read.option("header", True)
        .option("multiLine", multiline)
        .option("inferSchema", False)  # all-string, like the reference
        .csv(path)
    )


def read_form_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet form tables (the engine's preferred storage: columnar scan +
    pushdown replace the reference's GIN indexes, SURVEY.md §4)."""
    return spark.read.parquet(path)


def read_form_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """S3 — JDBC source; pass partition bounds so reads parallelize instead
    of the reference's single yield_per(1000) cursor."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1_000_000)
        )
    return reader.load()
