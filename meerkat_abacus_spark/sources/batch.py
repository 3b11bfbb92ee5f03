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


def csv_reader_options(multiline: bool = False) -> dict[str, str]:
    """Options for the S1/S2 CSV reader — a pure function so the option
    surface is unit-testable without an S3 endpoint (S2 is the same reader
    pointed at an ``s3a://`` URI; the sandbox has no S3, so this is the
    testable seam)."""
    return {
        "header": "true",
        "multiLine": str(multiline).lower(),
        "inferSchema": "false",  # all-string, like the reference
    }


def read_form_csv(
    spark: SparkSession, path: str, multiline: bool = False
) -> DataFrame:
    """S1/S2 — header CSV with every column as STRING (DictReader parity)."""
    return spark.read.options(**csv_reader_options(multiline)).csv(path)


def read_form_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet form tables (the engine's preferred storage: columnar scan +
    pushdown replace the reference's GIN indexes, SURVEY.md §4)."""
    return spark.read.parquet(path)


def jdbc_reader_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict | None = None,
) -> dict[str, str]:
    """Options for the S3 JDBC reader — pure and unit-testable (the sandbox
    has no database; the reference's RDS read is util/__init__.py:368-374)."""
    opts: dict[str, str] = {"url": url, "dbtable": table}
    for k, v in (properties or {}).items():
        opts[k] = str(v)
    if partition_column:
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound or 0),
            upperBound=str(upper_bound or 1_000_000),
        )
    return opts


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
    opts = jdbc_reader_options(
        url, table, partition_column, num_partitions, lower_bound,
        upper_bound, properties,
    )
    return spark.read.format("jdbc").options(**opts).load()
