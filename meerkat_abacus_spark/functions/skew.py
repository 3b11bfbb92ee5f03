"""Skew-resistant aggregation: two-phase salted groupBy.

AQE's skew-join splitting covers joins; for *aggregations* with pathological
hot keys (one clinic generating most of a national outbreak's records, one
near-dup band bucket holding a boilerplate cluster), pre-salting bounds any
single task:

    phase 1: groupBy(key, salt = pmod(hash(uuid-ish), B)) — partial results
    phase 2: groupBy(key) — combine B partials per key

Use for algebraic aggregates (count/sum/min/max); collect_list-style
holistic aggregates can't be salted without changing semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: list[str],
    salt_buckets: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """COUNT(*) per key, skew-safe: no task ever sees more than ~1/B of a
    hot key's rows.  ``salt_on`` defaults to a random-ish spread over all
    columns via ``spark_partition_id`` + monotonic id (deterministic result
    either way — counts are algebraic)."""
    salt = (
        F.pmod(F.hash(salt_on), F.lit(salt_buckets))
        if salt_on is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("count"))


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_buckets: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """SUM(value) per key with the same two-phase shape."""
    salt = (
        F.pmod(F.hash(salt_on), F.lit(salt_buckets))
        if salt_on is not None
        else F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("sum"))
