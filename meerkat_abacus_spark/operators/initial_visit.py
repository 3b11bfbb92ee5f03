"""Duplicate-initial-visit correction (J7) as a window dedup.

Reference: meerkat_abacus/pipeline_worker/process_steps/
initial_visit_control.py:25-136 — for gated rows (visit type "new", module in
the configured set, all identifier keys non-empty), visits sharing the same
identifier tuple are date-sorted; the earliest keeps ``new``, later ones are
rewritten to ``return``.

The reference does this with a per-record SQL query back to Postgres; here it
is one window: ``row_number() OVER (PARTITION BY identifiers ORDER BY
visit_date, uuid)``.  At 100 TB the partition key (patient, icd_code) is
high-cardinality and well distributed, so the single shuffle this costs is
the floor for the semantics; no driver round-trips, no skew risk.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.cols import qcol
from meerkat_abacus_spark.functions.dates import timestamp_of


def initial_visit_control(
    df: DataFrame,
    identifier_columns: list[str],
    visit_type_column: str,
    visit_date_column: str,
    uuid_column: str = "meta/instanceID",
    new_value: str = "new",
    return_value: str = "return",
    module_column: str | None = None,
    module_value: str | None = None,
) -> DataFrame:
    """Rewrite duplicate "new" visits to "return", keeping the earliest."""
    gate = qcol(visit_type_column).cast("string") == new_value
    if module_column and module_value:
        gate = gate & (qcol(module_column).cast("string") == module_value)
    gate = reduce(
        lambda a, b: a & b,
        [
            qcol(c).isNotNull() & (qcol(c).cast("string") != "")
            for c in identifier_columns
        ],
        gate,
    )

    # Split rather than window over everything: a single window with a
    # constant partition key for the (majority) non-gated rows would funnel
    # them through one task at scale.  The gated slice shuffles on its real
    # high-cardinality identifier key; the rest never shuffles.
    gated = df.filter(gate)
    rest = df.filter(~F.coalesce(gate, F.lit(False)))

    w = Window.partitionBy(
        *[qcol(c).cast("string") for c in identifier_columns]
    ).orderBy(
        timestamp_of(df, visit_date_column),
        qcol(uuid_column).cast("string"),
    )
    rewritten = (
        gated.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            visit_type_column,
            F.when(F.col("__rn") > 1, F.lit(return_value)).otherwise(
                qcol(visit_type_column)
            ),
        )
        .drop("__rn")
    )
    return rewritten.unionByName(rest)
