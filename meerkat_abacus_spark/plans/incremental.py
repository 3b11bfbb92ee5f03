"""J2/K2 — incremental reprocessing: reverse-link re-emission as MERGE.

Reference: pipeline_worker/process_steps/add_links.py:45-97 — when a linked
form row arrives *after* its base record, the reference finds the base rows
it links to and re-emits them through coding; idempotency comes from the
(uuid, type)-keyed delete+insert (write_to_db.py:40-49).

Batch recomputation makes the reverse direction disappear (both sides are
full tables — SURVEY.md §2.4 J2); in incremental mode the same guarantee is:
*the affected base slice, recomputed against the full linked table and
upserted by key, equals a full recompute.*  That slice is found with one
broadcast semi-join on the new rows' link keys — the base table is never
rescanned beyond the pushdown-filtered slice.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.cols import qcol
from meerkat_abacus_spark.operators.links import LinkDef, _normalize
from meerkat_abacus_spark.sinks.writers import upsert_by_key


def affected_base_rows(
    base: DataFrame, new_to_rows: DataFrame, link: LinkDef
) -> DataFrame:
    """Base rows whose link arrays are invalidated by newly-arrived linked
    rows: semi-join on the link's (normalized) key columns."""
    from_cols = link.from_column.split(";")
    to_cols = link.to_column.split(";")
    methods = link.method.split(";")

    keys = new_to_rows.select(
        *[
            _normalize(qcol(tc), m).alias(f"__k{i}")
            for i, (tc, m) in enumerate(zip(to_cols, methods))
        ]
    ).distinct()

    cond = None
    for i, (fc, m) in enumerate(zip(from_cols, methods)):
        if m == "alert_match":
            base_key = F.expr(f"right(CAST(`{fc}` AS STRING), 6)")
        else:
            base_key = _normalize(qcol(fc), m)
        c = base_key == F.col(f"__k{i}")
        cond = c if cond is None else (cond & c)
    return base.join(F.broadcast(keys), cond, "left_semi")


def incremental_recode(
    spark: SparkSession,
    base: DataFrame,
    new_to_rows: DataFrame,
    link: LinkDef,
    recompute: Callable[[DataFrame], DataFrame],
    output_path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """Recompute only the affected base slice and MERGE it into the output.

    ``recompute`` is the same batch transform used for bootstrap (it must
    join against the *full, updated* linked table) — the SURVEY §3.2
    incremental ≡ batch guarantee then follows from key-based idempotency.
    ``partition_by`` must match the bootstrap write's layout so the upsert
    stays partition-pruned (only partitions present in the recoded slice
    are rewritten).
    """
    affected = affected_base_rows(base, new_to_rows, link)
    recoded = recompute(affected)
    upsert_by_key(spark, recoded, output_path, keys=keys, partition_by=partition_by)
