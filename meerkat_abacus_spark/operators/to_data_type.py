"""Typed-record fan-out (G1): one raw form row → 0..N typed records.

Reference: meerkat_abacus/pipeline_worker/process_steps/to_data_type.py:16-49
— for each row × each data-type spec, emit an envelope when the row's form is
the type's main form and the optional ``db_column == condition`` gate holds.

Spark shape: the spec table is static config, so the plan is an *unrolled*
UNION ALL of per-type filtered projections — each branch keeps predicate
pushdown and column pruning (a crossJoin against a spec DataFrame would
destroy both), and Catalyst dedupes the shared scan under AQE/reused-exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.cols import qcol


@dataclass
class DataTypeSpec:
    """One data_types.csv row (reference country_config/data_types.csv:1-4)."""

    name: str          # type_name, e.g. "Case"
    type: str          # type id, e.g. "case"
    form: str          # main form table
    db_column: str | None = None
    condition: str | None = None
    date: str | None = None    # date column driving epi-week
    var: str | None = None     # C8 additional variable, e.g. "tot_1"
    uuid: str = "meta/instanceID"
    location: str = "deviceid"
    multiple_row: str | None = None


def fan_out_data_types(
    forms: dict[str, DataFrame], specs: list[DataTypeSpec]
) -> DataFrame:
    """UNION ALL of per-type filtered projections, tagged with type columns."""
    branches: list[DataFrame] = []
    for spec in specs:
        df = forms.get(spec.form)
        if df is None:
            continue
        if spec.db_column and spec.condition:
            df = df.filter(qcol(spec.db_column).cast("string") == spec.condition)
        branches.append(
            df.withColumns(
                {
                    "type": F.lit(spec.type),
                    "type_name": F.lit(spec.name),
                }
            )
        )
    if not branches:
        raise ValueError("no data-type spec matched any provided form")
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out
