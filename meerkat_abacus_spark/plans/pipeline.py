"""End-to-end pipeline composition: config → one DataFrame job.

The reference's step list (quality_control → initial_visit_control →
write_to_db → to_data_type → add_links → to_codes → write_to_db →
add_multiple_alerts → send_alerts → write_to_db, demo_config.py:13-19) runs
record-at-a-time through Celery with Postgres round-trips between steps.
Here the same lifecycle is one declarative plan — every mid-stream DB
round-trip becomes a join inside the same Catalyst plan, so the optimizer
sees the whole dataflow (SURVEY.md §3.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from meerkat_abacus_spark.functions.dates import day_truncated, timestamp_of
from meerkat_abacus_spark.functions.epi_week import epi_week_columns
from meerkat_abacus_spark.operators.coding import Rule, code_dataframe
from meerkat_abacus_spark.operators.links import LinkDef, add_links
from meerkat_abacus_spark.operators.to_data_type import (
    DataTypeSpec,
    fan_out_data_types,
)


def surveillance_pipeline(
    forms: dict[str, DataFrame],
    data_types: list[DataTypeSpec],
    rules: list[Rule],
    links: list[LinkDef] | None = None,
    epi_config: str | dict = "international",
    week_53_strategy: str = "leave_as_is",
) -> DataFrame:
    """forms → typed, linked, coded ``data`` DataFrame.

    Output carries ``type``, ``type_name``, ``date`` (day-truncated),
    ``epi_year``/``epi_week``, ``variables``, ``categories``, ``alert``,
    ``disregard`` — the reference's ``data`` table skeleton
    (model.py:97-128).
    """
    per_type: list[DataFrame] = []
    for spec in data_types:
        df = fan_out_data_types(forms, [spec])
        attached_links: list[str] = []
        if links:
            applicable = [l for l in links if l.type.lower() == spec.type.lower()]
            if applicable:
                df = add_links(df, forms, applicable)
                attached_links = [l.name for l in applicable]
        # Rules apply to the data types whose name matches their ``type``
        # (reference routes rules by data type, codes/to_codes.py:197); a
        # multiple_link rule additionally needs its link attached here.
        type_rules = [
            r
            for r in rules
            if (not r.type or r.type.lower() == spec.type.lower())
            and (not r.multiple_link or r.form in attached_links)
        ]
        extra = {spec.var: "1", "data_entry": "1"} if spec.var else {"data_entry": "1"}
        df = code_dataframe(df, type_rules, epi_config, extra_variables=extra)
        if spec.date:
            date_col = day_truncated(timestamp_of(df, spec.date))
            epi_year, epi_week = epi_week_columns(
                date_col, epi_config, week_53_strategy
            )
            df = df.withColumns(
                {"date": date_col, "epi_year": epi_year, "epi_week": epi_week}
            )
        per_type.append(df)
    out = per_type[0]
    for t in per_type[1:]:
        out = out.unionByName(t, allowMissingColumns=True)
    return out
