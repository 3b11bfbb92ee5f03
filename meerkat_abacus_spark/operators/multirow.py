"""G2 — multi-row split: one wide row → per-entity sub-rows.

Reference: meerkat_abacus/pipeline_worker/process_steps/to_codes.py:110-136.
Forms can carry ``$``-numbered column groups (``pt1./gender`` = entity 1's
gender, ``pt2./gender`` = entity 2's), declared in data_types.csv as
``multiple_row`` columns with a ``$`` placeholder (``pt$./gender``).  Each
wide row explodes into one sub-row per entity index; the sub-row's uuid is
``uuid + ":" + index`` and the indexed columns are projected onto their
un-numbered names.

Spark shape: ``posexplode`` over an array of per-index structs — a narrow
flatMap, no shuffle; entity count is static config so the struct array is
unrolled at plan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.cols import qcol


def split_multiple_rows(
    df: DataFrame,
    column_templates: list[str],
    max_index: int,
    uuid_col: str = "meta/instanceID",
    keep_columns: list[str] | None = None,
    require_any_value: bool = True,
) -> DataFrame:
    """Explode ``$``-templated columns into per-index sub-rows.

    ``column_templates``: e.g. ``["pt$./gender", "pt$./age"]``; indices run
    1..max_index.  Output columns use the template with ``$`` removed
    (``pt./gender``), plus ``uuid = <uuid>:<i>`` (to_codes.py:128-131).
    Sub-rows whose indexed columns are all empty are dropped when
    ``require_any_value`` (the reference skips absent entities).
    """
    keep = keep_columns if keep_columns is not None else [
        c for c in df.columns
        if not any(t.replace("$", str(i)) == c
                   for t in column_templates for i in range(1, max_index + 1))
    ]

    entries = []
    for i in range(1, max_index + 1):
        fields = []
        for template in column_templates:
            src = template.replace("$", str(i))
            out_name = template.replace("$", "")
            value = qcol(src) if src in df.columns else F.lit(None).cast("string")
            fields.append(value.alias(out_name))
        entries.append(F.struct(F.lit(i).alias("__idx"), *fields))

    carry = list(dict.fromkeys(keep + [uuid_col]))
    exploded = df.select(
        *[qcol(c).alias(c) for c in carry],
        F.posexplode(F.array(*entries)).alias("__pos", "__entity"),
    )
    out_cols = [t.replace("$", "") for t in column_templates]
    result = exploded.select(
        *[F.col(f"`{c}`") for c in keep],
        F.concat(
            qcol(uuid_col).cast("string"),
            F.lit(":"),
            F.col("__entity.__idx").cast("string"),
        ).alias("uuid"),
        *[F.col(f"__entity.`{c}`").alias(c) for c in out_cols],
    )
    if require_any_value:
        non_empty = None
        for c in out_cols:
            cond = F.col(f"`{c}`").isNotNull() & (F.col(f"`{c}`").cast("string") != "")
            non_empty = cond if non_empty is None else (non_empty | cond)
        result = result.filter(non_empty)
    return result
