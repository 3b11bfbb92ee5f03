"""G3/K5 — export shaping: ODK group re-nesting and aggregate-submit payloads.

Reference: util/__init__.py:405-419 (``groupify`` — flat ``group./field``
keys become a nested ``{group: {field: value}}`` dict) and
util/__init__.py:422-439 (``submit_data_to_aggregate`` — drop
``meta/instanceID``/``SubmissionDate``, groupify, tag ``@id = form_id``,
POST XML to an ODK Aggregate server).

Spark shape: re-nesting is a pure projection — each ``pt./field`` column
moves into a ``struct`` column ``pt``; no shuffle, stays inside one
WholeStageCodegen span, and the struct columns write straight to
parquet/JSON as nested types (better than the reference's string-keyed
dicts: downstream scans prune individual struct fields).  The HTTP POST
itself is out of analytic scope (SURVEY.md §2.1 K5) and stays behind a
``foreachBatch`` callback like ``send_alerts.publish_alerts``.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.cols import qcol


def nest_group_exprs(columns: list[str]) -> list[Column]:
    """Aliased projection expressions that re-nest ``group./field`` columns
    into one ``struct`` per group (util/__init__.py:405-419).

    Column order is preserved: a group's struct appears at the position of
    its first member, like ``groupify``'s insertion-ordered dict.
    """
    groups: "OrderedDict[str, list[str]]" = OrderedDict()
    order: list[tuple[str, bool]] = []  # (name, is_group)
    for c in columns:
        if "./" in c:
            group, _ = c.split("./", 1)
            if group not in groups:
                groups[group] = []
                order.append((group, True))
            groups[group].append(c)
        else:
            order.append((c, False))
    out: list[Column] = []
    for name, is_group in order:
        if is_group:
            out.append(
                F.struct(
                    *[qcol(c).alias(c.split("./", 1)[1]) for c in groups[name]]
                ).alias(name)
            )
        else:
            out.append(qcol(name).alias(name))
    return out


def nest_groups(df: DataFrame) -> DataFrame:
    """Re-nest flat ODK columns: every ``group./field`` column becomes field
    ``field`` of a struct column ``group``."""
    return df.select(*nest_group_exprs(df.columns))


def aggregate_submission_payload(
    df: DataFrame,
    form_id: str,
    uuid_col: str = "meta/instanceID",
    submission_col: str = "SubmissionDate",
) -> DataFrame:
    """The computable half of ``submit_data_to_aggregate``
    (util/__init__.py:422-439): strip the envelope columns, re-nest groups,
    tag the form id, and render one JSON document per row.

    Returns ``(uuid, payload)`` — ``uuid`` kept alongside so a
    ``foreachBatch`` HTTP sink can ack/retry idempotently.  The reference
    renders XML; the wire format is the external system's concern, so the
    nested document is emitted as JSON (``to_json`` is JVM-side and
    whole-stage-codegen'd; an XML renderer would plug into the same
    projection).  Everything is one shuffle-free select.
    """
    body_cols = [c for c in df.columns if c not in (uuid_col, submission_col)]
    nested = nest_group_exprs(body_cols)
    payload = F.to_json(
        F.struct(F.lit(form_id).alias("@id"), *nested)
    ).alias("payload")
    return df.select(qcol(uuid_col).alias("uuid"), payload)
