"""Alert aggregation (A1-A4): threshold and trend alerts as windowed aggs.

Reference: meerkat_abacus/pipeline_worker/process_steps/add_multiple_alerts.py
— the reference pulls ±7 days of rows *per record* back from Postgres into
pandas and groups in-process (:154-216); here each alert family is one
distributed groupBy over the whole data table:

- A1 daily threshold    groupBy(clinic, day)       count >= limit
- A2 weekly threshold   groupBy(clinic, epi-week)  count >= limit
- A3 double-double      weekly counts + lag(1), lag(2) window predicate
- A4 representative     min-uuid in the group is the master; the rest become
                        sub_alerts (add_multiple_alerts.py:78-138)

Shuffle budget: one shuffle on (clinic, bucket) for the agg; A3 adds one
window shuffle on clinic.  Clinic × week keys are small and well distributed;
a national outbreak concentrating rows in one clinic-day is exactly what AQE
skew-join/partition splitting absorbs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def threshold_alerts(
    df: DataFrame,
    var_predicate: Column,
    clinic_col: str = "clinic",
    date_col: str = "date",
    uuid_col: str = "uuid",
    daily_limit: int | None = None,
    weekly_limit: int | None = None,
    hospital_daily_limit: int | None = None,
    hospital_weekly_limit: int | None = None,
    clinic_type_col: str | None = None,
    epi_year_col: str = "epi_year",
    epi_week_col: str = "epi_week",
    reason: str = "",
) -> DataFrame:
    """A1/A2 — one alert row per (clinic, day|week) bucket over the limit.

    Output: clinic, period_start, period ('day'|'week'), reason, count,
    uuids ARRAY<STRING> sorted ascending (add_multiple_alerts.py:154-252;
    separate hospital limits when four limits are configured).
    """
    base = df.filter(var_predicate)
    outs: list[DataFrame] = []
    type_cols = [F.col(clinic_type_col).alias("clinic_type")] if clinic_type_col else []
    type_names = ["clinic_type"] if clinic_type_col else []

    def limit_expr(normal: int, hospital: int | None) -> Column:
        # The reference first keeps groups >= the normal limit, THEN checks the
        # hospital limit for Hospital clinics (add_multiple_alerts.py:193-216) —
        # so a Hospital's effective threshold is max(normal, hospital).
        if hospital is not None and clinic_type_col is not None:
            return F.when(
                F.col("clinic_type") == "Hospital",
                F.greatest(F.lit(normal), F.lit(hospital)),
            ).otherwise(F.lit(normal))
        return F.lit(normal)

    if daily_limit is not None:
        daily = (
            base.groupBy(
                F.col(clinic_col).alias("clinic"),
                F.date_trunc("DAY", F.col(date_col)).alias("period_start"),
                *type_cols,
            )
            .agg(
                F.count(F.lit(1)).alias("count"),
                F.array_sort(F.collect_list(F.col(uuid_col))).alias("uuids"),
            )
            .filter(F.col("count") >= limit_expr(daily_limit, hospital_daily_limit))
            .select(
                "clinic",
                *type_names,
                "period_start",
                F.lit("day").alias("period"),
                # alert_duration=1 for daily alerts (add_multiple_alerts.py:211)
                F.lit(1).alias("duration"),
                F.lit(reason).alias("reason"),
                "count",
                "uuids",
            )
        )
        outs.append(daily)

    if weekly_limit is not None:
        weekly = (
            base.groupBy(
                F.col(clinic_col).alias("clinic"),
                F.col(epi_year_col).alias("epi_year"),
                F.col(epi_week_col).alias("epi_week"),
                *type_cols,
            )
            .agg(
                F.count(F.lit(1)).alias("count"),
                F.array_sort(F.collect_list(F.col(uuid_col))).alias("uuids"),
            )
            .filter(F.col("count") >= limit_expr(weekly_limit, hospital_weekly_limit))
            .select(
                "clinic",
                *type_names,
                "epi_year",
                "epi_week",
                F.lit("week").alias("period"),
                # alert_duration=7 for weekly alerts (add_multiple_alerts.py:244)
                F.lit(7).alias("duration"),
                F.lit(reason).alias("reason"),
                "count",
                "uuids",
            )
        )
        outs.append(weekly)

    if not outs:
        raise ValueError("at least one of daily_limit/weekly_limit required")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o, allowMissingColumns=True)
    return out


def double_double_alerts(
    df: DataFrame,
    var_predicate: Column,
    clinic_col: str = "clinic",
    uuid_col: str = "uuid",
    epi_year_col: str = "epi_year",
    epi_week_col: str = "epi_week",
    min_total: int = 14,
    factor: float = 2.0,
    reason: str = "",
) -> DataFrame:
    """A3 — counts grow by ``factor`` twice across 3 consecutive epi weeks
    and the 5-week total is >= ``min_total`` (add_multiple_alerts.py:255-358;
    the reference's factor is exactly 2 — "double-double").

    The reference's raw-SQL ±2-week window with year wraparound becomes an
    absolute-week axis with lag/sum windows.  The axis doubles ``epi_year *
    52 + epi_week`` and parks week 53 on the odd slot between week 52 and
    the next year's week 1::

        slot(Y, w)  = 2 * (Y*52 + least(w, 52)) + int(w == 53)

    because the reference's wraparound arithmetic assumes 52-week years
    (add_multiple_alerts.py:288-316 maps week 52 of year Y and week 1 of
    year Y+1 to adjacent slots) *but* the ``leave_as_is`` week-53 strategy
    (epi_week.py) emits genuine week-53 buckets: a plain 52-multiplier
    would collide (Y, 53) with (Y+1, 1) — nondeterministic LAG ordering and
    a double-counted 5-week sum — while a 53-multiplier would insert a
    phantom gap at every ordinary year boundary and silently drop
    cross-New-Year doubling trends.  On the doubled axis adjacency is
    ``gap <= 2``: within-year successors and (Y,52)->(Y+1,1) have gap 2,
    (Y,52)->(Y,53) and (Y,53)->(Y+1,1) have gap 1, and every non-adjacent
    pair has gap >= 3, so the axis is injective and the reference's
    adjacency assumptions are preserved exactly where they apply.
    """
    weekly = (
        df.filter(var_predicate)
        .groupBy(
            F.col(clinic_col).alias("clinic"),
            F.col(epi_year_col).alias("epi_year"),
            F.col(epi_week_col).alias("epi_week"),
        )
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.array_sort(F.collect_list(F.col(uuid_col))).alias("uuids"),
        )
        .withColumn(
            "abs_week",
            (F.col("epi_year") * 52 + F.least(F.col("epi_week"), F.lit(52))) * 2
            + (F.col("epi_week") == 53).cast("int"),
        )
    )
    w = Window.partitionBy("clinic").orderBy("abs_week")
    w5 = w.rowsBetween(-4, 0)
    flagged = (
        weekly.withColumns(
            {
                "lag1": F.lag("count", 1).over(w),
                "lag2": F.lag("count", 2).over(w),
                "abs_lag1": F.lag("abs_week", 1).over(w),
                "abs_lag2": F.lag("abs_week", 2).over(w),
                "total5": F.sum("count").over(w5),
            }
        )
        # consecutive weeks only (the reference window is contiguous weeks);
        # on the doubled axis adjacency is gap <= 2 (gap 1 only across a
        # week-53 half-slot, gap 2 otherwise; ordering is strict so gaps > 0)
        .filter(
            (F.col("abs_week") - F.col("abs_lag1") <= 2)
            & (F.col("abs_lag1") - F.col("abs_lag2") <= 2)
            & (F.col("lag2") > 1)
            & (F.col("lag1") >= F.lit(factor) * F.col("lag2"))
            & (F.col("count") >= F.lit(factor) * F.col("lag1"))
            & (F.col("total5") >= F.lit(min_total))
        )
        .select(
            "clinic",
            "epi_year",
            "epi_week",
            F.lit(reason).alias("reason"),
            "count",
            "uuids",
        )
    )
    return flagged


def assign_representatives(
    alerts: DataFrame, uuid_array_col: str = "uuids", alert_id_len: int = 6
) -> DataFrame:
    """A4 — explode each alert's member uuids; the minimum uuid is the master,
    the others become sub-alerts pointing at it (add_multiple_alerts.py:78-138).

    ``alert_id_len`` mirrors the country config's ``alert_id_length``
    (demo_config.py:156; add_multiple_alerts.py:108-111 slices
    ``uuid[-alert_id_length:]``).

    The reference's ``found_uuids`` set (add_multiple_alerts.py:34,63,125) is
    an incremental-emission artifact: each arriving record re-queries ±7 days
    and would re-emit the same alert members, so emission is suppressed per
    batch.  In this engine every (clinic, bucket) group is computed exactly
    once per pass and replays are absorbed by the (uuid, type) upsert (K2),
    so no driver-side dedup set exists or is needed."""
    return (
        alerts.withColumn("master_alert", F.array_min(F.col(uuid_array_col)))
        .withColumn("uuid", F.explode(F.col(uuid_array_col)))
        .withColumn("sub_alert", (F.col("uuid") != F.col("master_alert")).cast("int"))
        .withColumn(
            "alert_id",
            F.when(
                F.col("sub_alert") == 0,
                F.right(F.col("uuid"), F.lit(alert_id_len)),
            ),
        )
        .drop(uuid_array_col)
    )


def attach_alert_data(
    alerts: DataFrame,
    form: DataFrame,
    alert_data: dict[str, str],
    uuid_col: str = "uuid",
    form_uuid_col: str = "uuid",
) -> DataFrame:
    """J8 — copy configured form columns onto alert rows as ``alert_<var>``.

    Reference ``add_multiple_alerts.py:140-144`` (``_add_alert_data``): for each
    ``data_var -> data_column`` in the country config's ``alert_data[form]``
    mapping, the alert record gains ``alert_<data_var>`` holding the raw form
    record's ``data_column`` value, looked up by the alert's uuid
    (``add_multiple_alerts.py:89-121`` joins masters back to the form table).

    The form side is projected to (uuid, configured columns) before the join so
    the broadcast carries only the needed payload; at scale the alert side is
    tiny relative to the form table, so we broadcast *alerts* would be wrong —
    instead the pruned form projection joins on the uuid equi-key and Catalyst
    broadcasts whichever side is small enough.
    """
    from ..functions.cols import qcol

    payload = form.select(
        qcol(form_uuid_col).alias("__form_uuid"),
        *[
            qcol(data_column).alias("alert_" + data_var)
            for data_var, data_column in alert_data.items()
        ],
    )
    joined = alerts.join(
        payload, on=alerts[uuid_col] == payload["__form_uuid"], how="left"
    )
    return joined.drop("__form_uuid")
