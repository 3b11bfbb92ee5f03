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


def _qid(name: str) -> str:
    """Backtick-quoted SQL identifier (r16: the alert window chains build
    their projections as string expressions parsed JVM-side in one call —
    the former per-column withColumn chains cost ~1000 py4j round-trips
    per plan build on the alert headline queries; plans are unchanged)."""
    return "`" + name.replace("`", "``") + "`"


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
    type_cols = (
        [F.expr(f"{_qid(clinic_type_col)} AS clinic_type")]
        if clinic_type_col
        else []
    )
    type_names = ["clinic_type"] if clinic_type_col else []
    reason_sql = "'{}' AS reason".format(
        reason.replace("\\", "\\\\").replace("'", "''")
    )
    agg_exprs = (
        F.expr("count(1) AS count"),
        F.expr(f"array_sort(collect_list({_qid(uuid_col)})) AS uuids"),
    )

    def limit_sql(normal: int, hospital: int | None) -> str:
        # The reference first keeps groups >= the normal limit, THEN checks the
        # hospital limit for Hospital clinics (add_multiple_alerts.py:193-216) —
        # so a Hospital's effective threshold is max(normal, hospital).
        if hospital is not None and clinic_type_col is not None:
            return (
                f"CASE WHEN clinic_type = 'Hospital' THEN "
                f"greatest({int(normal)}, {int(hospital)}) "
                f"ELSE {int(normal)} END"
            )
        return str(int(normal))

    if daily_limit is not None:
        daily = (
            base.groupBy(
                F.expr(f"{_qid(clinic_col)} AS clinic"),
                F.expr(f"date_trunc('DAY', {_qid(date_col)}) AS period_start"),
                *type_cols,
            )
            .agg(*agg_exprs)
            .where(
                f"`count` >= {limit_sql(daily_limit, hospital_daily_limit)}"
            )
            .selectExpr(
                "clinic",
                *type_names,
                "period_start",
                "'day' AS period",
                # alert_duration=1 for daily alerts (add_multiple_alerts.py:211)
                "1 AS duration",
                reason_sql,
                "`count`",
                "uuids",
            )
        )
        outs.append(daily)

    if weekly_limit is not None:
        weekly = (
            base.groupBy(
                F.expr(f"{_qid(clinic_col)} AS clinic"),
                F.expr(f"{_qid(epi_year_col)} AS epi_year"),
                F.expr(f"{_qid(epi_week_col)} AS epi_week"),
                *type_cols,
            )
            .agg(*agg_exprs)
            .where(
                f"`count` >= {limit_sql(weekly_limit, hospital_weekly_limit)}"
            )
            .selectExpr(
                "clinic",
                *type_names,
                "epi_year",
                "epi_week",
                "'week' AS period",
                # alert_duration=7 for weekly alerts (add_multiple_alerts.py:244)
                "7 AS duration",
                reason_sql,
                "`count`",
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
            F.expr(f"{_qid(clinic_col)} AS clinic"),
            F.expr(f"{_qid(epi_year_col)} AS epi_year"),
            F.expr(f"{_qid(epi_week_col)} AS epi_week"),
        )
        .agg(
            F.expr("count(1) AS count"),
            F.expr(f"array_sort(collect_list({_qid(uuid_col)})) AS uuids"),
        )
        .selectExpr(
            "*",
            "(epi_year * 52 + least(epi_week, 52)) * 2"
            " + CAST(epi_week = 53 AS INT) AS abs_week",
        )
    )
    over = "OVER (PARTITION BY clinic ORDER BY abs_week)"
    flagged = (
        weekly.selectExpr(
            "*",
            f"lag(`count`, 1) {over} AS lag1",
            f"lag(`count`, 2) {over} AS lag2",
            f"lag(abs_week, 1) {over} AS abs_lag1",
            f"lag(abs_week, 2) {over} AS abs_lag2",
            "sum(`count`) OVER (PARTITION BY clinic ORDER BY abs_week"
            " ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS total5",
        )
        # consecutive weeks only (the reference window is contiguous weeks);
        # on the doubled axis adjacency is gap <= 2 (gap 1 only across a
        # week-53 half-slot, gap 2 otherwise; ordering is strict so gaps > 0)
        .where(
            "(abs_week - abs_lag1 <= 2) AND (abs_lag1 - abs_lag2 <= 2)"
            f" AND (lag2 > 1) AND (lag1 >= {float(factor)!r}D * lag2)"
            f" AND (`count` >= {float(factor)!r}D * lag1)"
            f" AND (total5 >= {int(min_total)})"
        )
        .selectExpr(
            "clinic",
            "epi_year",
            "epi_week",
            "'{}' AS reason".format(reason.replace("\\", "\\\\").replace("'", "''")),
            "`count`",
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
    keep = [c for c in alerts.columns if c != uuid_array_col]
    arr = _qid(uuid_array_col)
    return (
        alerts.selectExpr(
            *[_qid(c) for c in keep],
            f"array_min({arr}) AS master_alert",
            f"explode({arr}) AS uuid",
        )
        .selectExpr("*", "CAST(uuid != master_alert AS INT) AS sub_alert")
        .selectExpr(
            "*",
            "CASE WHEN sub_alert = 0 THEN "
            f"right(uuid, {int(alert_id_len)}) END AS alert_id",
        )
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
