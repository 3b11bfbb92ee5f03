"""Epi-week bucketing as pure Catalyst column expressions.

Reference semantics: meerkat_abacus/util/epi_week.py:20-82 (epi year start
date per config), :10-17 (week-53 strategy).  Three config shapes:

- ``"international"``       — epi week 1 starts Jan 1.
- ``"day:N"``               — epi week 1 starts on the first weekday N
                              (Monday=0) on/after Jan 1; dates before that
                              start belong to the previous epi year.
- ``{year: datetime, ...}`` — explicit per-year start dates.

``epi_week = (date - epi_year_start) // 7 + 1``; a resulting week of 0 or 53
is remapped by strategy ``include_in_52 | include_in_1 | leave_as_is``.

Everything here is date arithmetic on built-in functions — no UDF — so it
inlines into whole-stage codegen and vectorizes at 100 TB scale; the same
formula is also emitted as DuckDB SQL (for oracle checks) by
:func:`epi_week_duckdb_sql`.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

WEEK_53_STRATEGIES = ("include_in_52", "include_in_1", "leave_as_is")


def _weekday(col: Column) -> Column:
    """Python-style weekday (Monday=0 .. Sunday=6) of a date column."""
    # dayofweek: Sunday=1 .. Saturday=7  →  (dow + 5) % 7 gives Monday=0.
    return F.pmod(F.dayofweek(col) + F.lit(5), F.lit(7))


def epi_year_start_col(year_col: Column, epi_config: str | dict) -> Column:
    """Date of epi week 1's first day for the epi year in ``year_col``."""
    first = F.make_date(year_col, F.lit(1), F.lit(1))
    if isinstance(epi_config, dict):
        # Chained CASE over the explicit per-year start dates.
        expr = F.lit(None).cast("date")
        for y, start in sorted(epi_config.items()):
            expr = F.when(year_col == F.lit(int(y)), F.lit(start.date() if isinstance(start, _dt.datetime) else start)).otherwise(expr)
        return expr
    if isinstance(epi_config, str) and epi_config.startswith("day:"):
        target = int(epi_config.split(":")[1])
        adjustment = F.pmod(F.lit(target) - _weekday(first), F.lit(7))
        return F.date_add(first, adjustment)
    # "international" and any unknown config fall back to Jan 1
    # (reference epi_week.py:80-82 has the same fallback).
    return first


def epi_week_columns(
    date_col: Column | str,
    epi_config: str | dict = "international",
    week_53_strategy: str = "leave_as_is",
) -> tuple[Column, Column]:
    """Return ``(epi_year, epi_week)`` integer columns for a date/timestamp column.

    Reference: meerkat_abacus/util/epi_week.py:20-42 (epi_week_for_date).

    Pass the COLUMN NAME as a string where possible (r16): the expression
    is then generated as SQL and parsed JVM-side in two calls instead of
    ~40 Column-construction py4j round-trips (same values — twin-pinned,
    see :func:`epi_week_sql`).  Column inputs keep the Column builder.
    """
    if isinstance(date_col, str):
        y, w = epi_week_sql(
            "`" + date_col.replace("`", "``") + "`",
            epi_config,
            week_53_strategy,
        )
        return (
            F.expr(y).alias("epi_year"),
            F.expr(w).alias("epi_week"),
        )
    if week_53_strategy not in WEEK_53_STRATEGIES:
        raise ValueError(f"unknown week-53 strategy {week_53_strategy!r}")
    d = F.to_date(date_col)

    if isinstance(epi_config, dict):
        # epi year = largest configured year whose start <= the record's
        # TIMESTAMP: the reference compares full datetimes
        # (__get_epi_week_for_custom_config, util/epi_week.py:44-60), so a
        # configured start of e.g. 12:00 splits its own start day.  The
        # raw week is the full-seconds difference floored to days then to
        # weeks — floor(floor(s/86400)/7) — matching timedelta ``.days``
        # followed by ``// 7``.
        t = F.to_timestamp(date_col)
        items = sorted(epi_config.items())
        year_expr: Column = F.lit(None).cast("int")
        start_expr: Column = F.lit(None).cast("timestamp")
        for y, start in items:  # ascending: later matches overwrite earlier
            start_dt = (
                start
                if isinstance(start, _dt.datetime)
                else _dt.datetime.combine(start, _dt.time())
            )
            sd = F.lit(start_dt)
            cond = t >= sd
            year_expr = F.when(cond, F.lit(int(y))).otherwise(year_expr)
            start_expr = F.when(cond, sd).otherwise(start_expr)
        days = F.floor(
            (F.unix_timestamp(t) - F.unix_timestamp(start_expr)) / 86400
        )
        week = (F.floor(days / 7) + 1).cast("int")
        return _apply_week_53(
            year_expr.cast("int"), week, week_53_strategy
        )
    elif isinstance(epi_config, str) and epi_config.startswith("day:"):
        # Reference epi_week_for_date (util/epi_week.py:20-42): the raw week
        # is ALWAYS measured from the date's own CALENDAR-year epi start —
        # boundary dates (Jan 1 .. start-1) get raw week 0, which the
        # week-53 strategy then remaps — while epi_year comes from
        # epi_year_by_date (year-1 when the date precedes the start).
        cal_year = F.year(d)
        this_years_start = epi_year_start_col(cal_year, epi_config)
        epi_year = F.when(d < this_years_start, cal_year - 1).otherwise(cal_year)
        start = this_years_start
    else:
        epi_year = F.year(d)
        start = epi_year_start_col(epi_year, epi_config)

    week = (F.floor(F.datediff(d, start) / 7) + 1).cast("int")
    return _apply_week_53(epi_year.cast("int"), week, week_53_strategy)


def _apply_week_53(
    epi_year: Column, week: Column, week_53_strategy: str
) -> tuple[Column, Column]:
    """__handle_epi_week_53 (util/epi_week.py:10-17): a raw week of 0 or 53
    is remapped under EVERY strategy — leave_as_is yields week 53."""
    is_overflow = week.isin(0, 53)
    if week_53_strategy == "include_in_52":
        week = F.when(is_overflow, F.lit(52)).otherwise(week)
    elif week_53_strategy == "include_in_1":
        epi_year = F.when(is_overflow, epi_year + 1).otherwise(epi_year)
        week = F.when(is_overflow, F.lit(1)).otherwise(week)
    else:  # leave_as_is
        week = F.when(is_overflow, F.lit(53)).otherwise(week)
    return epi_year.alias("epi_year"), week.alias("epi_week")


# --- SQL-string twin (r16, guide §7.3 driver time) -------------------------
#
# ``epi_week_sql`` mirrors ``epi_week_columns`` expression-for-expression as
# Spark SQL strings, so query builds embed the epi bucketing in a single
# parsed expression instead of ~40 Column-construction py4j round-trips.
# Divergence between the twins is pinned by
# tests/test_r16_optimizations.py::test_epi_week_sql_matches_columns
# (all 3 config shapes × all 3 strategies over a multi-year date sweep).


def _weekday_sql(expr: str) -> str:
    return f"pmod(dayofweek({expr}) + 5, 7)"


def _week_53_sql_pair(
    epi_year: str, week: str, week_53_strategy: str
) -> tuple[str, str]:
    overflow = f"({week}) IN (0, 53)"
    if week_53_strategy == "include_in_52":
        week = f"CASE WHEN {overflow} THEN 52 ELSE {week} END"
    elif week_53_strategy == "include_in_1":
        epi_year = f"CASE WHEN {overflow} THEN ({epi_year}) + 1 ELSE {epi_year} END"
        week = f"CASE WHEN {overflow} THEN 1 ELSE {week} END"
    else:  # leave_as_is
        week = f"CASE WHEN {overflow} THEN 53 ELSE {week} END"
    return epi_year, week


def epi_week_sql(
    date_sql: str,
    epi_config: str | dict = "international",
    week_53_strategy: str = "leave_as_is",
) -> tuple[str, str]:
    """``(epi_year_sql, epi_week_sql)`` — Spark SQL strings computing the
    same values as :func:`epi_week_columns` over the date expression
    ``date_sql`` (pass a quoted identifier or any SQL expression)."""
    if week_53_strategy not in WEEK_53_STRATEGIES:
        raise ValueError(f"unknown week-53 strategy {week_53_strategy!r}")
    d = f"to_date({date_sql})"

    if isinstance(epi_config, dict):
        t = f"to_timestamp({date_sql})"
        year_expr = "CAST(NULL AS INT)"
        start_expr = "CAST(NULL AS TIMESTAMP)"
        for y, start in sorted(epi_config.items()):
            start_dt = (
                start
                if isinstance(start, _dt.datetime)
                else _dt.datetime.combine(start, _dt.time())
            )
            sd = "TIMESTAMP '{}'".format(
                start_dt.strftime("%Y-%m-%d %H:%M:%S")
            )
            cond = f"{t} >= {sd}"
            year_expr = f"CASE WHEN {cond} THEN {int(y)} ELSE {year_expr} END"
            start_expr = f"CASE WHEN {cond} THEN {sd} ELSE {start_expr} END"
        days = f"floor((unix_timestamp({t}) - unix_timestamp({start_expr})) / 86400)"
        week = f"CAST(floor(({days}) / 7) + 1 AS INT)"
        return _week_53_sql_pair(
            f"CAST({year_expr} AS INT)", week, week_53_strategy
        )
    elif isinstance(epi_config, str) and epi_config.startswith("day:"):
        target = int(epi_config.split(":")[1])
        cal_year = f"year({d})"
        first = f"make_date({cal_year}, 1, 1)"
        adjustment = f"pmod({target} - {_weekday_sql(first)}, 7)"
        start = f"date_add({first}, {adjustment})"
        epi_year = (
            f"CASE WHEN {d} < {start} THEN {cal_year} - 1 ELSE {cal_year} END"
        )
    else:
        epi_year = f"year({d})"
        start = f"make_date({epi_year}, 1, 1)"

    week = f"CAST(floor(datediff({d}, {start}) / 7) + 1 AS INT)"
    return _week_53_sql_pair(
        f"CAST({epi_year} AS INT)", week, week_53_strategy
    )


def epi_week_duckdb_sql(
    date_expr: str,
    epi_config: str | dict = "international",
    week_53_strategy: str = "leave_as_is",
) -> tuple[str, str]:
    """The same epi-year/epi-week formula as ANSI SQL for the DuckDB oracle.

    Returns ``(epi_year_sql, epi_week_sql)`` string expressions over
    ``date_expr``.  Supports all three config shapes — ``international``,
    ``day:N`` and per-year dict — so every config path is oracle-checkable.
    """
    d = f"CAST({date_expr} AS DATE)"
    if isinstance(epi_config, dict):
        # Mirror the Spark dict branch: epi year = largest configured year
        # whose start TIMESTAMP <= the record's timestamp (chained CASE,
        # descending so the first match wins); the raw week is the
        # full-seconds difference floored to days then to weeks — the
        # reference compares datetimes, not dates (util/epi_week.py:44-60).
        t = f"CAST({date_expr} AS TIMESTAMP)"
        items = sorted(epi_config.items(), reverse=True)
        year_arms, start_arms = [], []
        for y, start in items:
            start_dt = (
                start
                if isinstance(start, _dt.datetime)
                else _dt.datetime.combine(start, _dt.time())
            )
            sd = start_dt.isoformat(sep=" ")
            year_arms.append(f"WHEN {t} >= TIMESTAMP '{sd}' THEN {int(y)}")
            start_arms.append(
                f"WHEN {t} >= TIMESTAMP '{sd}' THEN TIMESTAMP '{sd}'"
            )
        epi_year = "(CASE " + " ".join(year_arms) + " ELSE NULL END)"
        start = "(CASE " + " ".join(start_arms) + " ELSE NULL END)"
        week = (
            f"(CAST(floor(floor(date_diff('second', {start}, {t}) / 86400.0)"
            f" / 7) AS INT) + 1)"
        )
        return _week_53_sql(f"CAST({epi_year} AS INT)", week, week_53_strategy)
    elif isinstance(epi_config, str) and epi_config.startswith("day:"):
        target = int(epi_config.split(":")[1])

        def start_for(year_sql: str) -> str:
            first = f"make_date({year_sql}, 1, 1)"
            # isodow: Monday=1..Sunday=7 → python weekday = isodow - 1
            return (
                f"({first} + CAST((({target} - (isodow({first}) - 1)) % 7 + 7) % 7 AS INT))"
            )

        year_raw = f"year({d})"
        epi_year = (
            f"(CASE WHEN {d} < {start_for(year_raw)} THEN {year_raw} - 1 "
            f"ELSE {year_raw} END)"
        )
        # raw week against the date's CALENDAR-year start (reference
        # epi_week_for_date) — boundary dates yield week 0, remapped below.
        start = start_for(year_raw)
    else:
        epi_year = f"year({d})"
        start = f"make_date({epi_year}, 1, 1)"

    week = f"(CAST(floor(datediff('day', {start}, {d}) / 7) AS INT) + 1)"
    return _week_53_sql(f"CAST({epi_year} AS INT)", week, week_53_strategy)


def _week_53_sql(
    epi_year: str, week: str, week_53_strategy: str
) -> tuple[str, str]:
    """SQL mirror of :func:`_apply_week_53`."""
    overflow = f"({week} IN (0, 53))"
    if week_53_strategy == "include_in_52":
        week = f"(CASE WHEN {overflow} THEN 52 ELSE {week} END)"
    elif week_53_strategy == "include_in_1":
        epi_year = f"(CASE WHEN {overflow} THEN {epi_year} + 1 ELSE {epi_year} END)"
        week = f"(CASE WHEN {overflow} THEN 1 ELSE {week} END)"
    else:  # leave_as_is: raw week 0 becomes 53 (util/epi_week.py:10-17)
        week = f"(CASE WHEN {overflow} THEN 53 ELSE {week} END)"
    return epi_year, f"CAST({week} AS INT)"
