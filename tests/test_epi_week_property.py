"""Property test: the epi-week column family agrees with a direct Python
port of the reference on random dates × epoch configs × strategies
(VERDICT r11 ask #6 — the r11 coding-DSL pattern applied to epi_week).

The model below ports ``meerkat_abacus/util/epi_week.py`` with the config
PARAMETERIZED instead of module-global: epi_week_for_date (:20-42) —
raw week measured from ``epi_year_start_date`` (:45-82, the date's own
CALENDAR-year start for ``day:N``), epi year from ``epi_year_by_date``
(:121-150, year-1 before the start), ``__handle_epi_week_53`` (:10-17)
remapping raw weeks 0/53 under every strategy, and
``__get_epi_week_for_custom_config`` (:178-182, highest configured year
whose start DATETIME <= the record's datetime — full timestamps, so a
12:00 start splits its own start day).

The sweep is three-way per (config, strategy): the Spark columns
(functions/epi_week.py:epi_week_columns), the DuckDB oracle SQL
(epi_week_duckdb_sql — what every certified epiweek query's oracle
embeds), and the model.  Dates concentrate on the year-boundary window
(Dec 20 – Jan 15, where week 0/52/53 remaps live) plus uniform fill,
over 2010-2016 (a leap year, a Jan-1-on-Monday year, a 53-week year).

Cleaned-semantics divergences (documented, deliberately not modeled):

- dict config, date BEFORE every configured start: the reference RAISES
  ValueError (__get_epi_week_for_custom_config:182); the engine yields
  NULL epi_year/epi_week — a crash is not a semantics.  Checked
  explicitly in test_dict_config_before_first_start_is_null; the random
  sweep generates dates on/after the earliest configured start.
- config strings containing "day" without a ``day:N`` shape (e.g.
  "someday") crash the reference on int(split(":")[1]); the engine's
  startswith("day:") check routes them to the Jan-1 fallback that
  epi_year_start_date:80-82 applies to every other unknown shape.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.epi_week import (
    WEEK_53_STRATEGIES,
    epi_week_columns,
    epi_week_duckdb_sql,
)

# --- reference model (util/epi_week.py port, config parameterized) ------


def _m_year_start_for_weekday(year: int, config: str) -> dt.datetime:
    # __epi_year_start_date_for_weekday_config (:169-175)
    target = int(config.split(":")[1])
    first = dt.datetime(year, 1, 1)
    adjustment = target - first.weekday()
    if adjustment < 0:
        adjustment += 7
    return first + dt.timedelta(days=adjustment)


def _m_custom(date: dt.datetime, config: dict):
    # __get_epi_week_for_custom_config (:178-182)
    for year, start in reversed(sorted(config.items())):
        if date >= start:
            return year, start
    raise ValueError(f"no epi year for {date!r}")


def model_epi_week(date: dt.datetime, config, strategy: str):
    """epi_week_for_date (:20-42) with config/strategy as arguments."""
    if isinstance(config, dict):
        year, start = _m_custom(date, config)
    elif isinstance(config, str) and "day" in config:
        # week from the CALENDAR year's start (:36 epi_year_start_date
        # gets the raw date), epi year from epi_year_by_date (:143-148)
        start = _m_year_start_for_weekday(date.year, config)
        year = date.year - 1 if date < start else date.year
    else:  # "international" and the :80-82 fallback
        start = dt.datetime(date.year, 1, 1)
        year = date.year
    week = (date - start).days // 7 + 1
    if week in (0, 53):  # __handle_epi_week_53 (:10-17)
        if strategy == "include_in_52":
            week = 52
        elif strategy == "include_in_1":
            year, week = year + 1, 1
        else:
            week = 53
    return year, week


# --- generators ----------------------------------------------------------


def _date_pool(rng: random.Random) -> list[dt.datetime]:
    dates = []
    for year in range(2011, 2017):  # boundary window around each Jan 1
        for off in range(-12, 16):
            dates.append(dt.datetime(year, 1, 1) + dt.timedelta(days=off))
    lo, hi = dt.datetime(2010, 6, 1), dt.datetime(2016, 12, 31)
    span = (hi - lo).days
    for _ in range(160):
        d = lo + dt.timedelta(days=rng.randrange(span))
        if rng.random() < 0.4:  # times exercise the dict TIMESTAMP compare
            d += dt.timedelta(
                hours=rng.randrange(24), minutes=rng.randrange(60)
            )
        dates.append(d)
    return dates


def _dict_configs(rng: random.Random) -> list[dict]:
    configs = []
    # boundary-splitting starts: one mid-day, one late-December (the
    # "week 1 starts in the previous calendar year" production shape)
    configs.append(
        {
            y: dt.datetime(y - 1, 12, 28 + (y % 3), 12 if y % 2 else 0)
            for y in range(2010, 2018)
        }
    )
    for _ in range(2):
        cfg = {}
        for y in range(2010, 2018):
            jitter = rng.randrange(-6, 7)
            cfg[y] = dt.datetime(y, 1, 1) + dt.timedelta(
                days=jitter, hours=rng.choice([0, 0, 9, 23])
            )
        configs.append(cfg)
    return configs


CONFIGS_KEY = "configs"


def _all_configs(rng: random.Random) -> list:
    return (
        ["international", "unknown_shape"]
        + [f"day:{n}" for n in range(7)]
        + _dict_configs(rng)
    )


# --- the sweep ------------------------------------------------------------


def test_epi_week_matches_reference_model_and_oracle_sql(spark):
    rng = random.Random(0xE91)
    dates = _date_pool(rng)
    configs = _all_configs(rng)

    # dict configs: keep dates on/after the earliest start (see header)
    def usable(d: dt.datetime, cfg) -> bool:
        return not isinstance(cfg, dict) or d >= min(cfg.values())

    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(dates)], schema="i int, ts timestamp"
    )
    con = duckdb.connect()
    con.register(
        "dates",
        __import__("pandas").DataFrame(
            {"i": range(len(dates)), "ts": dates}
        ),
    )

    cases = [
        (ci, cfg, strat)
        for ci, cfg in enumerate(configs)
        for strat in WEEK_53_STRATEGIES
    ]
    cols, sql_exprs = [], []
    for ci, cfg, strat in cases:
        y, w = epi_week_columns(F.col("ts"), cfg, strat)
        cols += [y.alias(f"y_{ci}_{strat}"), w.alias(f"w_{ci}_{strat}")]
        ys, ws = epi_week_duckdb_sql("ts", cfg, strat)
        sql_exprs += [
            f"{ys} AS y_{ci}_{strat}",
            f"{ws} AS w_{ci}_{strat}",
        ]

    spark_rows = {
        r["i"]: r for r in sdf.select("i", *cols).collect()
    }
    duck = con.sql(
        f"SELECT i, {', '.join(sql_exprs)} FROM dates ORDER BY i"
    ).df()
    duck_rows = {int(r["i"]): r for _, r in duck.iterrows()}

    checked = 0
    for ci, cfg, strat in cases:
        for i, d in enumerate(dates):
            if not usable(d, cfg):
                continue
            want = model_epi_week(d, cfg, strat)
            yk, wk = f"y_{ci}_{strat}", f"w_{ci}_{strat}"
            got_spark = (spark_rows[i][yk], spark_rows[i][wk])
            got_duck = (int(duck_rows[i][yk]), int(duck_rows[i][wk]))
            assert got_spark == want, (
                f"spark vs model: cfg={cfg!r} strat={strat} date={d} "
                f"spark={got_spark} model={want}"
            )
            assert got_duck == want, (
                f"duckdb vs model: cfg={cfg!r} strat={strat} date={d} "
                f"duck={got_duck} model={want}"
            )
            checked += 1
    # the sweep actually covered the corner population
    assert checked > 8000
    raw0 = sum(
        1
        for d in dates
        if (d - _m_year_start_for_weekday(d.year, "day:3")).days // 7 + 1
        == 0
    )
    assert raw0 >= 10, "boundary pool lost its raw-week-0 dates"


def test_dict_config_before_first_start_is_null(spark):
    """Documented divergence: the reference RAISES for a date before
    every configured start (util/epi_week.py:182); the engine yields NULL
    year/week (and the DuckDB SQL mirrors it) so one stray early record
    cannot kill a 100-TB batch."""
    cfg = {2015: dt.datetime(2015, 1, 4), 2016: dt.datetime(2016, 1, 3)}
    early = dt.datetime(2014, 7, 1)
    with pytest.raises(ValueError):
        model_epi_week(early, cfg, "leave_as_is")
    y, w = epi_week_columns(F.col("ts"), cfg, "leave_as_is")
    row = (
        spark.createDataFrame([(early,)], schema="ts timestamp")
        .select(y, w)
        .collect()[0]
    )
    assert row["epi_year"] is None and row["epi_week"] is None
    ys, ws = epi_week_duckdb_sql("ts", cfg, "leave_as_is")
    got = duckdb.sql(
        f"SELECT {ys} AS y, {ws} AS w FROM (SELECT TIMESTAMP '2014-07-01' AS ts)"
    ).fetchone()
    assert got == (None, None)
