"""Epi-week truth tables, ported from reference semantics
(meerkat_abacus/util/epi_week.py + tests/test_to_codes_step.py:113-118)."""

import datetime

from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.epi_week import epi_week_columns


def _run(spark, dates, config, strategy="leave_as_is"):
    df = spark.createDataFrame([(d,) for d in dates], ["d"]).select(
        "d", *epi_week_columns(F.col("d"), config, strategy)
    )
    return {r["d"]: (r["epi_year"], r["epi_week"]) for r in df.collect()}


def test_international(spark):
    res = _run(
        spark,
        [
            datetime.date(2017, 1, 1),
            datetime.date(2017, 1, 7),
            datetime.date(2017, 1, 8),
            datetime.date(2017, 12, 31),
            datetime.date(2016, 12, 31),  # leap year day 366 → week 53
        ],
        "international",
    )
    assert res[datetime.date(2017, 1, 1)] == (2017, 1)
    assert res[datetime.date(2017, 1, 7)] == (2017, 1)
    assert res[datetime.date(2017, 1, 8)] == (2017, 2)
    assert res[datetime.date(2017, 12, 31)] == (2017, 53)
    assert res[datetime.date(2016, 12, 31)] == (2016, 53)


def test_day_config_monday(spark):
    # demo_config.py:41 uses day:0 (Monday).  2017-01-01 was a Sunday, so epi
    # year 2017 starts Mon 2017-01-02; Jan 1 belongs to epi year 2016.
    res = _run(
        spark,
        [
            datetime.date(2017, 1, 1),
            datetime.date(2017, 1, 2),
            datetime.date(2017, 1, 14),
            datetime.date(2024, 1, 1),  # a Monday: week 1 day 1
        ],
        "day:0",
    )
    assert res[datetime.date(2017, 1, 2)] == (2017, 1)
    assert res[datetime.date(2017, 1, 14)] == (2017, 2)
    assert res[datetime.date(2017, 1, 1)][0] == 2016
    assert res[datetime.date(2024, 1, 1)] == (2024, 1)


def test_day_config_boundary_week_zero(spark):
    """Dates between Jan 1 and the day:N epi-year start get raw week 0
    against their own calendar-year start, then remap by strategy — the
    reference epi_week_for_date path (util/epi_week.py:20-42, 10-17).

    Truth values hand-computed from the reference algorithm: 2025-01-01 is a
    Wednesday, so the day:0 (Monday) epi year 2025 starts 2025-01-06."""
    jan1, jan5, jan6 = (
        datetime.date(2025, 1, 1),
        datetime.date(2025, 1, 5),
        datetime.date(2025, 1, 6),
    )
    dec30 = datetime.date(2024, 12, 30)  # raw week 53 of 2024
    res = _run(spark, [jan1, jan5, jan6, dec30], "day:0", "leave_as_is")
    assert res[jan1] == (2024, 53)
    assert res[jan5] == (2024, 53)
    assert res[jan6] == (2025, 1)
    assert res[dec30] == (2024, 53)
    res = _run(spark, [jan1, jan6, dec30], "day:0", "include_in_1")
    assert res[jan1] == (2025, 1)
    assert res[jan6] == (2025, 1)
    assert res[dec30] == (2025, 1)
    res = _run(spark, [jan1, jan6], "day:0", "include_in_52")
    assert res[jan1] == (2024, 52)
    assert res[jan6] == (2025, 1)
    # the lenient round-1 case, now pinned exactly: Sunday 2017-01-01 under
    # day:0 is week 53 of epi year 2016
    assert _run(spark, [datetime.date(2017, 1, 1)], "day:0")[
        datetime.date(2017, 1, 1)
    ] == (2016, 53)


def test_week_53_strategies(spark):
    d = datetime.date(2016, 12, 31)
    assert _run(spark, [d], "international", "leave_as_is")[d] == (2016, 53)
    assert _run(spark, [d], "international", "include_in_52")[d] == (2016, 52)
    assert _run(spark, [d], "international", "include_in_1")[d] == (2017, 1)


def test_dict_config(spark):
    config = {
        2011: datetime.datetime(2011, 1, 2),
        2012: datetime.datetime(2011, 12, 31),
    }
    res = _run(
        spark,
        [datetime.date(2011, 1, 2), datetime.date(2011, 12, 31), datetime.date(2012, 1, 5)],
        config,
    )
    assert res[datetime.date(2011, 1, 2)] == (2011, 1)
    assert res[datetime.date(2011, 12, 31)] == (2012, 1)
    assert res[datetime.date(2012, 1, 5)] == (2012, 1)


def test_dict_config_timestamp_granularity(spark):
    """Dict start datetimes with a nonzero time split their own start DAY —
    the reference compares full datetimes (util/epi_week.py:44-60,
    __get_epi_week_for_custom_config); round-2 ADVICE item 4."""
    config = {
        2022: datetime.datetime(2022, 1, 6),
        2023: datetime.datetime(2023, 1, 5, 12, 0),
    }
    before = datetime.datetime(2023, 1, 5, 6, 0)    # before the 12:00 start
    after = datetime.datetime(2023, 1, 5, 13, 0)    # after it
    res = _run(spark, [before, after], config)
    # 13:00 is past the 2023 start -> (2023, week 1)
    assert res[after] == (2023, 1)
    # 06:00 still belongs to epi year 2022: 364 full days from 2022-01-06
    # -> raw week 53 (leave_as_is keeps it)
    assert res[before] == (2022, 53)

    # the emitted DuckDB SQL agrees at timestamp granularity
    import duckdb

    from meerkat_abacus_spark.functions.epi_week import epi_week_duckdb_sql

    y_sql, w_sql = epi_week_duckdb_sql("t", config)
    con = duckdb.connect()
    duck = con.sql(
        f"""
        SELECT {y_sql} AS epi_year, {w_sql} AS epi_week
        FROM (VALUES (TIMESTAMP '2023-01-05 06:00:00'),
                     (TIMESTAMP '2023-01-05 13:00:00')) AS v(t)
        ORDER BY t
        """
    ).fetchall()
    assert duck == [(2022, 53), (2023, 1)]


def test_matches_duckdb_oracle(spark):
    """The Spark formula and the emitted DuckDB SQL agree over a dense range."""
    import duckdb

    from meerkat_abacus_spark.functions.epi_week import epi_week_duckdb_sql

    con = duckdb.connect()
    for config in ("international", "day:0", "day:2"):
        y_sql, w_sql = epi_week_duckdb_sql("d", config)
        duck = con.sql(
            f"""
            SELECT d::DATE AS d, {y_sql} AS epi_year, {w_sql} AS epi_week
            FROM (SELECT unnest(generate_series(DATE '2015-12-20',
                                                DATE '2018-01-15',
                                                INTERVAL 1 DAY)) AS d)
            """
        ).fetchall()
        expected = {r[0].date() if hasattr(r[0], "date") else r[0]: (r[1], r[2]) for r in duck}
        got = _run(spark, sorted(expected), config)
        assert got == expected, f"mismatch for {config}"
