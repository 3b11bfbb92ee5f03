"""Truth tables for the temporal joins (operators/temporal.py).

The oracle queries (asof_join, range_join_windows) prove parity against
DuckDB's native ASOF JOIN / a BETWEEN join at sf0.01; these tests pin the
EDGE semantics on hand-built rows: <=-tie visibility, left-outer nulls,
same-timestamp tiebreaks, bucket-boundary exclusivity, multi-bucket
intervals, and empty intervals.
"""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from meerkat_abacus_spark.operators.temporal import asof_join, range_join_buckets


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=_ts(5)),   # after r@3 -> 30.0
            Row(event_id=2, user_id=1, ts=_ts(10)),  # tie with r@10 -> 99.0
            Row(event_id=3, user_id=1, ts=_ts(2)),   # before any right -> null
            Row(event_id=4, user_id=2, ts=_ts(7)),   # user 2: tiebreak winner
            Row(event_id=5, user_id=3, ts=_ts(7)),   # user 3 has no rights
        ]
    )
    right = spark.createDataFrame(
        [
            Row(event_id=10, user_id=1, ts=_ts(3), value=30.0),
            Row(event_id=11, user_id=1, ts=_ts(10), value=99.0),
            # user 2: two rights at the SAME ts — larger event_id must win
            Row(event_id=12, user_id=2, ts=_ts(6), value=1.0),
            Row(event_id=13, user_id=2, ts=_ts(6), value=2.0),
        ]
    )
    out = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        payload_cols=["value"], tiebreak_col="event_id",
    )
    got = {r["event_id"]: (r["value_r"], r["ts_r"]) for r in out.collect()}
    assert got[1] == (30.0, _ts(3))
    assert got[2] == (99.0, _ts(10)), "right row AT left.ts must match (<=)"
    assert got[3] == (None, None), "no preceding right -> left-outer nulls"
    assert got[4] == (2.0, _ts(6)), "same-(key,ts) rights: max tiebreak wins"
    assert got[5] == (None, None)
    assert out.count() == 5, "every left row survives exactly once"


def test_asof_join_single_shuffle(spark):
    left = spark.range(10).select(
        F.col("id").alias("k"), F.timestamp_seconds(F.col("id")).alias("ts")
    )
    right = spark.range(5).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 2).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    out = asof_join(left, right, on=["k"], ts_col="ts", payload_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, (
        "as-of join must cost one hash Exchange (union shuffles once), got:\n"
        + plan
    )


def test_range_join_buckets_boundaries(spark):
    points = spark.createDataFrame(
        [
            Row(pid=1, ts=_ts(0)),        # == start -> inclusive
            Row(pid=2, ts=_ts(29, 59)),   # inside
            Row(pid=3, ts=_ts(30)),       # == end -> EXCLUSIVE
            Row(pid=4, ts=_ts(45)),       # inside second window only
            Row(pid=5, ts=_ts(59, 59)),   # still inside second window
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(wid=100, s=_ts(0), e=_ts(30)),
            Row(wid=200, s=_ts(40), e=dt.datetime(2024, 1, 1, 1, 0)),
            Row(wid=300, s=_ts(50), e=_ts(50)),  # empty -> matches nothing
        ]
    )
    out = range_join_buckets(
        points, intervals, point_ts="ts", start_col="s", end_col="e",
        bucket_seconds=300,  # 5-min buckets: every window spans several
    )
    pairs = sorted((r["pid"], r["wid"]) for r in out.collect())
    assert pairs == [(1, 100), (2, 100), (4, 200), (5, 200)]


def test_range_join_equijoin_plan(spark):
    points = spark.createDataFrame([Row(pid=1, ts=_ts(1))])
    intervals = spark.createDataFrame([Row(wid=1, s=_ts(0), e=_ts(9))])
    out = range_join_buckets(
        points, intervals, point_ts="ts", start_col="s", end_col="e",
        bucket_seconds=60,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, (
        "bucketed range join must compile to an equi-join, got:\n" + plan
    )


def test_asof_join_direction_validation_and_forward(spark):
    from datetime import datetime

    import pytest as _pytest

    from meerkat_abacus_spark.operators.temporal import asof_join

    mk = lambda ts: datetime.fromisoformat(ts)
    left = spark.createDataFrame(
        [(1, 10, mk("2024-01-01 10:00:00"))],
        schema="event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (2, 10, mk("2024-01-01 09:00:00"), 1.0),   # before: backward match
            (3, 10, mk("2024-01-01 11:00:00"), 2.0),   # after: forward match
        ],
        schema="event_id long, user_id long, ts timestamp, value double",
    )
    back = asof_join(
        left, right, on=["user_id"], ts_col="ts", payload_cols=["value"]
    ).collect()[0]
    fwd = asof_join(
        left, right, on=["user_id"], ts_col="ts", payload_cols=["value"],
        direction="forward",
    ).collect()[0]
    assert back.value_r == 1.0 and fwd.value_r == 2.0

    with _pytest.raises(ValueError):
        asof_join(left, right, on=["user_id"], ts_col="ts",
                  payload_cols=["value"], direction="nearest")
