"""Temporal joins Spark lacks as built-ins: as-of join and point-in-interval
(range) join, both expressed as shuffle-bounded compositions of DataFrame
ops — no Pandas cogroup, no cross product.

The reference engine has no temporal-join operator (its per-row Celery
workers look rows up by key one at a time); these are the scale-path
equivalents a training-data pipeline needs — e.g. attach the latest device
config at-or-before each submission, or label every event with the outage
window containing it.

As-of join
----------
``asof_join(left, right, ...)`` answers, for every left row, "the most
recent right row with ``right.ts <= left.ts`` sharing the key".  Instead of
a per-key ``merge_asof`` in Python (cogroup + Arrow round-trip), tag and
union both sides, then run one ``last(payload, ignorenulls=True)`` window
per key ordered by ``(ts, side)``:

    - one Exchange (hash by key) + one sort — identical shuffle shape to
      the sort-merge join Spark would run anyway;
    - the window scan is linear and streaming-friendly (running "last seen
      right payload"), never materializing per-key arrays;
    - whole plan stays in WholeStageCodegen; at 100 TB the cost is one
      shuffle of left+right, which is the information-theoretic floor for
      keyed as-of.

Ties: a right row AT the left timestamp matches (``<=`` semantics), so the
union sorts right rows before left rows within an equal ``ts``.  Multiple
right rows on the same (key, ts) are pre-deduped to the one with the
largest tiebreaker so both engines pick the same winner (DuckDB's native
``ASOF JOIN`` — the oracle — leaves that tie unspecified otherwise).

Range join
----------
``range_join_buckets(points, intervals, ...)`` joins point rows to the
intervals containing them WITHOUT an equi-key.  A naive plan is a
BroadcastNestedLoopJoin (fine only while intervals broadcast); the scale
path bins time into fixed-width buckets: each interval explodes to the
buckets it overlaps, each point computes its single bucket, and the join
becomes an equi-join on ``bucket`` plus a residual range filter.  Shuffle
volume is |points| + |intervals| x avg-buckets-per-interval, and the
equi-join prunes everything else — the standard trick behind
Databricks/Flink range-join optimizations, here as an explicit composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "range_join_buckets"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """Keyed as-of join: the nearest right row at-or-before each left row
    (``direction="backward"``, the default: latest ``right.ts <=
    left.ts``) or at-or-after it (``direction="forward"``: earliest
    ``right.ts >= left.ts``).

    Returns every left row (left outer semantics) plus ``payload_cols``
    from the matched right row renamed with ``suffix`` (null when no right
    row qualifies), plus ``<ts_col><suffix>`` — the matched right
    timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if tiebreak_col is not None:
        pick = Window.partitionBy(*on, ts_col).orderBy(F.col(tiebreak_col).desc())
        right = (
            right.withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    carried = [ts_col] + payload_cols
    left_cols = [c for c in left.columns]
    # Carried columns travel as ONE struct so `last(ignorenulls)` picks a
    # whole right ROW atomically: a matched right row with a legitimately
    # NULL payload value must still contribute that NULL (paired with its
    # own ts) rather than stitching the field from an older right row —
    # matching DuckDB ASOF semantics, which the oracle uses.
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in carried]
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in on and c != ts_col],
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("__p"),
    )
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols if c not in on and c != ts_col],
        F.lit(None).cast(payload_type).alias("__p"),
    )
    # Right rows sort before left rows at an equal timestamp => a right row
    # at exactly left.ts is visible to that left row (<=, resp. >=,
    # semantics).  Forward is the time-mirrored scan: descending order,
    # same running last-non-null.
    ts_order = (
        F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r_tagged.unionByName(l_tagged).select(
        "*",
        F.last("__p", ignorenulls=True).over(w).alias("__last"),
    )
    return merged.filter(F.col("__side") == 1).select(
        *on,
        ts_col,
        *[c for c in left_cols if c not in on and c != ts_col],
        *[F.col("__last")[c].alias(f"{c}{suffix}") for c in carried],
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join via time-bucket binning (start <= ts < end).

    Both sides gain a ``__bucket`` equi-key: a point belongs to exactly one
    bucket; an interval explodes to every bucket it overlaps (``sequence``
    over the truncated epoch range — bounded by interval-length /
    ``bucket_seconds``, so pick a width near the typical interval length).
    The equi-join on ``__bucket`` carries the residual range predicate;
    Catalyst evaluates it inside the join, so no candidate pair survives
    past its stage.  Output columns: all point columns + all interval
    columns (caller pre-projects to avoid name clashes).
    """
    b = F.lit(bucket_seconds)
    pt = points.withColumn(
        "__bucket", (F.unix_timestamp(F.col(point_ts)) / b).cast("long")
    )
    # Empty intervals match nothing; dropping them also keeps the bucket
    # `sequence` ascending (start > stop would generate a DESCENDING range).
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                # end is exclusive: a zero-length or bucket-aligned end
                # must not claim the next bucket.
                ((F.unix_timestamp(F.col(end_col)) - 1) / b).cast("long"),
            )
        ),
    )
    cond = (
        (pt["__bucket"] == iv["__bucket"])
        & (pt[point_ts] >= iv[start_col])
        & (pt[point_ts] < iv[end_col])
    )
    joined = pt.join(iv, cond, how)
    return joined.drop(pt["__bucket"]).drop(iv["__bucket"])
