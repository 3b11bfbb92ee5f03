"""Warehouse-shaped anchors: TPC-H-style joins/aggregations and the
delete+insert upsert contract (K2), incl. partition moves and skew salting."""

from __future__ import annotations

from meerkat_abacus_spark.functions.epi_week import (
    epi_week_columns,
    epi_week_duckdb_sql,
)
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ._shared import _proc_scratch_tag, _register, _scratch_tag, _t



# ---------------------------------------------------------------------------
# Bench anchor: TPC-H Q1-shaped pricing summary (pure scan + hash agg; the
# plan should be scan→partial agg→final agg with pushed filters).
# ---------------------------------------------------------------------------


@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY 1, 2
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )




# --- TPC-H Q3-shaped join anchor (A7 consumption pattern at fact scale) ----


@_register(
    "shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.to_date("o_orderdate") < F.lit("1995-03-15"))
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .filter(F.to_date("l_shipdate") > F.lit("1995-03-15"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey", "revenue", F.to_date("o_orderdate").alias("orderdate")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )




# --- TPC-H Q5-shaped multi-join (join-ordering / broadcast-selection anchor)


@_register(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY 1
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
            & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
        )
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        # supplier GROWS with scale factor (10k·SF rows): no broadcast hint —
        # an explicit F.broadcast is not demotable by AQE and becomes an
        # executor-OOM risk at 100×; AQE promotes the join to broadcast on
        # its own whenever the measured side is under the threshold.
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )




# ===========================================================================
# Round 2: K2 partition-pruned upsert idempotency, J4 link self-union,
# A2 weekly/hospital threshold alerts, A6 population rollup, dict-config
# to_date, J8 alert_data copy onto threshold masters.
# ===========================================================================

_UPS_Y_SQL, _UPS_W_SQL = epi_week_duckdb_sql("ts", "international")




@_register(
    "upsert_idempotent",
    f"""
    WITH e AS (
        SELECT event_id, event_type, {_UPS_W_SQL} AS epi_week, value
        FROM events
    ),
    corrected AS (
        SELECT event_id, event_type, epi_week, value * 2 AS value
        FROM e WHERE epi_week >= 4
    ),
    final AS (
        SELECT * FROM corrected
        UNION ALL
        SELECT * FROM e WHERE epi_week < 4
    )
    SELECT event_type, epi_week,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM final
    GROUP BY 1, 2
    """,
)
def upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 (write_to_db.py:40-49): delete+insert keyed (uuid, type) through
    the partition-pruned dynamic-overwrite sink.  The initial load is
    followed by a corrected re-submission of the epi_week>=4 slice — applied
    TWICE; the oracle models exactly-once application, so a hash match IS
    the idempotency proof.  Only the epi_week>=4 partitions rewrite (see
    tests/test_streaming_sinks.py::test_upsert_partition_pruned_rewrite for
    the file-level evidence)."""
    import shutil
    import tempfile

    from meerkat_abacus_spark.sinks.writers import upsert_by_key

    events = _t(spark, sf_dir, "events")
    _, epi_week = epi_week_columns("ts", "international")
    base = events.select(
        "event_id", "event_type", epi_week.alias("epi_week"), "value"
    )
    corrected = base.filter(F.col("epi_week") >= 4).withColumn(
        "value", F.col("value") * 2
    )

    path = tempfile.gettempdir() + f"/msa_upsert_{_proc_scratch_tag(sf_dir)}"
    shutil.rmtree(path, ignore_errors=True)
    keys = ["event_id", "event_type"]
    parts = ["event_type", "epi_week"]
    upsert_by_key(spark, base, path, keys=keys, partition_by=parts)
    upsert_by_key(spark, corrected, path, keys=keys, partition_by=parts)
    upsert_by_key(spark, corrected, path, keys=keys, partition_by=parts)

    return (
        spark.read.parquet(path)
        .groupBy("event_type", "epi_week")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )




@_register(
    "upsert_partition_move",
    f"""
    WITH e AS (
        SELECT event_id, event_type, {_UPS_W_SQL} AS epi_week, value
        FROM events
    ),
    final AS (
        SELECT event_id, event_type, epi_week + 1 AS epi_week, value * 2 AS value
        FROM e WHERE epi_week IN (3, 4)
        UNION ALL
        SELECT event_id, event_type, epi_week, value
        FROM e WHERE epi_week NOT IN (3, 4)
    )
    SELECT event_type, epi_week,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM final
    GROUP BY 1, 2
    """,
)
def upsert_partition_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 partition-MOVING correction (reference write_to_db.py:40-49 deletes
    by key regardless of partition): a correction shifts every epi_week 3/4
    row one week later — its (event_type, epi_week) PARTITION changes — and
    is applied TWICE.  The oracle models exactly-once application, so a hash
    match proves the stale versions were deleted from their old partitions
    (epi_week=3 vanishes entirely, exercising the emptied-partition-dir
    delete) and the replay added nothing."""
    import shutil
    import tempfile

    from meerkat_abacus_spark.sinks.writers import upsert_by_key

    events = _t(spark, sf_dir, "events")
    _, epi_week = epi_week_columns("ts", "international")
    base = events.select(
        "event_id", "event_type", epi_week.alias("epi_week"), "value"
    )
    corrected = (
        base.filter(F.col("epi_week").isin(3, 4))
        .withColumn("epi_week", F.col("epi_week") + 1)
        .withColumn("value", F.col("value") * 2)
    )

    path = tempfile.gettempdir() + f"/msa_upsmove_{_proc_scratch_tag(sf_dir)}"
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(path + ".staging", ignore_errors=True)
    keys = ["event_id", "event_type"]
    parts = ["event_type", "epi_week"]
    upsert_by_key(spark, base, path, keys=keys, partition_by=parts)
    upsert_by_key(spark, corrected, path, keys=keys, partition_by=parts)
    upsert_by_key(spark, corrected, path, keys=keys, partition_by=parts)

    return (
        spark.read.parquet(path)
        .groupBy("event_type", "epi_week")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )




@_register(
    "skew_salted_agg",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (functions/skew.py) must equal the plain
    groupBy — the salt only bounds per-task fan-in (no task sees more than
    ~1/B of a hot key), it cannot change algebraic results.  event_type is
    the engine's canonical hot key (a national outbreak = one event_type
    dominating the stream)."""
    from meerkat_abacus_spark.functions.skew import salted_count, salted_sum

    events = _t(spark, sf_dir, "events")
    counts = salted_count(
        events, ["event_type"], salt_buckets=16, salt_on=F.col("event_id")
    ).withColumnRenamed("count", "n")
    sums = salted_sum(
        events, ["event_type"], "value", salt_buckets=16,
        salt_on=F.col("event_id"),
    )
    return counts.join(sums, "event_type").select(
        "event_type", "n", F.round("sum", 2).alias("sum_value")
    )


# ---------------------------------------------------------------------------
# Multi-granularity reporting: ROLLUP subtotals and a rolling epi-curve.
# ---------------------------------------------------------------------------


@_register(
    "cases_rollup",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS lvl,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def cases_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region → nation ROLLUP of urgent orders: per-nation rows, per-region
    subtotals, and the grand total in ONE pass — the multi-granularity
    report the reference's per-level aggregation API answers with one
    round-trip per level (SURVEY §2.7 aggregation surface).

    Scale shape: Catalyst plans rollup as Expand (3 rows per input row,
    one per grouping set) feeding a single partial→final hash aggregate —
    one shuffle total, vs three separate groupBy jobs re-scanning 100 TB
    each.  The grouping-level bitmask (lvl) disambiguates subtotal rows
    from genuine NULL keys."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # customer is SF-growing: no broadcast hint (AQE promotes when small);
    # nation/region are bounded dims and keep theirs.
    enriched = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        enriched.rollup(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .select("region", "nation", "lvl", "n_orders", "total_value")
    )


@_register(
    "epi_curve_rolling",
    """
    WITH daily AS (
        SELECT r.r_name AS region, CAST(o.o_orderdate AS DATE) AS day,
               COUNT(*) AS n
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY 1, 2
    )
    SELECT region, day, n,
           ROUND(AVG(n) OVER (PARTITION BY region ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 3)
               AS avg7
    FROM daily
    WHERE region = 'ASIA'
    """,
)
def epi_curve_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling mean of daily urgent-case counts per region — the
    epi-curve smoothing every surveillance dashboard draws over the
    reference's daily aggregates.  RANGE framing over the calendar (not
    ROWS) so gaps in the date series shrink the window instead of
    reaching back past 7 days.

    Scale shape: the daily pre-aggregation collapses the fact table to
    |regions|×|days| rows BEFORE the window sort, so the window's
    per-partition sort runs over a few thousand rows regardless of fact
    cardinality; the dimension chain broadcasts."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # customer is SF-growing: no broadcast hint (AQE promotes when small).
    daily = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("region")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return daily.filter(F.col("region") == "ASIA").select(
        "region", "day", "n", F.round(F.avg("n").over(w), 3).alias("avg7")
    )


# ---------------------------------------------------------------------------
# Snapshot reconciliation (CDC-shaped): what changed between two loads?
# ---------------------------------------------------------------------------


@_register(
    "snapshot_diff",
    """
    WITH old AS (
        SELECT o_orderkey AS k, md5(o_orderstatus || '|' ||
               CAST(ROUND(o_totalprice, 2) AS VARCHAR)) AS h
        FROM orders WHERE o_orderkey % 10 <> 0
    ),
    new AS (
        SELECT o_orderkey AS k,
               md5((CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                    ELSE o_orderstatus END) || '|' ||
               CAST(ROUND(o_totalprice, 2) AS VARCHAR)) AS h
        FROM orders WHERE o_orderkey % 10 <> 1
    )
    SELECT CASE WHEN o.k IS NULL THEN 'added'
                WHEN n.k IS NULL THEN 'removed'
                WHEN o.h <> n.h THEN 'changed'
                ELSE 'unchanged' END AS status,
           COUNT(*) AS n
    FROM old o FULL OUTER JOIN new n ON o.k = n.k
    GROUP BY 1
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two table snapshots into added/removed/changed/unchanged
    row classes — the CDC-shaped audit every periodic 100 TB reload needs
    before swapping a partition in (two synthetic snapshots are carved
    from orders: every 10th key dropped on one side, every 7th status
    mutated).

    Scale shape: rows collapse to (key, row-hash) BEFORE the full outer
    join, so the one co-partitioned shuffle carries ~48 bytes/row
    regardless of row width; the class counts ride a partial-aggregated
    groupBy on top."""
    orders = _t(spark, sf_dir, "orders")

    def snap(mutate: bool) -> DataFrame:
        status = (
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            )
            if mutate
            else F.col("o_orderstatus")
        )
        keep = (
            (F.col("o_orderkey") % 10 != 1)
            if mutate
            else (F.col("o_orderkey") % 10 != 0)
        )
        return orders.filter(keep).select(
            F.col("o_orderkey").alias("k"),
            F.md5(
                F.concat_ws(
                    "|",
                    status,
                    F.round(F.col("o_totalprice"), 2).cast("string"),
                )
            ).alias("h"),
        )

    old, new = snap(False), snap(True)
    joined = old.alias("o").join(
        new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    )
    status = (
        F.when(F.col("o.k").isNull(), "added")
        .when(F.col("n.k").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Semi-structured extraction: typed JSON parsing of the props column.
# ---------------------------------------------------------------------------


@_register(
    "json_props_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) >= 50
    GROUP BY 1
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured ``props`` JSON column —
    log/event pipelines carry most of their payload this way, and the
    engine must project it into typed columns without a Python row loop.

    Uses ``from_json`` with an explicit schema (single parse per row,
    JVM-side, codegen'd) rather than repeated ``get_json_object`` calls —
    one parse serves every extracted field, and the typed struct lets the
    filter and aggregate stay in Tungsten.  At 100 TB the schema is
    mandatory anyway: inference would be a second full scan."""
    events = _t(spark, sf_dir, "events")
    parsed = events.withColumn(
        "p", F.from_json(F.col("props"), "k int")
    )
    return (
        parsed.filter(F.col("p.k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p.k").cast("bigint").alias("sum_k"),
            F.max("p.k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# CSV source round-trip: the reference's S1 ingestion shape (all-string CSV,
# cast downstream), proven lossless against the parquet aggregate.
# ---------------------------------------------------------------------------


@_register(
    "csv_source_roundtrip",
    """
    SELECT event_type, COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k
    FROM events GROUP BY 1
    """,
)
def csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events as CSV, read back ALL-STRING (the reference's S1
    contract: ODK exports arrive as strings, typing happens downstream —
    consumer/get_data.py:65-79), cast, aggregate: must hash-equal the
    parquet aggregate, proving the string round-trip loses nothing
    (timestamps, floats, embedded JSON with quotes).

    Scale shape: header CSV without embedded newlines stays line-split­table,
    so the read parallelizes like any text source; the all-string schema
    makes the scan a single pass with casts in codegen."""
    import tempfile

    from ._shared import _scratch_ready, build_shared_scratch

    events = _t(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        # LOSSLESS double serialization (Java Double.toString round-trips
        # exactly) — format_number's 6-dp HALF_EVEN rounding drifts per row
        # and can flip the 2-dp ROUND boundary vs the oracle's raw-double
        # sum at larger scale factors.
        F.col("value").cast("string").alias("value"),
        "props",
    )
    path = tempfile.gettempdir() + f"/msa_csv_v2_{_scratch_tag(sf_dir)}"
    # shared across processes: gate the overwrite behind the build lock so
    # two concurrent verification runs can't interleave writes (the ready
    # re-check under the lock makes the second caller a reader)
    build_shared_scratch(
        path,
        lambda: _scratch_ready(path),
        lambda: events.write.mode("overwrite").option("header", "true").csv(path),
    )
    back = spark.read.schema(
        "event_id string, ts string, user_id string, event_type string, "
        "value string, props string"
    ).option("header", "true").csv(path)
    typed = back.select(
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.from_json("props", "k int").alias("p"),
    )
    return typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.sum("p.k").cast("bigint").alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q8-shaped market share: the 8-table optimizer workout.
# ---------------------------------------------------------------------------


@_register(
    "market_share",
    """
    WITH flat AS (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'MEDIUM'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'BRAZIL' THEN volume
                     ELSE 0 END), 2) AS nation_volume,
           ROUND(SUM(volume), 2) AS total_volume,
           ROUND(ROUND(SUM(CASE WHEN supp_nation = 'BRAZIL' THEN volume
                     ELSE 0 END), 2) / ROUND(SUM(volume), 2), 4)
               AS mkt_share
    FROM flat GROUP BY 1
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: one nation's fraction of yearly trade
    volume inside a region — an 8-table join tree (fact + two dim chains
    that both pass through nation) that exercises join reordering,
    broadcast selection, and conditional aggregation in one plan.

    Scale shape: fixed-cardinality dimensions (both nation legs, region)
    broadcast explicitly; part and supplier GROW with scale factor
    (200k·SF / 10k·SF rows), so their joins carry NO hint — an explicit
    F.broadcast is not demotable by AQE, which at 100× turns it into an
    executor-OOM risk, whereas unhinted AQE still promotes them to
    broadcast whenever the measured (filtered) side is small.
    lineitem⋈orders and ⋈customer are fact-to-fact and stay shuffle
    joins on their keys.  The ratio divides the two ROUNDED sums so the
    cross-engine hash cannot flip on summation order."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "MEDIUM")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.alias("n1")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    flat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "supp_nation",
        )
    )
    agg = flat.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "BRAZIL", F.col("volume"))
                .otherwise(0.0)
            ),
            2,
        ).alias("nation_volume"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 4).alias(
            "mkt_share"
        ),
    )


# ---------------------------------------------------------------------------
# Retention cohorts: the month-grid activity matrix.
# ---------------------------------------------------------------------------


@_register(
    "retention_cohorts",
    """
    WITH firsts AS (
        SELECT o_custkey,
               MIN(date_trunc('month', o_orderdate)) AS cohort
        FROM orders GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT o_custkey,
               date_trunc('month', o_orderdate) AS m
        FROM orders
    )
    SELECT CAST(f.cohort AS DATE) AS cohort,
           (EXTRACT(year FROM a.m) * 12 + EXTRACT(month FROM a.m))
           - (EXTRACT(year FROM f.cohort) * 12 + EXTRACT(month FROM f.cohort))
               AS months_since,
           COUNT(*) AS n_active
    FROM activity a JOIN firsts f USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by first-activity month,
    counted in each subsequent month they stayed active — the
    repeat-attendance / patient-return analysis over the reference's
    visit data, and the canonical activity-grid aggregation.

    Scale shape: both legs collapse the fact table first (per-customer
    min month; distinct customer×month), then join on customer — the
    joined frame is |customers|×|active months|, far smaller than the
    fact.  Month arithmetic is integer (year*12+month), identical in
    both engines — no date-diff convention drift."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    )
    firsts = orders.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    activity = orders.distinct()
    midx = lambda c: F.year(c) * 12 + F.month(c)
    return (
        activity.join(firsts, "o_custkey")
        .groupBy(
            F.col("cohort").cast("date").alias("cohort"),
            (midx(F.col("m")) - midx(F.col("cohort"))).alias("months_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# ---------------------------------------------------------------------------
# CUBE report: all 2^k grouping-set margins in one pass (rollup's sibling —
# cases_rollup covers the hierarchical subtotals, this the full lattice).
# ---------------------------------------------------------------------------


@_register(
    "cube_report",
    """
    SELECT r.r_name AS region, o.o_orderpriority AS priority,
           GROUPING_ID(r.r_name, o.o_orderpriority) AS lvl,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE(r.r_name, o.o_orderpriority)
    """,
)
def cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region x order-priority CUBE: per-cell counts, both one-dimension
    margins, and the grand total in ONE pass — the full grouping-set
    lattice a dashboard's drill-anywhere view reads.

    Scale shape: Catalyst plans cube as Expand (4 rows per input, one per
    grouping set) into a single partial->final hash aggregate — one
    shuffle for all 2^k margins, vs 4 jobs re-scanning the fact.  The
    grouping-id bitmask (lvl) disambiguates margin rows from genuine NULL
    keys; customer is SF-growing so its join is unhinted (AQE decides)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    enriched = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        enriched.cube(
            F.col("r_name").alias("region"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .select("region", "priority", "lvl", "n_orders", "total_value")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10-shaped returned-item revenue: top customers by refund exposure.
# ---------------------------------------------------------------------------


@_register(
    "returned_item_revenue",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue on returned items in one quarter
    (TPC-H Q10 shape) — the refund-exposure report.

    Scale shape: the date filter pushes into the orders scan and the
    returnflag filter into the lineitem scan BEFORE the fact-fact join;
    both fact joins are unhinted (AQE: broadcast while the filtered
    quarter is small, shuffle at 100x); nation broadcasts; the top-20 is
    TakeOrderedAndProject on the aggregated rows.

    Revenue sums in DECIMAL, not double: this query hit a real case of a
    per-customer sum landing EXACTLY on a 2-dp half boundary, where float
    summation-order noise flips the rounded cent between engines — exact
    decimal arithmetic removes the noise instead of hoping rounding hides
    it (the right call for money columns at any scale)."""
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy(
            "c_custkey", "c_name", F.col("n_name").alias("nation")
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Unpivot (melt): wide aggregate -> long (measure, value) rows — the export
# reshaping the reference's per-level report tables imply (SURVEY §2.7).
# ---------------------------------------------------------------------------


@_register(
    "unpivot_report",
    """
    WITH agg AS (
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_discount), 2) AS sum_disc
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS total FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
    """,
)
def unpivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-returnflag totals melted to long (measure, total) rows via
    the native unpivot operator — the tidy-format reshape feeding exports
    and charting, without a per-measure re-scan.

    Scale shape: the fact collapses in ONE partial-aggregated groupBy
    (3 rows out); unpivot is then a projection-time Expand over those
    rows — the oracle's UNION-ALL-of-selects form would re-read the
    aggregate 3 times without a CTE, which is exactly what unpivot
    avoids at scale."""
    lineitem = _t(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "total",
    )


# ---------------------------------------------------------------------------
# ORC source round-trip: the third serialization leg of S1 (CSV and JSONL
# round-trips cover the text formats; ORC is the columnar alternative a
# Hive-era lake hands this engine).
# ---------------------------------------------------------------------------


@_register(
    "orc_source_roundtrip",
    """
    SELECT event_type, COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k
    FROM events GROUP BY 1
    """,
)
def orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events as ORC, read back, aggregate: must hash-equal the
    parquet aggregate, proving the columnar round-trip preserves
    timestamps, doubles and embedded JSON exactly (no string casts needed
    — ORC is typed, unlike the CSV leg's all-string contract).

    Scale shape: ORC scans split on stripes like parquet row groups, the
    read carries the same column pruning and predicate pushdown, and the
    aggregate is the identical partial->final hash agg — the oracle runs
    on the original parquet, so the hash match certifies the format hop
    end to end."""
    import tempfile

    from ._shared import _scratch_ready, _scratch_tag, build_shared_scratch

    events = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    path = tempfile.gettempdir() + f"/msa_orc_v1_{_scratch_tag(sf_dir)}"
    build_shared_scratch(
        path,
        lambda: _scratch_ready(path),
        lambda: events.write.mode("overwrite").orc(path),
    )
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.sum(F.get_json_object("props", "$.k").cast("int"))
        .cast("bigint")
        .alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# r7 additions: TPC-H Q2-shaped argmin join, ROLLUP hierarchy lattice,
# market-basket pair mining.
# ---------------------------------------------------------------------------


@_register(
    "min_cost_supplier",
    """
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS min_unit
        FROM lineitem GROUP BY 1, 2
    ),
    best AS (
        SELECT l_partkey, MIN(min_unit) AS best_unit FROM unit GROUP BY 1
    )
    SELECT p.p_partkey AS partkey, s.s_name AS supplier,
           n.n_name AS nation, u.min_unit AS unit_cost
    FROM unit u
    JOIN best b ON u.l_partkey = b.l_partkey AND u.min_unit = b.best_unit
    JOIN part p ON p.p_partkey = u.l_partkey
    JOIN supplier s ON s.s_suppkey = u.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_type = 'MEDIUM' AND r.r_name = 'ASIA'
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each MEDIUM part, every ASIA supplier whose
    best unit price EQUALS the part's global minimum — the correlated-min
    subquery pattern, decorrelated into aggregate + equi-join (what a
    Q2-style EXISTS/scalar subquery also plans to after Catalyst's
    subquery rewrite, written directly).

    Scale shape: both aggregations partial-combine map-side to one row
    per (part, supplier) / per part before their shuffles; the argmin
    re-join is co-partitioned on l_partkey with the aggregate that
    produced it (exchange reuse); part/supplier/nation/region are
    unhinted — nation/region are fixture-constant (AQE broadcasts them),
    part and supplier GROW with SF so an explicit non-demotable hint
    would be an OOM risk at 100×.  The float equality is safe: both
    sides are MINs over the same exact division results, so the doubles
    are bit-identical by construction.  Ties (several suppliers at the
    minimum) emit every winner — deterministic output set, no arbitrary
    pick.  unit_cost is deliberately NOT engine-rounded: Spark and DuckDB
    disagree on ROUND for near-midpoint doubles (observed:
    120.88499999999999 at 2dp), while the raw doubles are bit-identical;
    the compare harness's uniform normalization handles display."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "MEDIUM")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit")
    )
    # best derives FROM unit: rename its columns so the self-referencing
    # join cannot resolve both sides to the same attribute (Spark warns
    # "trivially true equals predicate" and silently drops the key
    # condition otherwise).
    best = (
        unit.groupBy("l_partkey")
        .agg(F.min("min_unit").alias("best_unit"))
        .select(F.col("l_partkey").alias("__best_pk"), "best_unit")
    )
    return (
        unit.join(
            best,
            (unit.l_partkey == F.col("__best_pk"))
            & (unit.min_unit == F.col("best_unit")),
        )
        .drop("__best_pk")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            F.col("min_unit").alias("unit_cost"),
        )
    )


@_register(
    "rollup_report",
    """
    SELECT COALESCE(r.r_name, 'ALL') AS region,
           COALESCE(n.n_name, 'ALL') AS nation,
           GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS gid,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (region → nation → grand total) with
    grouping_id disambiguation — the drill-down lattice complementing
    cube_report's full lattice: |nations| + |regions| + 1 output rows.

    Scale shape: Spark expands the rollup into one Expand + single
    aggregate — the fact shuffles once for all three grouping levels,
    partial aggregation collapses each level map-side; nation/region
    broadcast by AQE (fixture-constant), customer unhinted (grows with
    SF)."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).join(region, nation.n_regionkey == region.r_regionkey)
    agg = joined.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_customers"),
        # Balance sums in DECIMAL, not double (advisor r8): a half-cent
        # boundary double-sum can flip the rounded cent with summation
        # order; the decimal sum is exact and order-independent (the
        # returned_item_revenue pattern).
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_balance"),
    )
    return agg.select(
        F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
        F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
        "gid",
        "n_customers",
        "total_balance",
    )


@_register(
    "basket_pairs",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    sized AS (
        SELECT l_orderkey FROM items GROUP BY 1 HAVING COUNT(*) <= 20
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        JOIN sized s ON s.l_orderkey = a.l_orderkey
    )
    SELECT part_a, part_b, COUNT(*) AS n_orders
    FROM pairs GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: top-50 part pairs co-occurring in the
    same order — the frequent-itemset primitive of recommendation /
    co-click pipelines.

    Scale shape: the pairwise term is BLOCK-BOUNDED exactly like the LSH
    dedup joins — pairs are generated only inside one order, and the
    basket-size guard (orders with > 20 distinct parts are dropped, the
    standard cap in co-occurrence mining) is applied as a SEMI-JOIN on
    ``items`` BEFORE the pairwise self-join (VERDICT r10 ask #2: the
    previous guard-after-join plan executed the a × b self-join first, so
    one hot basket with 10^5 distinct items — routine at 100 TB — would
    generate ~5×10^9 pairs only to drop them; pre-filtering both join
    inputs is the same pre-join cap discipline as
    dedup.py's minhash_lsh_candidates).  The self-join is co-partitioned
    on l_orderkey, the pair count partial-aggregates map-side, and the
    final top-50 is TakeOrderedAndProject (per-partition heads, no global
    sort)."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        items.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= 20)
        .select("l_orderkey")
    )
    # pre-join cap: only items from <=20-part baskets enter the self-join
    guarded = items.join(sized, "l_orderkey", "left_semi")
    a = guarded.alias("a")
    b = guarded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


@_register(
    "order_activity_sets",
    """
    WITH y96 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1996
    ),
    y97 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1997
    )
    SELECT 'retained' AS segment, COUNT(*) AS n_customers
    FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
    UNION ALL
    SELECT 'lapsed', COUNT(*)
    FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    UNION ALL
    SELECT 'new', COUNT(*)
    FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
    """,
)
def order_activity_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer retention segments via relational set operators: INTERSECT
    (retained 1996∩1997), EXCEPT (lapsed / newly active) — the set-algebra
    coverage the reference never had (its only set op is envelope UNION).

    Scale shape: Spark compiles INTERSECT/EXCEPT to distinct + left-semi /
    left-anti hash joins over the two year slices — both sides collapse to
    distinct customer keys (partial-agg) before any join, the year
    predicates push to the orders scan, and each COUNT is a one-row
    aggregate; no full-width fact ever shuffles.  Note the plan re-scans
    orders per set-op branch (Catalyst does not share subtrees): when the
    SEGMENTS are the goal rather than the set-operator semantics, the
    one-scan form is a per-custkey flag aggregate
    (``max(year=1996) AS has96, max(year=1997) AS has97`` → CASE) — this
    query deliberately pins the operator semantics instead."""
    orders = _t(spark, sf_dir, "orders")
    y96 = (
        orders.filter(F.year(F.to_date("o_orderdate")) == 1996)
        .select("o_custkey")
        .distinct()
    )
    y97 = (
        orders.filter(F.year(F.to_date("o_orderdate")) == 1997)
        .select("o_custkey")
        .distinct()
    )
    segs = [
        ("retained", y96.intersect(y97)),
        ("lapsed", y96.exceptAll(y97)),
        ("new", y97.exceptAll(y96)),
    ]
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_customers")).select(
            F.lit(name).alias("segment"), "n_customers"
        )
        for name, df in segs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@_register(
    "small_quantity_revenue",
    """
    WITH pagg AS (
        SELECT l_partkey, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2)
                AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pagg a ON a.l_partkey = l.l_partkey
    WHERE p.p_type = 'MEDIUM'
      AND 5 * l.l_quantity * a.cnt < a.sum_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-20%-of-average-quantity orders
    of MEDIUM parts — the correlated AGGREGATE subquery
    (l_quantity < 0.2 * avg per part), decorrelated into a per-part
    aggregate + co-partitioned self-join, which is exactly what Catalyst's
    subquery rewrite produces for the correlated form.

    Scale shape: the per-part average partial-aggregates map-side to one
    row per part before its shuffle; the re-join runs on l_partkey — the
    same key the aggregate shuffled on (exchange reuse), deliberately
    unhinted (part count grows with SF); the final global aggregate is a
    one-row reduce.  The threshold predicate is EXACT by construction:
    ``q < 0.2·avg`` is cross-multiplied to ``5·q·cnt < sum`` and
    l_quantity is integer-valued, so the per-part SUM is an exactly
    representable integer double — order-independent across engines —
    where an AVG-of-doubles comparison would retain an ulp-boundary flip
    risk from summation order.

    Output contract note (ADVICE r8 #4): since r8, ``avg_yearly`` is
    ``round(decimal_sum, 2) / 7.0`` — an UNROUNDED double quotient —
    rather than the pre-r8 ``ROUND(sum / 7.0, 2)``.  Deliberate: rounding
    the DECIMAL sum (exact in both engines) and then performing one IEEE
    division gives bit-identical cross-engine results, whereas rounding
    the quotient reintroduces the near-midpoint flip the r8 change
    removed.  Consumers wanting 2-dp display should round at the edge."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "MEDIUM")
    pagg = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pagg, li.l_partkey == F.col("__pk"))
        .filter(
            5 * F.col("l_quantity") * F.col("cnt") < F.col("sum_qty")
        )
        .agg(
            # Sum exactly in DECIMAL, round THERE, then one double
            # division by 7 (advisor r8): identical decimal sums give
            # identical division bits in both engines, whereas
            # ROUND(double_sum / 7.0) stacks order-dependent summation on
            # a near-midpoint rounding flip.
            (
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2
                ).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "revenue_growth",
    """
    WITH monthly AS (
        SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS y,
               EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS m,
               ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS rev
        FROM orders GROUP BY 1, 2
    )
    SELECT y, m, CAST(rev AS DOUBLE) AS revenue,
           CAST(rev - LAG(rev) OVER (ORDER BY y, m) AS DOUBLE) AS delta
    FROM monthly
    """,
)
def revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue delta: LAG over the PRE-AGGREGATED monthly
    frame — the trend primitive of every ops dashboard.

    Scale shape: the fact collapses to |months| rows via one
    partial-aggregated groupBy BEFORE the window; the unpartitioned
    ORDER BY window then runs over dozens of rows, not the fact (the
    single-partition window is only safe because the frame is
    aggregate-sized — the anti-pattern is windowing the raw fact).  The
    monthly sum runs in DECIMAL (advisor r8: a double sum can flip the
    rounded cent with summation order) and the delta subtracts the two
    exact decimals BEFORE the cast to double, so the cross-engine hash
    cannot flip."""
    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            F.year(F.to_date("o_orderdate")).alias("y"),
            F.month(F.to_date("o_orderdate")).alias("m"),
            "o_totalprice",
        )
        .groupBy("y", "m")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2
            ).alias("rev")
        )
    )
    # Constant partition key (VERDICT r9 ask #7): |months| rows
    # post-aggregation — single-partition by design.  A bare literal gets
    # folded out by EliminateWindowPartitions (restoring the per-sweep
    # WindowExec WARN), so the key is the sign bit of the year: constant
    # 0 by construction, opaque to constant folding, identical cost.
    w = Window.partitionBy(F.shiftright(F.col("y"), 63)).orderBy("y", "m")
    return monthly.select(
        "y",
        "m",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - F.lag("rev").over(w)).cast("double").alias("delta"),
    )


@_register(
    "customer_value_quartiles",
    """
    WITH ranked AS (
        SELECT n.n_name AS nation, c.c_custkey,
               NTILE(4) OVER (PARTITION BY n.n_name
                              ORDER BY c.c_acctbal DESC, c.c_custkey) AS q
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT nation, q, COUNT(*) AS n_customers
    FROM ranked GROUP BY 1, 2
    """,
)
def customer_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation account-balance quartile assignment (NTILE) collapsed
    to segment counts — the cohorting primitive behind tiered-service
    reports.

    Scale shape: one window per nation (the same Exchange a groupBy on
    nation would pay) with a fully deterministic order (balance DESC,
    custkey tiebreak — NTILE boundaries are order-sensitive, so an
    under-specified sort would flip assignments across engines); the
    aggregate partial-combines to |nations|×4 rows."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    ranked = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "c_custkey", "c_acctbal")
        .withColumn("q", F.ntile(4).over(
            Window.partitionBy("nation").orderBy(
                F.col("c_acctbal").desc(), F.col("c_custkey")
            )
        ))
    )
    return ranked.groupBy("nation", "q").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
