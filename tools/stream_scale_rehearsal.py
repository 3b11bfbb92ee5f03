"""State-scale rehearsal for the stateful streaming sessionizer (r4 verdict #6).

``applyInPandasWithState`` keeps one state row per user in the executors'
state store — at 100x users, state size and wall clock are the risk, not
correctness.  This rehearsal replays the sf0.1 events table through the
SAME four-time-slice / availableNow / maxFilesPerTrigger=1 harness the
``streaming_sessionize`` oracle query uses, at 1x and 10x DISTINCT USERS
(copies get disjoint user_id ranges; each copy user replays the same event
timeline), and reports:

- wall ratio (target: linear-ish in event volume),
- ``numRowsTotal`` from the state operator's progress metrics — the
  measured state footprint, expected == distinct users at both scales
  (state is O(users), NOT O(events): the sessionizer folds each batch into
  a 4-field summary row per user),
- a correctness invariant: disjoint user copies => the 10x run must emit
  exactly 10x the sessions of the 1x run.

Eviction bound, MEASURED: a third run repeats the 10x-user replay with
``sessionize_stream(evict=True)`` — the watermark-driven event-time
timeout (tests/test_stateful_eviction.py) — and reports the final
``numRowsTotal`` and cumulative ``numRowsRemoved``.  Expected shape:
final state collapses to only the users still active within one gap of
the final watermark (measured: 15 000 -> 600 rows, 14 400 evicted), with
``evict_sessions_equal`` proving eviction changed no emitted session.

Run: ``python tools/stream_scale_rehearsal.py`` -> one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_user_copies(spark, src_dir: str, out_dir: str, n_copies: int) -> None:
    """Write the four time-sliced parquet files the sessionize harness
    expects, with ``n_copies`` disjoint user_id ranges."""
    from meerkat_abacus_spark.queries import _t

    events = _t(spark, src_dir, "events").select("event_id", "user_id", "ts")
    copies = [
        events.select(
            (F.col("event_id") + 10_000_000 * k).alias("event_id"),
            (F.col("user_id") + 1_000_000 * k).alias("user_id"),
            "ts",
        )
        for k in range(n_copies)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out = out.cache()
    bounds = out.selectExpr(
        "percentile_approx(ts, array(0.25, 0.5, 0.75), 10000) q"
    ).collect()[0]["q"]
    lo = [None] + list(bounds)
    hi = list(bounds) + [None]
    for i, (a, b) in enumerate(zip(lo, hi)):
        sl = out
        if a is not None:
            sl = sl.filter(F.col("ts") > F.lit(a))
        if b is not None:
            sl = sl.filter(F.col("ts") <= F.lit(b))
        sl.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/slice={i}")
        time.sleep(0.05)  # distinct mtimes -> deterministic file order
    out.unpersist()


def run_once(spark, label: str, n_copies: int, src: str,
             evict: bool = False) -> dict:
    from meerkat_abacus_spark.streaming.stateful import (
        latest_sessions,
        sessionize_stream,
    )

    base = tempfile.gettempdir() + f"/msa_stream_scale_{n_copies}x"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    build_user_copies(spark, src, base + "/src", n_copies)

    t0 = time.time()
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/src/slice=*")
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800, evict=evict)
        .writeStream.format("memory")
        .queryName(f"sess_{label}")
        .outputMode("update")
        .option("checkpointLocation", base + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.time() - t0, 2)
    progresses = [p["stateOperators"][0] for p in q.recentProgress
                  if p.get("stateOperators")]
    state_rows = max((p["numRowsTotal"] for p in progresses), default=None)
    final_state_rows = progresses[-1]["numRowsTotal"] if progresses else None
    rows_removed = sum(p.get("numRowsRemoved") or 0 for p in progresses)
    sessions = latest_sessions(spark.table(f"sess_{label}")).count()
    users = n_copies * 1500  # sf0.1 events carries 1500 distinct users
    shutil.rmtree(base, ignore_errors=True)
    out = {
        "sec": wall,
        "state_rows_total": state_rows,
        "distinct_users": users,
        "sessions": sessions,
    }
    if evict:
        out["final_state_rows"] = final_state_rows
        out["state_rows_removed"] = rows_removed
    return out




def build_event_copies_full(spark, src_dir: str, out_dir: str,
                            n_copies: int) -> int:
    """Four time-sliced files with ALL event columns and ``n_copies``
    disjoint event_id ranges; slice 1 additionally replays the 30 minutes
    before the mid split (within-watermark duplicates the dedup must
    suppress).  Returns the original (pre-replay) event count."""
    from meerkat_abacus_spark.queries import _t

    events = _t(spark, src_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    copies = [
        events.withColumn("event_id", F.col("event_id") + 10_000_000 * k)
        for k in range(n_copies)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out = out.cache()
    n_original = out.count()
    row = out.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).collect()[0]
    mid = row["mn"] + (row["mx"] - row["mn"]) // 2
    dup = out.filter(
        (F.unix_micros("ts") > mid - 1_800_000_000)
        & (F.unix_micros("ts") <= mid)
    )
    slices = [
        out.filter(F.unix_micros("ts") <= mid),
        out.filter(F.unix_micros("ts") > mid).unionByName(dup),
    ]
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/slice={i}")
        time.sleep(0.05)
    out.unpersist()
    return n_original


def run_dedup_once(spark, label: str, n_copies: int, src: str) -> dict:
    """Streaming dedup at ``n_copies``x event volume.  Unlike the
    sessionizer (state = one row per USER), dropDuplicatesWithinWatermark
    state is one row per KEY within the watermark horizon — so state_rows
    here is expected to track event volume until eviction catches up; the
    evidence is (a) emitted == original events (duplicates suppressed at
    every scale) and (b) wall linear-ish."""
    from meerkat_abacus_spark.streaming.dedup_stream import (
        run_dedup_over_files,
    )

    base = tempfile.gettempdir() + f"/msa_sdedup_scale_{n_copies}x"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    n_original = build_event_copies_full(spark, src, base + "/src", n_copies)

    t0 = time.time()
    emitted = run_dedup_over_files(
        spark, base + "/src", base + "/ckpt",
        queryName=f"sdedup_{label}",
    )
    n_emitted = emitted.count()
    wall = round(time.time() - t0, 2)
    shutil.rmtree(base, ignore_errors=True)
    return {
        "sec": wall,
        "events_original": n_original,
        "emitted": n_emitted,
        "dups_suppressed_ok": n_emitted == n_original,
    }


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def run_ijoin_once(
    spark,
    label: str,
    n_copies: int,
    src: str,
    provider: str = "hdfs",
    per_file_batches: bool = True,
) -> dict:
    """Stream-stream interval join at ``n_copies``x users (r5 verdict #8 —
    the one stateful path without committed state evidence).  Both sides
    buffer rows in the state store until the OTHER side's watermark passes
    the end of their match window, so the expected shape is: peak state
    tracks in-flight volume, ``numRowsRemoved`` shows watermark-driven
    eviction actually firing, and disjoint user copies make the joined
    output exactly ``n_copies``x the 1x run.

    Fixed-cost knobs (VERDICT r12 ask #7 — the leg pinned at ~19 s
    regardless of scale, micro-batch overhead-bound):

    - ``provider="rocksdb"`` swaps the state store for
      RocksDBStateStoreProvider (set for the query's lifetime via session
      conf, restored after; the checkpoint is fresh per run so the
      provider switch is safe) — the two-sided join keeps FOUR state
      stores per partition, and the HDFS-backed provider snapshots each
      per commit;
    - ``per_file_batches=False`` drops maxFilesPerTrigger so availableNow
      replays the backlog in ONE large micro-batch instead of one per
      file slice — fewer commits, same rows (the certified
      streaming_interval_join query keeps per-file slicing because
      straddling pairs across batch boundaries is exactly what it
      certifies).

    Per-batch maintenance time is recorded from the progress events so
    the fixed cost is attributed, not guessed."""
    from meerkat_abacus_spark.streaming.join_stream import interval_join_stream

    base = tempfile.gettempdir() + f"/msa_ijoin_scale_{n_copies}x"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    build_user_copies(spark, src, base + "/src", n_copies)

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(conf_key, None)
    if provider == "rocksdb":
        spark.conf.set(conf_key, _ROCKSDB_PROVIDER)
    try:
        t0 = time.time()
        reader = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp"
        )
        if per_file_batches:
            reader = reader.option("maxFilesPerTrigger", 1)
        stream = reader.parquet(base + "/src/slice=*")
        out = interval_join_stream(
            stream.filter(F.col("event_id") % 2 == 0),
            stream.filter(F.col("event_id") % 2 == 1),
        )
        q = (
            out.writeStream.format("memory")
            .queryName(f"ijoin_{label}")
            .outputMode("append")
            .option("checkpointLocation", base + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 2)
    finally:
        if provider == "rocksdb":
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
    batches = [p for p in q.recentProgress if p.get("stateOperators")]
    progresses = [p["stateOperators"][0] for p in batches]
    joined = spark.table(f"ijoin_{label}").count()
    shutil.rmtree(base, ignore_errors=True)
    return {
        "sec": wall,
        "provider": provider,
        "per_file_batches": per_file_batches,
        "n_batches": len(batches),
        "joined_rows": joined,
        "state_rows_peak": max(
            (p["numRowsTotal"] for p in progresses), default=None
        ),
        "final_state_rows": (
            progresses[-1]["numRowsTotal"] if progresses else None
        ),
        "state_rows_removed": sum(
            p.get("numRowsRemoved") or 0 for p in progresses
        ),
        # the fixed cost, attributed per batch: state commit + update +
        # removal walls in ms, straight from the progress events
        "per_batch_state_ms": [
            {
                "commit": p.get("commitTimeMs"),
                "updates": p.get("allUpdatesTimeMs"),
                "removals": p.get("allRemovalsTimeMs"),
            }
            for p in progresses
        ],
        "batch_durations_ms": [p.get("batchDuration") for p in batches],
    }


def run_ijoin_public(spark, label: str, n_copies: int, src: str) -> dict:
    """One-big-batch availableNow replay THROUGH THE PUBLIC API (VERDICT
    r13 ask #5): ``run_interval_join_over_files`` now defaults to
    ``max_files_per_trigger=None``, so this leg certifies that a user of
    the shipped streaming helper gets the measured one-big-batch cost
    (~8 s at 1x vs ~19 s per-file in STREAM_SCALE_r13) without touching
    reader internals."""
    from meerkat_abacus_spark.streaming.join_stream import (
        run_interval_join_over_files,
    )

    base = tempfile.gettempdir() + f"/msa_ijoin_pub_{n_copies}x"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    build_user_copies(spark, src, base + "/src", n_copies)
    t0 = time.time()
    joined = run_interval_join_over_files(
        spark, base + "/src/slice=*", base + "/ckpt",
        queryName=f"ijoin_pub_{label}",
    )
    n = joined.count()
    wall = round(time.time() - t0, 2)
    shutil.rmtree(base, ignore_errors=True)
    return {
        "sec": wall,
        "joined_rows": n,
        "api": "run_interval_join_over_files(default batching)",
        "per_file_batches": False,
    }


def main() -> None:
    from meerkat_abacus_spark.session import get_spark

    # Pre-touch the heap at startup (r17): keeps lazy heap-commit page
    # faulting (~165 MB/s on this VM) out of the first timed leg — see
    # tools/scale_rehearsal.py and OPTIMIZATION_r17.md.
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    spark = get_spark(app_name="stream_scale_rehearsal", extra_conf={
        "spark.driver.extraJavaOptions":
            f"-Xss64m -Xms{mem} -XX:+AlwaysPreTouch",
    })
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # Per-leg JIT warmup (VERDICT r9 ask #8): every leg runs 4 micro-
    # batches regardless of copies (maxFilesPerTrigger=1 over 4 slices),
    # so at 1x the wall is dominated by first-run codegen/JIT of that
    # leg's stateful operator — STREAM_SCALE_r09's ijoin measured 19.24 s
    # at 1x vs 16.81 s at 10x purely because the 10x run reused the
    # 1x run's JITed stream-stream join.  A discarded 1x warmup run per
    # leg makes both measured runs steady-state, so the 10x ratio
    # reflects data volume, not compilation order.
    run_once(spark, "warm", 1, src)
    one = run_once(spark, "one", 1, src)
    ten = run_once(spark, "ten", 10, src)
    ten_evict = run_once(spark, "ten_evict", 10, src, evict=True)
    run_dedup_once(spark, "warm", 1, src)
    d_one = run_dedup_once(spark, "one", 1, src)
    d_ten = run_dedup_once(spark, "ten", 10, src)
    run_ijoin_once(spark, "warm", 1, src)
    ij_one = run_ijoin_once(spark, "one", 1, src)
    ij_ten = run_ijoin_once(spark, "ten", 10, src)
    # VERDICT r12 ask #7: the fixed-cost variants — RocksDB state store
    # and the one-big-batch availableNow replay — measured at 1x (where
    # the fixed cost dominates) plus RocksDB at 10x for the ratio
    ij_one_rocks = run_ijoin_once(spark, "one_rocks", 1, src,
                                  provider="rocksdb")
    ij_ten_rocks = run_ijoin_once(spark, "ten_rocks", 10, src,
                                  provider="rocksdb")
    ij_one_coarse = run_ijoin_public(spark, "one_coarse", 1, src)
    report = {
        "1x_users": one,
        "10x_users": ten,
        "10x_users_evicting": ten_evict,
        "evict_sessions_equal": ten_evict["sessions"] == ten["sessions"],
        "wall_ratio_10x": round(ten["sec"] / one["sec"], 2) if one["sec"] else None,
        "state_rows_ratio_10x": (
            round(ten["state_rows_total"] / one["state_rows_total"], 2)
            if one["state_rows_total"]
            else None
        ),
        "sessions_exactly_10x": ten["sessions"] == 10 * one["sessions"],
        "dedup_1x": d_one,
        "dedup_10x": d_ten,
        "dedup_wall_ratio_10x": (
            round(d_ten["sec"] / d_one["sec"], 2) if d_one["sec"] else None
        ),
        "ijoin_1x": ij_one,
        "ijoin_10x": ij_ten,
        "ijoin_wall_ratio_10x": (
            round(ij_ten["sec"] / ij_one["sec"], 2) if ij_one["sec"] else None
        ),
        "ijoin_joined_exactly_10x": (
            ij_ten["joined_rows"] == 10 * ij_one["joined_rows"]
        ),
        "ijoin_eviction_fired": (ij_ten["state_rows_removed"] or 0) > 0,
        # VERDICT r9 ask #8, measured with per-leg warmup: the ijoin wall
        # is per-micro-batch OVERHEAD-bound at these volumes — 4 batches
        # of two-sided state-store maintenance across all shuffle
        # partitions cost ~3 s/batch regardless of rows, so joined rows
        # scale exactly 10x while wall stays ~flat.  The data term only
        # surfaces once per-batch rows rival the fixed state machinery;
        # the r9 1x>10x inversion on top of that was JIT compilation
        # order, removed by the warmup run.
        "ijoin_note": "wall is micro-batch-overhead-bound: "
                      "4 availableNow batches x ~3s two-sided state "
                      "maintenance dominates; rows scale 10x, wall flat",
        "ijoin_1x_rocksdb": ij_one_rocks,
        "ijoin_10x_rocksdb": ij_ten_rocks,
        "ijoin_1x_one_big_batch": ij_one_coarse,
        "ijoin_rocksdb_rows_equal": (
            ij_one_rocks["joined_rows"] == ij_one["joined_rows"]
            and ij_ten_rocks["joined_rows"] == ij_ten["joined_rows"]
        ),
        "ijoin_one_big_batch_rows_equal": (
            ij_one_coarse["joined_rows"] == ij_one["joined_rows"]
        ),
        "ijoin_rocksdb_wall_ratio_10x": (
            round(ij_ten_rocks["sec"] / ij_one_rocks["sec"], 2)
            if ij_one_rocks["sec"] else None
        ),
    }
    from _stamp import artifact_stamp  # noqa: E402

    report["artifact_commit"] = artifact_stamp()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
