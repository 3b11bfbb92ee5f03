"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch form (queries.py ``event_sessionize``) is two windows + a groupBy;
this is the STREAMING form the brief's "custom stateful operators" bullet
calls for: per-user session state lives in the state store, micro-batches
extend or close sessions as events arrive, and a session that spans many
micro-batches is stitched by state — not by re-reading history.

Semantics pinned to the batch query (and its DuckDB oracle):

- a gap strictly greater than ``gap_us`` microseconds closes the session;
- ``session_seq`` numbers a user's sessions 1..n in time order;
- ``duration_s`` is ``floor(last_epoch_s) - floor(first_epoch_s)`` (the
  batch form's ``cast(ts as long)`` difference).

Emission protocol (output mode ``update``): every batch that touches a
session emits its current snapshot ``(user_id, session_seq, n_events,
duration_s)``.  ``n_events`` is strictly monotone within a session, so the
final state of each session is exactly the emission with the largest
``n_events`` — ``latest_sessions`` dedupes on that, making the streaming
result comparable (hash-equal) to the batch result without waiting for
timeouts to flush open sessions.

Ordering contract: the source must deliver each user's events in
non-decreasing event-time order ACROSS micro-batches (within a batch the
operator sorts).  A file-drop source of time-sliced files satisfies this;
for out-of-order sources put a watermark + sort buffer (or the built-in
``session_window``) in front.  This matches the reference's model where
corrections arrive as re-submissions through the idempotent upsert, not as
out-of-order raw events.

Scale: state is O(active users) x one open session each; each micro-batch
shuffles only its own rows (hash on user_id); Arrow batches carry the
per-group pandas frames.  At 100 TB / 1000 executors the state store
partitions with the shuffle — no global structure.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_seq long, n_events long, duration_s long"
)
STATE_SCHEMA = "session_seq long, start_us long, last_us long, n long"


def _session_func(gap_us: int, evict: bool = False):
    """Build the per-group stateful function (gap in microseconds).

    With ``evict=True`` the function arms an EVENT-TIME timeout at
    ``last_event + gap`` after every batch: once the watermark passes that
    point no event can extend the session (anything later would start a
    new one), so the state row is dead weight and ``state.remove()`` drops
    it.  Nothing needs to be emitted on timeout — update mode already
    emitted the session's final snapshot when its last event arrived.
    This is the bound that keeps the store at O(users active within one
    gap of the watermark) instead of O(all users ever seen).

    Session identity differs by design: dense per-user numbering (1..n)
    requires remembering how many sessions a user ever had — exactly the
    unbounded state eviction removes (a returning user would restart at 1
    and collide).  So with ``evict=True`` the emitted ``session_seq`` is
    the session's START MICROSECOND timestamp: unique per (user, session),
    stable across evictions, and order-preserving — the id an evictable
    operator can actually guarantee."""

    def func(
        key: tuple,
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if evict and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            seq, start_us, last_us, n = state.get
        else:
            seq, start_us, last_us, n = 0, None, None, 0

        touched: dict[int, tuple[int, int, int]] = {}
        # A hot key whose micro-batch exceeds the Arrow batch size arrives
        # as MULTIPLE pandas chunks in arbitrary inter-chunk order, so the
        # "within a batch the operator sorts" contract requires collecting
        # every chunk for the key FIRST and sorting once — sorting each
        # chunk independently would interleave sessions for hot keys.
        frames = [pdf for pdf in pdf_iter if not pdf.empty]
        if frames:
            pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            # datetime64[ns] -> integer microseconds
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            for t in ts_us:
                if last_us is None or t - last_us > gap_us:
                    seq = int(t) if evict else seq + 1
                    start_us, n = int(t), 0
                last_us = int(t)
                n += 1
                touched[seq] = (start_us, last_us, n)

        state.update((seq, start_us, last_us, n))
        if evict and last_us is not None:
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if touched:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(touched),
                    "session_seq": list(touched),
                    "n_events": [v[2] for v in touched.values()],
                    "duration_s": [
                        v[1] // 1_000_000 - v[0] // 1_000_000
                        for v in touched.values()
                    ],
                }
            )

    return func


def sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    evict: bool = False,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Attach the stateful sessionizer to a streaming events DataFrame
    (columns: user_id, ts, event_id).  Returns the update-mode emission
    stream; pipe through ``latest_sessions`` after collection.

    ``evict=True`` is the production state-bound: a watermark (lagging
    event time by ``watermark_delay``) drives an event-time timeout that
    removes a user's state once no event could extend their open session
    (watermark > last_event + gap).  The oracle-parity harness runs with
    ``evict=False`` because it replays history where the watermark would
    race ahead of per-user timelines; the rehearsal + eviction test cover
    the bounded mode (STREAM_SCALE_r05.json measures the unbounded
    footprint this eviction caps)."""
    if evict:
        stream = events_stream.withWatermark("ts", watermark_delay)
        return stream.groupBy("user_id").applyInPandasWithState(
            _session_func(gap_seconds * 1_000_000, evict=True),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_seconds * 1_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_sessions(emissions: DataFrame) -> DataFrame:
    """Collapse update-mode emissions to each session's final snapshot.

    ``n_events`` grows strictly within a session, so ``max(n_events)`` per
    (user_id, session_seq) identifies the final emission; ``duration_s``
    rides along via ``max_by``-free aggregation because duration is also
    monotone (last_us only advances)."""
    from pyspark.sql import functions as F

    return emissions.groupBy("user_id", "session_seq").agg(
        F.max("n_events").alias("n_events"),
        F.max("duration_s").alias("duration_s"),
    )


def run_sessionize_over_files(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    queryName: str = "stateful_sessions",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive the sessionizer over a directory of time-sliced parquet files
    with an availableNow trigger, and return the final session table.

    ``max_files_per_trigger`` (VERDICT r13 ask #5): ``None`` (default)
    replays the whole backlog as ONE large micro-batch — each
    availableNow commit pays a fixed per-batch state-store maintenance
    cost regardless of rows (measured on the interval join:
    19.3 s → 7.74 s at 1x, rows identical), so fewer, larger batches is
    the right replay default.  Pass 1 (one micro-batch per file, oldest
    mtime first) to exercise cross-batch session stitching — what the
    certified ``streaming_sessionize`` query pins explicitly — or any k
    to bound per-batch input."""
    reader = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    emissions = sessionize_stream(stream, gap_seconds=gap_seconds)
    q = (
        emissions.writeStream.format("memory")
        .queryName(queryName)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return latest_sessions(spark.table(queryName))
