"""S4/K2: streaming foreachBatch equals batch; upsert idempotency.

Reference semantics (SURVEY.md §3.2): streaming is just small batches
through the identical pipeline; late/duplicate data is handled by the
(uuid, type)-keyed delete+insert, not watermarks.
"""

import json
import time

from pyspark.sql import functions as F

from meerkat_abacus_spark.sinks.writers import upsert_by_key
from meerkat_abacus_spark.streaming.foreach_batch import stream_pipeline


def _transform(batch_df):
    """The shared batch transform: envelope → typed projection + coding-lite."""
    return batch_df.select(
        F.col("formId").alias("form"),
        F.col("data")["uuid"].alias("uuid"),
        F.col("data")["value"].cast("double").alias("value"),
    ).withColumn("flagged", F.col("value") > 50)


def test_stream_equals_batch(spark, tmp_path):
    src = tmp_path / "drops"
    src.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    envelopes = [
        {"formId": "demo_case", "data": {"uuid": f"u{i}", "value": str(i * 7 % 100)}}
        for i in range(50)
    ]
    # two file drops → two micro-batches
    (src / "a.json").write_text("\n".join(json.dumps(e) for e in envelopes[:30]))
    (src / "b.json").write_text("\n".join(json.dumps(e) for e in envelopes[30:]))

    collected = []

    def sink(df, batch_id):
        collected.extend(r.asDict() for r in df.collect())

    q = stream_pipeline(spark, str(src), _transform, sink, ckpt)
    q.awaitTermination(60)

    batch_df = spark.createDataFrame(
        [(e["formId"], e["data"]) for e in envelopes], ["formId", "data"]
    )
    expected = sorted(
        (r.asDict() for r in _transform(batch_df).collect()),
        key=lambda d: d["uuid"],
    )
    got = sorted(collected, key=lambda d: d["uuid"])
    assert got == expected


def test_stream_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: a second run against the SAME
    checkpoint skips already-committed files and processes only new drops
    (the SQS consumer's at-least-once + K2-idempotency contract, upgraded
    to exactly-once by checkpointed source offsets)."""
    src = tmp_path / "drops"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def envelopes(lo, hi):
        return "\n".join(
            json.dumps(
                {"formId": "demo_case", "data": {"uuid": f"u{i}", "value": str(i)}}
            )
            for i in range(lo, hi)
        )

    (src / "a.json").write_text(envelopes(0, 20))
    seen: list[str] = []

    def sink(df, batch_id):
        seen.extend(r["uuid"] for r in df.collect())

    stream_pipeline(spark, str(src), _transform, sink, ckpt).awaitTermination(60)
    assert sorted(seen) == sorted(f"u{i}" for i in range(20))

    # restart with one NEW drop: only its rows may flow
    (src / "b.json").write_text(envelopes(20, 30))
    stream_pipeline(spark, str(src), _transform, sink, ckpt).awaitTermination(60)
    assert sorted(seen) == sorted(f"u{i}" for i in range(30)), (
        "restart reprocessed already-committed files"
    )


def test_upsert_by_key_idempotent(spark, tmp_path):
    """K2 (write_to_db.py:40-49): reprocessing replaces rows by (uuid, type)."""
    path = str(tmp_path / "data_table")
    first = spark.createDataFrame(
        [("u1", "case", 1), ("u2", "case", 1), ("u3", "visit", 1)],
        ["uuid", "type", "version"],
    )
    upsert_by_key(spark, first, path, keys=["uuid", "type"])

    # reprocess u1/case + add u4; u1 must be replaced, not duplicated
    second = spark.createDataFrame(
        [("u1", "case", 2), ("u4", "case", 2)], ["uuid", "type", "version"]
    )
    upsert_by_key(spark, second, path, keys=["uuid", "type"])

    got = {
        (r["uuid"], r["type"]): r["version"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("u1", "case"): 2,
        ("u2", "case"): 1,
        ("u3", "visit"): 1,
        ("u4", "case"): 2,
    }


def test_upsert_partition_pruned_rewrite(spark, tmp_path):
    """The partitioned upsert must rewrite ONLY partitions present in the
    incoming batch: untouched partition directories keep their exact files
    (same names, same mtimes) — at 100 TB the rewrite cost is bounded by the
    batch, not the table."""
    import os

    path = str(tmp_path / "data_table")
    base = spark.createDataFrame(
        [("u1", "case", 2023, 1), ("u2", "case", 2024, 1),
         ("u3", "visit", 2023, 1), ("u4", "visit", 2024, 1)],
        ["uuid", "type", "epi_year", "version"],
    )
    upsert_by_key(spark, base, path, keys=["uuid", "type"],
                  partition_by=["type", "epi_year"])

    def snapshot(part):
        d = os.path.join(path, part)
        return {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    untouched = {
        p: snapshot(p)
        for p in ["type=case/epi_year=2023", "type=visit/epi_year=2023",
                  "type=visit/epi_year=2024"]
    }

    batch = spark.createDataFrame(
        [("u2", "case", 2024, 2), ("u9", "case", 2024, 2)],
        ["uuid", "type", "epi_year", "version"],
    )
    upsert_by_key(spark, batch, path, keys=["uuid", "type"],
                  partition_by=["type", "epi_year"])

    got = {
        (r["uuid"], r["type"]): r["version"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("u1", "case"): 1, ("u2", "case"): 2, ("u3", "visit"): 1,
        ("u4", "visit"): 1, ("u9", "case"): 2,
    }
    # untouched partitions: identical files, byte-for-byte untouched
    for p, before in untouched.items():
        assert snapshot(p) == before, f"partition {p} was rewritten"

    # idempotency: replaying the same batch changes nothing
    upsert_by_key(spark, batch, path, keys=["uuid", "type"],
                  partition_by=["type", "epi_year"])
    again = {
        (r["uuid"], r["type"]): r["version"]
        for r in spark.read.parquet(path).collect()
    }
    assert again == got


def test_upsert_partition_move_deletes_stale(spark, tmp_path):
    """A corrected row whose PARTITION COLUMN changes (e.g. a fixed date
    moves its epi_year) must delete its old version from the old partition
    — the reference's DELETE is by key regardless of partition
    (write_to_db.py:40-49).  Round-2 verdict 'What's missing' #1."""
    path = str(tmp_path / "data_table")
    base = spark.createDataFrame(
        [("u1", "case", 2023, 1), ("u2", "case", 2024, 1),
         ("u3", "case", 2024, 1)],
        ["uuid", "type", "epi_year", "version"],
    )
    upsert_by_key(spark, base, path, keys=["uuid", "type"],
                  partition_by=["type", "epi_year"])

    # u2's year corrected 2024 -> 2023; the batch itself only names 2023
    moved = spark.createDataFrame(
        [("u2", "case", 2023, 2)], ["uuid", "type", "epi_year", "version"]
    )
    upsert_by_key(spark, moved, path, keys=["uuid", "type"],
                  partition_by=["type", "epi_year"])

    got = {
        (r["uuid"], r["type"]): (r["epi_year"], r["version"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("u1", "case"): (2023, 1),
        ("u2", "case"): (2023, 2),   # new version, new partition
        ("u3", "case"): (2024, 1),   # untouched neighbour survives
    }
    # replay is still idempotent across the move
    upsert_by_key(spark, moved, path, keys=["uuid", "type"],
                  partition_by=["type", "epi_year"])
    assert {
        (r["uuid"], r["type"]): (r["epi_year"], r["version"])
        for r in spark.read.parquet(path).collect()
    } == got


def test_upsert_partition_move_empties_partition(spark, tmp_path):
    """When every row of a partition moves away, the partition directory
    itself must disappear (dynamic overwrite cannot express an empty
    partition, so the sink deletes it through the FileSystem client)."""
    import os

    path = str(tmp_path / "data_table")
    base = spark.createDataFrame(
        [("u1", "case", 2023, 1), ("u2", "case", 2024, 1)],
        ["uuid", "type", "epi_year", "version"],
    )
    upsert_by_key(spark, base, path, keys=["uuid", "type"],
                  partition_by=["type", "epi_year"])
    assert os.path.isdir(os.path.join(path, "type=case/epi_year=2024"))

    moved = spark.createDataFrame(
        [("u2", "case", 2023, 2)], ["uuid", "type", "epi_year", "version"]
    )
    upsert_by_key(spark, moved, path, keys=["uuid", "type"],
                  partition_by=["type", "epi_year"])

    assert not os.path.isdir(os.path.join(path, "type=case/epi_year=2024"))
    got = {
        (r["uuid"], r["type"]): (r["epi_year"], r["version"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {("u1", "case"): (2023, 1), ("u2", "case"): (2023, 2)}
    # staging dir cleaned up after the swap
    assert not os.path.exists(path + ".staging")


def test_upsert_corrupt_table_raises(spark, tmp_path):
    """A read failure on a POPULATED table must raise, never be treated as
    'table absent' and overwritten (round-2 verdict, 'What's wrong' #1)."""
    import os

    import pytest

    path = str(tmp_path / "data_table")
    os.makedirs(path)
    corrupt = os.path.join(path, "part-00000.parquet")
    with open(corrupt, "wb") as f:
        f.write(b"this is not a parquet footer")

    batch = spark.createDataFrame([("u1", "case", 1)], ["uuid", "type", "v"])
    with pytest.raises(Exception):
        upsert_by_key(spark, batch, path, keys=["uuid", "type"])
    # the corrupt table was left alone for a human to look at
    with open(corrupt, "rb") as f:
        assert f.read() == b"this is not a parquet footer"


def test_csv_sink_roundtrip(spark, tmp_path):
    """K3 (util/__init__.py:289-310): header CSV export reads back equal."""
    from meerkat_abacus_spark.sinks.writers import csv_sink

    df = spark.createDataFrame(
        [("u1", "male", 34), ("u2", "female", 51)], ["uuid", "gender", "age"]
    )
    out = str(tmp_path / "export")
    csv_sink(df, out, single_file=True)
    back = spark.read.option("header", True).csv(out)
    assert sorted(back.columns) == ["age", "gender", "uuid"]
    assert {tuple(r) for r in back.collect()} == {
        ("u1", "male", "34"), ("u2", "female", "51")
    }


def test_streaming_threshold_alerts_equals_batch(spark, tmp_path):
    """Watermarked windowed alert counts == batch threshold_alerts for
    on-time data (availableNow over a file drop)."""
    import datetime
    from meerkat_abacus_spark.operators import alerts as al
    from meerkat_abacus_spark.streaming.alerts_stream import (
        streaming_threshold_alerts,
    )

    base = datetime.datetime(2024, 1, 10, 8, 0)
    rows = []
    for i in range(4):  # clinic 1: 4 errors same day → alert
        rows.append((f"e{i}", 1, base + datetime.timedelta(minutes=i), "error"))
    rows.append(("e9", 2, base, "error"))  # clinic 2: below limit
    df = spark.createDataFrame(rows, ["uuid", "clinic", "ts", "event_type"])

    src = tmp_path / "stream_src"
    df.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    alerts_stream = streaming_threshold_alerts(
        stream, var_predicate=F.col("event_type") == "error", daily_limit=3
    )
    q = (
        alerts_stream.writeStream.format("memory")
        .queryName("alerts_mem")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["clinic"], r["count"]): r["uuids"]
        for r in spark.sql("SELECT * FROM alerts_mem").collect()
    }

    batch = al.threshold_alerts(
        df, var_predicate=F.col("event_type") == "error",
        clinic_col="clinic", date_col="ts", uuid_col="uuid", daily_limit=3,
    )
    expected = {
        (r["clinic"], r["count"]): r["uuids"] for r in batch.collect()
    }
    assert got == expected and got == {(1, 4): ["e0", "e1", "e2", "e3"]}


def test_upsert_many_partitions_uses_join_fallback(spark, tmp_path, monkeypatch):
    """Backfill shape (r7 verdict ask #6): ~5 000 affected partitions must
    not build a 5 000-term literal OR-chain (Catalyst analysis degrades
    superlinearly) — above partition_literal_limit the affected-partition
    filter becomes a broadcast semi-join, and the merge still replaces
    exactly the incoming keys.  The branch taken is asserted by recording
    the fallback call (ADVICE r8 #5: a wall-clock bound flakes under CI
    load and proves nothing about which path ran)."""
    from meerkat_abacus_spark.sinks import writers as w

    path = str(tmp_path / "wide_table")
    n = 5000
    base = spark.createDataFrame(
        [(f"u{i}", "case", i, 1) for i in range(n)],
        ["uuid", "type", "pkey", "version"],
    ).repartition(8)
    upsert_by_key(
        spark, base, path, keys=["uuid", "type"], partition_by=["pkey"]
    )

    batch = spark.createDataFrame(
        [(f"u{i}", "case", i, 2) for i in range(n)],
        ["uuid", "type", "pkey", "version"],
    ).repartition(8)
    calls = []
    real = w._affected_by_semi_join

    def recording(*args, **kwargs):
        out = real(*args, **kwargs)
        calls.append(out)
        return out

    monkeypatch.setattr(w, "_affected_by_semi_join", recording)
    upsert_by_key(
        spark, batch, path, keys=["uuid", "type"], partition_by=["pkey"]
    )
    assert len(calls) == 1, "semi-join fallback branch was not taken"
    # and the fallback's plan really is a broadcast semi-join
    plan = calls[0]._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan, plan

    got = spark.read.parquet(path)
    assert got.count() == n
    assert got.filter(F.col("version") != 2).count() == 0


def test_upsert_join_fallback_null_partition_value(spark, tmp_path):
    """The semi-join fallback must keep the literal chain's NULL-safe
    semantics: a null partition value in the batch still matches its
    existing partition."""
    path = str(tmp_path / "null_part")
    base = spark.createDataFrame(
        [("u1", "case", None, 1), ("u2", "case", "A", 1)],
        "uuid string, type string, pkey string, version int",
    )
    upsert_by_key(
        spark, base, path, keys=["uuid", "type"], partition_by=["pkey"]
    )
    batch = spark.createDataFrame(
        [("u1", "case", None, 2)],
        "uuid string, type string, pkey string, version int",
    )
    upsert_by_key(
        spark, batch, path, keys=["uuid", "type"], partition_by=["pkey"],
        partition_literal_limit=0,  # force the join path
    )
    got = {
        (r["uuid"], r["pkey"]): r["version"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {("u1", None): 2, ("u2", "A"): 1}
