"""SparkSession factory tuned for this engine.

Scale notes (targets a 1000-executor cluster even though tests run local):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  broadcast demotion/promotion are exactly what the alert/link workloads need
  when one clinic (or one hot join key) dominates.
- Arrow on: the only Python-side code paths in the engine are Pandas-UDF
  batches (multimodal decode, pathological date formats); everything else is
  JVM whole-stage codegen.
- ANSI off: the reference's semantics are permissive (bad dates/numbers become
  NULL/0, not errors — reference: meerkat_abacus/codes/variable.py:271-285);
  Spark 4 defaults ANSI on, which would turn those rows into job failures.
  Library code additionally uses try_* functions so it stays correct under a
  caller-provided ANSI session too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "meerkat_abacus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # The driver testdata's events.parquet carries TIMESTAMP(NANOS),
        # which the vectorized reader rejects; reading nanos as long is the
        # exact-integer path (queries._t rebuilds µs timestamps).  Set here
        # so library sessions never trip on it; query code still sets it
        # defensively for caller-owned sessions (e.g. the round driver's).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Driver testdata timestamps are timezone-naive parquet µs; Spark 4
        # infers those as TIMESTAMP_NTZ by default, which chronology
        # functions like unix_micros reject.  The session timezone is UTC,
        # so reading them as plain TIMESTAMP preserves the wall-clock
        # instants DuckDB's naive reader sees while keeping one timestamp
        # type across the engine.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # The sample-policy block caps (dedup._apply_block_cap) rely on
        # InferWindowGroupLimit turning `row_number() <= cap` into a
        # map-side per-block top-k (Partial WindowGroupLimit) so a hot
        # block never reaches the shuffle in full.  The rule only fires
        # for caps below this threshold (Spark default 1000); our largest
        # cap is 5000 and a 5000-row per-block heap per mapper is
        # trivially cheap next to the block² pair join it prevents.
        .config("spark.sql.optimizer.windowGroupLimitThreshold", "100000")
        # Production-sized codes files (hundreds of rules) compile into deep
        # Catalyst trees; the default JVM thread stack overflows in analysis.
        .config("spark.driver.extraJavaOptions", "-Xss64m")
        .config("spark.executor.extraJavaOptions", "-Xss64m")
        .config("spark.ui.enabled", "false")
        # Stage progress bars interleave \r-prefixed junk into stdout, which
        # corrupts the one-JSON-line contract of bench/rehearsal tools and
        # the OK-per-line output of tools/compare.py.
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
