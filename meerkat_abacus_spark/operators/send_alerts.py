"""A5 — send_alerts: individual-alert messaging with topic fan-out.

Reference: pipeline_worker/process_steps/send_alerts.py:17-31 (select +
render) and util/__init__.py:459-492 (topic list = cartesian product of
location levels × {reason, allDis}), :495-588 (publish).

Spark shape: a filter + projection renders the message fields (JVM
``format_string``), ``explode`` produces one row per (alert, topic) — the
cartesian fan-out is two literal arrays zipped at plan time.  The actual
HTTP publish is a ``foreachBatch`` sink stub (out of analytic scope,
SURVEY.md §2.1 K5); everything up to the wire is a DataFrame.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meerkat_abacus_spark.functions.cols import qcol


def render_alert_messages(
    df: DataFrame,
    uuid_col: str = "uuid",
    reason_col: str = "alert_reason",
    clinic_col: str = "clinic",
    date_col: str = "date",
    alert_id_len: int = 6,
    template: str = "Alert %s: %s at clinic %s on %s",
) -> DataFrame:
    """Filter individual alerts and render text; alert_id = uuid suffix
    (send_alerts.py:24-25; FIXTURES.md: uuid 'abcdefghijk' → id 'fghijk')."""
    out = df.filter(F.col("alert") & (F.coalesce(F.col("sub_alert"), F.lit(0)) == 0))
    alert_id = F.right(qcol(uuid_col).cast("string"), F.lit(alert_id_len))
    return out.withColumns(
        {
            "alert_id": alert_id,
            "message": F.format_string(
                template,
                alert_id,
                qcol(reason_col).cast("string"),
                qcol(clinic_col).cast("string"),
                qcol(date_col).cast("string"),
            ),
        }
    )


def topic_fan_out(
    df: DataFrame,
    prefix: str,
    reason_col: str = "alert_reason",
    level_cols: tuple[str, ...] = ("clinic", "district", "region"),
) -> DataFrame:
    """One row per (alert, topic): ``prefix-<loc>-<reason>`` for each location
    level plus country ('1'), crossed with {reason, allDis}
    (util/__init__.py:459-492)."""
    locs = F.array(
        *[qcol(c).cast("string") for c in level_cols], F.lit("1")
    )
    reasons = F.array(qcol(reason_col).cast("string"), F.lit("allDis"))
    topics = F.flatten(
        F.transform(
            locs,
            lambda loc: F.transform(
                reasons,
                lambda r: F.concat_ws("-", F.lit(prefix), loc, r),
            ),
        )
    )
    return df.withColumn("topic", F.explode(topics))


def recent_alerts_only(
    df: DataFrame, date_col: str, as_of, days: int = 7
) -> DataFrame:
    """Reference util/__init__.py:514 — only alerts newer than ``as_of -
    days`` are published.  ``as_of`` is an explicit parameter (the reference
    uses ``datetime.now()``): deterministic plans, reproducible tests, and
    correct semantics when replaying historical batches."""
    cutoff = F.lit(as_of) - F.expr(f"INTERVAL {int(days)} DAYS")
    return df.filter(qcol(date_col).cast("timestamp") > cutoff)


def publish_alerts(
    df: DataFrame,
    send: Callable[[dict], None] | None = None,
    silent: bool = False,
) -> int:
    """K5 publish stub: hand each rendered alert to ``send`` (HTTP in
    production — hermes, util/__init__.py:495-588).

    Delivery runs on the EXECUTORS via ``foreachPartition`` — the driver
    never materializes the alert set, and a wide alert day fans out across
    the cluster instead of serializing through one process.  ``send`` must
    be picklable (a module-level function or a closure over simple state);
    per-partition batching is where an HTTP client would keep one session
    per partition.  Returns the number of alerts published (counted with an
    accumulator inside the same pass — no second job).

    ``silent`` mirrors the country config's ``messaging_silent``
    (util/__init__.py:587): the pipeline runs end-to-end but nothing leaves
    the cluster — the count still reflects what WOULD have been sent."""
    acc = df.sparkSession.sparkContext.accumulator(0)
    do_send = None if silent else send

    def _partition(rows) -> None:
        n = 0
        for row in rows:
            if do_send is not None:
                do_send(row.asDict())
            n += 1
        acc.add(n)

    df.foreachPartition(_partition)
    return acc.value
