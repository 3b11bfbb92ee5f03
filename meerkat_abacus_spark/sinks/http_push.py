"""K5 external push over real HTTP: hermes-style alert publish and
ODK-aggregate submission forwarding.

Reference parity: ``util/__init__.py:495-588`` (hermes publish — one JSON
POST per rendered alert/topic), ``util/__init__.py:422-439`` (submit to
aggregate — one document per submission), ``consul_export.py:85-97`` (batch
push loop).  The payload SHAPING lives in ``operators/send_alerts.py`` and
``operators/exports.py``; this module is the wire leg those modules
previously stubbed.

Spark disposition — the POSTs run ON THE EXECUTORS:

- ``foreachPartition`` (batch) / ``foreachBatch`` (streaming) so a wide
  alert day fans out across the cluster instead of serializing through the
  driver; the driver never materializes the payload set.
- stdlib ``urllib`` only (no client dependency to ship to workers); one
  connection per request keeps the callable picklable and the semantics
  obvious — a pooled client would drop into ``_post_json`` unchanged.
- Idempotent retry: every POST carries an ``Idempotency-Key`` header (the
  row's uuid / alert id) and retries with linear backoff on 5xx and
  transport errors, so an executor retry or Spark task re-attempt can only
  re-send a key the receiver has already seen — the receiver dedupes, the
  pipeline stays exactly-once-per-key.  4xx responses do NOT retry (the
  payload is wrong; retrying cannot fix it).

Task re-attempt semantics for client errors (advisor r6): raising inside
``foreachPartition`` fails the Spark TASK, which is re-attempted up to
``spark.task.maxFailures`` — each attempt re-POSTs the partition prefix
(safe only because of the Idempotency-Key) and re-POSTs the 4xx payload
itself.  ``on_client_error="deadletter"`` (the default for
:func:`push_rows`) therefore catches 4xx PER ROW and routes the key to a
dead-letter accumulator instead of failing the task: delivery continues,
the task succeeds, and the caller receives the rejected keys for the
dead-letter table (mirroring the reference's row-level quarantine in the
K4 sink).  ``on_client_error="fail"`` restores fail-fast for callers that
want a poisoned payload to abort the job — accepting the documented
prefix-re-send on each attempt.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable
from typing import NamedTuple

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame

__all__ = [
    "PushReport",
    "http_foreach_batch_sink",
    "http_sender",
    "push_rows",
]


class PushReport(NamedTuple):
    """Outcome of a :func:`push_rows` call in dead-letter mode."""

    pushed: int
    rejected: int
    rejected_keys: tuple


class _ListAccum(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def _post_json(
    url: str,
    doc: dict,
    idempotency_key: str | None,
    timeout_s: float,
    retries: int,
    backoff_s: float,
) -> None:
    """POST one JSON document; retry 5xx/transport errors, fail fast on 4xx."""
    body = json.dumps(doc, default=str).encode("utf-8")
    headers = {"Content-Type": "application/json"}
    if idempotency_key is not None:
        headers["Idempotency-Key"] = str(idempotency_key)
    last: Exception | None = None
    for attempt in range(retries + 1):
        req = urllib.request.Request(url, data=body, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=timeout_s):
                return
        except urllib.error.HTTPError as e:
            if e.code < 500:
                raise  # client error: retrying cannot help, surface it
            last = e
        except urllib.error.URLError as e:
            last = e
        if attempt < retries:
            time.sleep(backoff_s * (attempt + 1))
    assert last is not None
    raise last


def http_sender(
    url: str,
    key_field: str = "id",
    timeout_s: float = 10.0,
    retries: int = 3,
    backoff_s: float = 0.1,
) -> Callable[[dict], None]:
    """Per-row send callable for ``publish_alerts`` that POSTs the rendered
    alert as JSON.  Picklable (closes over plain values only), so it ships
    to executors through ``foreachPartition`` untouched."""

    def _send(row: dict) -> None:
        _post_json(
            url, row, row.get(key_field), timeout_s, retries, backoff_s
        )

    return _send


def push_rows(
    df: DataFrame,
    url: str,
    key_col: str = "uuid",
    timeout_s: float = 10.0,
    retries: int = 3,
    backoff_s: float = 0.1,
    on_client_error: str = "deadletter",
) -> "int | PushReport":
    """POST every row of ``df`` as one JSON document — the batch push leg
    for ``aggregate_submission_payload`` output and consul-style exports.

    Runs via ``foreachPartition`` on the executors; the row's ``key_col``
    becomes the ``Idempotency-Key`` so task re-attempts are safe.

    ``on_client_error="deadletter"`` (default): a 4xx response quarantines
    THAT row — its key and status code go to a dead-letter accumulator,
    the rest of the partition keeps delivering, the task succeeds, and a
    :class:`PushReport` (pushed, rejected, rejected_keys) is returned for
    the caller's dead-letter table.  ``"fail"``: a 4xx raises and fails
    the task (the pre-r7 behaviour) — note the task is then RE-ATTEMPTED
    by Spark, re-sending the partition prefix and the poisoned payload on
    every attempt (see module docstring); returns the pushed count as
    ``int``.

    .. note:: BREAKING since r7 — ``"deadletter"`` became the default, so
       the default-call return type changed from ``int`` to
       :class:`PushReport`.  Callers comparing the old count should read
       ``report.pushed`` or pass ``on_client_error="fail"``."""
    if on_client_error not in ("deadletter", "fail"):
        raise ValueError("on_client_error must be 'deadletter' or 'fail'")
    sc = df.sparkSession.sparkContext
    acc = sc.accumulator(0)
    dead = sc.accumulator([], _ListAccum()) if on_client_error == "deadletter" else None

    def _partition(rows) -> None:
        n = 0
        rejects = []
        for row in rows:
            d = row.asDict()
            try:
                _post_json(
                    url, d, d.get(key_col), timeout_s, retries, backoff_s
                )
            except urllib.error.HTTPError as e:
                if dead is None or e.code >= 500:
                    raise
                rejects.append((d.get(key_col), e.code))
                continue
            n += 1
        acc.add(n)
        if dead is not None and rejects:
            dead.add(rejects)

    df.foreachPartition(_partition)
    if dead is None:
        return acc.value
    # None-safe ordering (advisor r7): a row with a NULL key_col reaches
    # here as (None, code), and a plain sorted() would raise TypeError on
    # the driver AFTER every row was delivered — turning a per-row
    # quarantine into a job failure.  NULL keys sort last.
    rejected = tuple(
        sorted(dead.value, key=lambda t: (t[0] is None, t[0] or "", t[1]))
    )
    return PushReport(acc.value, len(rejected), rejected)


def http_foreach_batch_sink(
    url: str,
    key_col: str = "uuid",
    timeout_s: float = 10.0,
    retries: int = 3,
    backoff_s: float = 0.1,
) -> Callable[[DataFrame, int], None]:
    """``writeStream.foreachBatch`` adapter around :func:`push_rows` — the
    streaming leg of K5.  Micro-batch replays after a failure re-send the
    same idempotency keys, preserving exactly-once-per-key downstream."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        push_rows(
            batch_df,
            url,
            key_col=key_col,
            timeout_s=timeout_s,
            retries=retries,
            backoff_s=backoff_s,
        )

    return _sink
