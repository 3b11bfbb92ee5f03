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
  payload is wrong; retrying cannot fix it) and raise so the task fails
  loudly instead of dropping data.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = [
    "http_foreach_batch_sink",
    "http_sender",
    "push_rows",
]


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
) -> int:
    """POST every row of ``df`` as one JSON document — the batch push leg
    for ``aggregate_submission_payload`` output and consul-style exports.

    Runs via ``foreachPartition`` on the executors; the row's ``key_col``
    becomes the ``Idempotency-Key`` so task re-attempts are safe.  Returns
    the number of rows pushed, counted with an accumulator inside the same
    pass (no second job)."""
    acc = df.sparkSession.sparkContext.accumulator(0)

    def _partition(rows) -> None:
        n = 0
        for row in rows:
            d = row.asDict()
            _post_json(url, d, d.get(key_col), timeout_s, retries, backoff_s)
            n += 1
        acc.add(n)

    df.foreachPartition(_partition)
    return acc.value


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
