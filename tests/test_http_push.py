"""K5 wire leg over a REAL socket: an in-process HTTP server receives the
executor-side POSTs from sinks/http_push.py.

Covers reference util/__init__.py:495-588 (hermes publish),
util/__init__.py:422-439 (ODK submission forward) and the retry/idempotency
contract: first attempt per key is rejected with 503, the retry succeeds,
and the Idempotency-Key header lets the receiver dedupe task re-attempts.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F


class _Receiver:
    """Threaded HTTP server recording every POST; optionally 503s the first
    attempt per Idempotency-Key to force the client's retry path."""

    def __init__(self, fail_first_per_key: bool = False):
        self.lock = threading.Lock()
        self.received: list[dict] = []  # successful deliveries only
        self.attempts: list[str | None] = []  # every POST's key, in order
        self._seen_keys: set = set()
        recv = self

        class _Handler(BaseHTTPRequestHandler):
            def do_POST(handler):
                n = int(handler.headers.get("Content-Length", 0))
                body = handler.rfile.read(n)
                key = handler.headers.get("Idempotency-Key")
                with recv.lock:
                    recv.attempts.append(key)
                    first = key not in recv._seen_keys
                    if key is not None:
                        recv._seen_keys.add(key)
                    if fail_first_per_key and first:
                        handler.send_response(503)
                        handler.end_headers()
                        return
                    recv.received.append(
                        {
                            "path": handler.path,
                            "key": key,
                            "doc": json.loads(body),
                        }
                    )
                handler.send_response(200)
                handler.end_headers()

            def log_message(handler, *a):  # silence per-request stderr spam
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}/ingest"
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture
def receiver():
    r = _Receiver()
    yield r
    r.close()


@pytest.fixture
def flaky_receiver():
    r = _Receiver(fail_first_per_key=True)
    yield r
    r.close()


def test_publish_alerts_posts_rendered_alerts(spark, receiver):
    """publish_alerts + http_sender: every rendered alert row arrives as a
    JSON document, keyed by its alert id, from the executors."""
    from meerkat_abacus_spark.operators.send_alerts import publish_alerts
    from meerkat_abacus_spark.sinks.http_push import http_sender

    alerts = spark.createDataFrame(
        [(f"a{i}", f"cmd_{i % 3}", f"Alert #{i}") for i in range(20)],
        "id string, reason string, message string",
    ).repartition(4)

    n = publish_alerts(alerts, send=http_sender(receiver.url, key_field="id"))
    assert n == 20
    assert len(receiver.received) == 20
    got = {r["key"]: r["doc"] for r in receiver.received}
    assert set(got) == {f"a{i}" for i in range(20)}
    assert got["a7"]["message"] == "Alert #7"
    assert got["a7"]["reason"] == "cmd_1"


def test_push_rows_retries_5xx_and_delivers_exactly_once_per_key(
    spark, flaky_receiver
):
    """push_rows against a receiver that 503s the FIRST attempt per key:
    the linear-backoff retry must deliver every row anyway, each key
    exactly once on the success log, with >n total attempts proving the
    retry actually fired."""
    from meerkat_abacus_spark.operators.exports import (
        aggregate_submission_payload,
    )
    from meerkat_abacus_spark.sinks.http_push import push_rows

    raw = spark.createDataFrame(
        [
            (f"uuid:{i}", "2024-01-01T00:00:00", f"p{i}", str(20 + i))
            for i in range(8)
        ],
        "`meta/instanceID` string, SubmissionDate string, "
        "`person./name` string, `person./age` string",
    )
    payloads = aggregate_submission_payload(raw, form_id="demo_case")

    report = push_rows(payloads, flaky_receiver.url, key_col="uuid")
    assert report.pushed == 8 and report.rejected == 0
    assert len(flaky_receiver.received) == 8
    keys = sorted(r["key"] for r in flaky_receiver.received)
    assert keys == sorted(f"uuid:{i}" for i in range(8))
    # retry fired: every key was attempted at least twice (503 then 200)
    assert len(flaky_receiver.attempts) >= 16
    doc = next(
        r["doc"] for r in flaky_receiver.received if r["key"] == "uuid:3"
    )
    assert doc["uuid"] == "uuid:3"
    inner = json.loads(doc["payload"])
    assert inner["@id"] == "demo_case"
    assert inner["person"] == {"name": "p3", "age": "23"}


def test_push_rows_fails_fast_on_4xx(spark):
    """A 4xx is a payload bug: no retry; in on_client_error='fail' mode the
    job surfaces the error instead of silently dropping rows."""
    from meerkat_abacus_spark.sinks.http_push import push_rows

    r = _Receiver()
    # strict receiver: reject everything with 400
    class _Reject(BaseHTTPRequestHandler):
        def do_POST(handler):
            n = int(handler.headers.get("Content-Length", 0))
            handler.rfile.read(n)
            with r.lock:
                r.attempts.append(handler.headers.get("Idempotency-Key"))
            handler.send_response(400)
            handler.end_headers()

        def log_message(handler, *a):
            pass

    r.server.RequestHandlerClass = _Reject
    try:
        df = spark.createDataFrame([("u1", "x")], "uuid string, payload string")
        with pytest.raises(Exception):
            push_rows(
                df, r.url, key_col="uuid", retries=3, on_client_error="fail"
            )
        # fail-fast: exactly one attempt for the single row, not 4
        assert len(r.attempts) == 1
    finally:
        r.close()


def test_push_rows_deadletters_4xx_rows_without_failing_task(spark):
    """Dead-letter mode (advisor r6): a 4xx row is quarantined per-row —
    the key lands in the report, the remaining rows still deliver exactly
    once, and the task (hence the job) SUCCEEDS, so Spark never re-attempts
    the partition and the delivered prefix is never re-sent."""
    from meerkat_abacus_spark.sinks.http_push import push_rows

    r = _Receiver()

    class _RejectOdd(BaseHTTPRequestHandler):
        def do_POST(handler):
            n = int(handler.headers.get("Content-Length", 0))
            handler.rfile.read(n)
            key = handler.headers.get("Idempotency-Key")
            with r.lock:
                r.attempts.append(key)
            if key and int(key.split(":")[1]) % 2 == 1:
                handler.send_response(422)
                handler.end_headers()
                return
            with r.lock:
                r.received.append({"key": key})
            handler.send_response(200)
            handler.end_headers()

        def log_message(handler, *a):
            pass

    r.server.RequestHandlerClass = _RejectOdd
    try:
        df = spark.createDataFrame(
            [(f"u:{i}", "x") for i in range(6)], "uuid string, payload string"
        )
        report = push_rows(df, r.url, key_col="uuid", retries=3)
        assert report.pushed == 3
        assert report.rejected == 3
        assert report.rejected_keys == (
            ("u:1", 422), ("u:3", 422), ("u:5", 422),
        )
        # rejected rows saw exactly ONE attempt each (no 4xx retry), and
        # delivered keys exactly one success
        assert sorted(x["key"] for x in r.received) == ["u:0", "u:2", "u:4"]
        assert len(r.attempts) == 6
    finally:
        r.close()


def test_push_rows_deadletters_null_key_rows(spark):
    """A row whose key_col is NULL must still quarantine cleanly (advisor
    r7): the (None, code) tuple previously made the driver-side sorted()
    raise TypeError AFTER delivery completed.  NULL keys sort last."""
    from meerkat_abacus_spark.sinks.http_push import push_rows

    r = _Receiver()

    class _RejectAll(BaseHTTPRequestHandler):
        def do_POST(handler):
            n = int(handler.headers.get("Content-Length", 0))
            handler.rfile.read(n)
            handler.send_response(422)
            handler.end_headers()

        def log_message(handler, *a):
            pass

    r.server.RequestHandlerClass = _RejectAll
    try:
        df = spark.createDataFrame(
            [("b", "x"), (None, "x"), ("a", "x")],
            "uuid string, payload string",
        )
        report = push_rows(df, r.url, key_col="uuid", retries=3)
        assert report.pushed == 0
        assert report.rejected == 3
        assert report.rejected_keys == (("a", 422), ("b", 422), (None, 422))
    finally:
        r.close()


def test_http_foreach_batch_sink_streaming_leg(spark, receiver):
    """The foreachBatch adapter pushes a micro-batch like any batch — here
    invoked directly, exactly as writeStream would call it."""
    from meerkat_abacus_spark.sinks.http_push import http_foreach_batch_sink

    sink = http_foreach_batch_sink(receiver.url, key_col="uuid")
    batch = spark.createDataFrame(
        [("u1", "{}"), ("u2", "{}")], "uuid string, payload string"
    )
    sink(batch, 0)
    assert sorted(r["key"] for r in receiver.received) == ["u1", "u2"]
