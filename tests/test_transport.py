"""Executed coverage for the PRODUCTION transports (ADVICE round 1 #10).

`sources/http.py::https_transport` and `sinks.py::https_post` are the
only code paths the hermetic fakes bypass.  These tests stand up a real
in-process `http.server` and drive the production functions against it —
urllib's request construction, status propagation, error-body handling,
and the POST content-type/body contract all execute for real (the
`https` scheme differs from `http` only in the TLS socket wrap, which
stdlib owns)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyspark.sql import functions as F

from etl_wildweb_spark.sinks import https_post
from etl_wildweb_spark.sources.http import https_transport, read_centers

ENVELOPE = [{"retrieved": "2026-01-01T00:00:00Z", "data": []}]


class _Handler(BaseHTTPRequestHandler):
    """Scripted WildWeb/CloudTAK double: path selects the behavior."""

    posts: list[dict] = []

    def do_GET(self):  # noqa: N802 (stdlib naming)
        if "_ERR" in self.path:
            body = b'{"message": "internal error"}'
            self.send_response(500)
        else:
            body = json.dumps(ENVELOPE).encode()
            self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        _Handler.posts.append(
            {
                "path": self.path,
                "content_type": self.headers.get("Content-Type"),
                "body": self.rfile.read(n).decode(),
            }
        )
        status = 503 if "unavailable" in self.path else 200
        self.send_response(status)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_https_transport_ok(server):
    status, body = https_transport(f"{server}/centers/AZPDC/incidents", "AZPDC")
    assert status == 200
    assert json.loads(body) == ENVELOPE


def test_https_transport_error_body_preserved(server):
    # non-2xx must return (code, body), not raise — the reader's retry
    # loop and the pipeline's error channel both depend on it
    status, body = https_transport(f"{server}/centers/X_ERR/incidents", "X_ERR")
    assert status == 500
    assert "internal error" in body


def test_https_transport_connection_refused_raises():
    # a dead endpoint raises (URLError) — the reader catches it and
    # emits a status-0 row; assert the contract boundary explicitly
    with pytest.raises(Exception):
        https_transport("http://127.0.0.1:9/never", "X")


def test_https_post_contract(server):
    _Handler.posts.clear()
    post = https_post(f"{server}/api/layer/1/cot")
    fc = '{"type":"FeatureCollection","features":[]}'
    assert post(fc) == 200
    assert _Handler.posts[0]["content_type"] == "application/json"
    assert _Handler.posts[0]["body"] == fc


def test_https_post_propagates_http_error(server):
    post = https_post(f"{server}/unavailable")
    # urlopen raises on 503; submit_features catches transport failures
    # and records status 0 — here we assert the raw transport behavior
    with pytest.raises(Exception):
        post('{"type":"FeatureCollection","features":[]}')


def test_reader_https_transport_end_to_end(spark, server):
    # the actual Spark DataSource path with transport=https against the
    # live local server: one OK center, one erroring center (retried,
    # then surfaced as an http_ok=false row)
    rows = {
        r["center"]: r
        for r in read_centers(
            spark,
            ["AZPDC", "NVSFC_ERR"],
            transport="https",
            retries=1,
            endpoint=f"{server}/centers/{{center}}/incidents",
        ).collect()
    }
    assert rows["AZPDC"]["http_ok"] and rows["AZPDC"]["status"] == 200
    assert json.loads(rows["AZPDC"]["payload"]) == ENVELOPE
    assert not rows["NVSFC_ERR"]["http_ok"]
    assert rows["NVSFC_ERR"]["status"] == 500
    assert rows["NVSFC_ERR"]["attempts"] == 2


def test_stream_poll_source_exactly_once(spark):
    """b91: 3 polls × 12 centers, every (center, poll) pair exactly
    once — the offset-per-generation contract."""
    from etl_wildweb_spark.sources.http import (
        _DEMO_CENTERS,
        run_polls_to_memory,
    )

    out = run_polls_to_memory(
        spark, _DEMO_CENTERS, max_polls=3, transport="fake"
    )
    assert out.count() == 3 * len(_DEMO_CENTERS)
    assert out.select("center", "poll").distinct().count() == 3 * len(
        _DEMO_CENTERS
    )
    # per-generation payloads are deterministic: poll k == poll 0
    p0 = {
        r.center: r.payload for r in out.filter(F.col("poll") == 0).collect()
    }
    for k in (1, 2):
        pk = {
            r.center: r.payload
            for r in out.filter(F.col("poll") == k).collect()
        }
        assert pk == p0


def test_stream_poll_replay_matches_read(spark):
    """readBetweenOffsets (crash replay) must reproduce exactly what
    read() emitted for the same offset range."""
    from etl_wildweb_spark.sources.http import (
        _DEMO_CENTERS,
        WildWebPollStreamReader,
    )

    r = WildWebPollStreamReader(
        {"centers": ",".join(_DEMO_CENTERS), "maxPolls": "3",
         "transport": "fake"}
    )
    live1, o1 = r.read(r.initialOffset())
    live2, o2 = r.read(o1)
    live = list(live1) + list(live2)
    replay = list(r.readBetweenOffsets({"poll": 0}, {"poll": 2}))
    assert live == replay
    assert o2 == {"poll": 2}
    # past the budget: empty batch, offset pinned
    empty, o3 = r.read({"poll": 3})
    assert list(empty) == [] and o3 == {"poll": 3}
