"""Live HTTP adapter (sources/openf1.py HttpClient) against a local
stub server — proves the reference's fetch semantics
(``dags/open_f1_historical.py:48-57``: 200 -> JSON, non-200/error ->
[]) plus the bounded-retry extension, with zero network access."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from formula1_data_pipeline_spark.sources import HttpClient


class _StubHandler(BaseHTTPRequestHandler):
    """Programmable per-path behavior via the server's `script` dict:
    path -> list of (status, body_bytes_or_None[hang]) consumed per
    request; the last entry repeats."""

    def do_GET(self):  # noqa: N802 (http.server API)
        path = self.path.split("?")[0].lstrip("/")
        self.server.requests.append(self.path)
        steps = self.server.script.get(path, [(404, b"[]")])
        i = min(len(self.server.hits.setdefault(path, [])), len(steps) - 1)
        self.server.hits[path].append(self.path)
        status, body = steps[i]
        if body is None:  # simulate a hang past the client timeout
            time.sleep(1.0)
            body = b"[]"
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence test output
        pass


@pytest.fixture()
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    srv.script = {}
    srv.requests = []
    srv.hits = {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def _client(srv, **kw):
    kw.setdefault("timeout_sec", 2.0)
    kw.setdefault("backoff_sec", 0.0)
    kw.setdefault("sleep", lambda s: None)
    return HttpClient(base_url=f"http://127.0.0.1:{srv.server_port}", **kw)


def test_200_json_list_passes_through_with_params(stub_server):
    rows = [{"driver_number": 44, "lap": 1}, {"driver_number": 1}]
    stub_server.script["laps"] = [(200, json.dumps(rows).encode())]
    out = _client(stub_server).fetch("laps", session_key=9165)
    assert out == rows
    assert stub_server.requests == ["/laps?session_key=9165"]


def test_non_200_returns_empty_without_retry(stub_server):
    stub_server.script["laps"] = [(403, b"nope")]
    assert _client(stub_server, retries=3).fetch("laps") == []
    assert len(stub_server.hits["laps"]) == 1  # 4xx never retries


def test_garbage_json_returns_empty(stub_server):
    stub_server.script["laps"] = [(200, b"<html>not json")]
    assert _client(stub_server).fetch("laps") == []


def test_non_list_json_returns_empty(stub_server):
    stub_server.script["laps"] = [(200, b'{"error": "object"}')]
    assert _client(stub_server).fetch("laps") == []


def test_transient_5xx_retries_then_succeeds(stub_server):
    rows = [{"a": 1}]
    stub_server.script["laps"] = [
        (503, b""), (500, b""), (200, json.dumps(rows).encode()),
    ]
    slept = []
    out = _client(stub_server, retries=2, backoff_sec=0.25,
                  sleep=slept.append).fetch("laps")
    assert out == rows
    assert len(stub_server.hits["laps"]) == 3
    assert slept == [0.25, 0.5]  # exponential backoff


def test_retries_exhausted_returns_empty(stub_server):
    stub_server.script["laps"] = [(503, b"")]
    assert _client(stub_server, retries=2).fetch("laps") == []
    assert len(stub_server.hits["laps"]) == 3


def test_timeout_is_bounded_and_retried(stub_server):
    rows = [{"a": 1}]
    stub_server.script["laps"] = [
        (200, None),  # handler sleeps 1 s > client timeout
        (200, json.dumps(rows).encode()),
    ]
    t0 = time.monotonic()
    out = _client(stub_server, timeout_sec=0.2, retries=1).fetch("laps")
    assert out == rows
    assert time.monotonic() - t0 < 2.0
    assert len(stub_server.hits["laps"]) == 2


def test_connection_refused_returns_empty():
    # nothing listens on this port (bind-then-close reserves a dead one)
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    c = HttpClient(base_url=f"http://127.0.0.1:{port}", timeout_sec=0.5,
                   retries=1, backoff_sec=0.0, sleep=lambda s: None)
    assert c.fetch("laps") == []
