"""Retry/backoff unit tests for the S1 HTTP fetcher against a live
local HTTP server (no external network)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from document_query_system_spark.sources.http_ingest import (
    fetch_to_landing,
    fetch_with_retry,
)

BODY = b"hello landing"


class _Handler(BaseHTTPRequestHandler):
    fail_counts: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 (stdlib naming)
        remaining = self.fail_counts.get(self.path, 0)
        if self.path == "/missing":
            self.send_error(404)
            return
        if remaining > 0:
            self.fail_counts[self.path] = remaining - 1
            self.send_error(503)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(BODY)))
        self.end_headers()
        self.wfile.write(BODY)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_ok_first_try(server):
    payload, status, attempts = fetch_with_retry(f"{server}/ok", backoff_sec=0.01)
    assert payload == BODY and status == 200 and attempts == 1


def test_fetch_retries_transient_5xx(server):
    _Handler.fail_counts["/flaky"] = 2
    payload, status, attempts = fetch_with_retry(
        f"{server}/flaky", max_retries=3, backoff_sec=0.01
    )
    assert payload == BODY and status == 200 and attempts == 3


def test_fetch_exhausts_retries(server):
    _Handler.fail_counts["/down"] = 99
    payload, status, attempts = fetch_with_retry(
        f"{server}/down", max_retries=2, backoff_sec=0.01
    )
    assert payload is None and status == 503 and attempts == 3


def test_fetch_fails_fast_on_404(server):
    payload, status, attempts = fetch_with_retry(
        f"{server}/missing", max_retries=3, backoff_sec=0.01
    )
    assert payload is None and status == 404 and attempts == 1


def test_fetch_transport_error_retries():
    # unroutable port on localhost → URLError each attempt
    payload, status, attempts = fetch_with_retry(
        "http://127.0.0.1:1/none", max_retries=1, backoff_sec=0.01, timeout_sec=0.2
    )
    assert payload is None and status == -1 and attempts == 2


def test_fetch_to_landing_manifest(server, tmp_path):
    _Handler.fail_counts["/f2"] = 99
    manifest = fetch_to_landing(
        [("a.bin", f"{server}/f1"), ("b.bin", f"{server}/f2")],
        str(tmp_path),
        max_retries=1,
        backoff_sec=0.01,
    )
    by_name = {m["file_name"]: m for m in manifest}
    assert by_name["a.bin"]["n_bytes"] == len(BODY)
    assert len(by_name["a.bin"]["sha256"]) == 64
    assert by_name["b.bin"]["n_bytes"] == -1
    assert (tmp_path / "a.bin").exists() and not (tmp_path / "b.bin").exists()


def test_fetch_to_landing_replaces_stale_dir(server, tmp_path):
    """A landing dir is defined by its manifest: files from an earlier
    interrupted/different run under the same dir must not survive into
    the downstream binaryFile scan (round-2 advisor finding)."""
    (tmp_path / "stale.bin").write_bytes(b"left over from a previous run")
    fetch_to_landing(
        [("a.bin", f"{server}/f1")], str(tmp_path),
        max_retries=1, backoff_sec=0.01,
    )
    assert (tmp_path / "a.bin").exists()
    assert not (tmp_path / "stale.bin").exists()
