"""Echo server — the reference's own test oracle re-implemented
(echoserver/echoserver.go:18-101): any route returns a JSON echo of the
request with the RequestEcho field order {time, id, remote_ip, host,
method, uri, user_agent, status, headers, request_body}; optional
per-request delay; stderr body-dump per request.

Stdlib ThreadingHTTPServer — used by the CLI subcommand
(`python -m ganda_spark echoserver`) and the http-fetch integration tests.

Test hooks (beyond the reference, for deterministic failure injection):
  /status/<code>          → responds with that status, empty body
  /flaky/<n>/<anything>   → 500 for the first n hits of that path, then 200
"""

from __future__ import annotations

import json
import threading
import time
from collections import defaultdict
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _request_echo(handler: "EchoHandler", body: bytes) -> dict:
    return {
        "time": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "id": "",
        "remote_ip": handler.client_address[0],
        "host": handler.headers.get("Host", ""),
        "method": handler.command,
        "uri": handler.path,
        "user_agent": handler.headers.get("User-Agent", ""),
        "status": 200,
        "headers": {k: v for k, v in handler.headers.items()},
        "request_body": body.decode("utf-8", errors="replace"),
    }


class EchoHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "ganda-spark-echo"
    delay_millis = 0
    flaky_counts: dict[str, int] = defaultdict(int)
    hits: dict[str, int] = defaultdict(int)
    flaky_lock = threading.Lock()
    silent = True

    def _respond(self, status: int, payload: bytes) -> None:
        self.send_response(status)
        self.send_header("Content-Type", "application/json; charset=UTF-8")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _handle(self) -> None:
        if self.delay_millis > 0:  # echoserver.go:47-50
            time.sleep(self.delay_millis / 1000.0)
        with self.flaky_lock:  # test hook: per-path request counter
            self.hits[self.path] += 1
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length) if length else b""

        parts = self.path.lstrip("/").split("/")
        if parts and parts[0] == "status" and len(parts) >= 2 and parts[1].isdigit():
            self._respond(int(parts[1]), b"")
            return
        if parts and parts[0] == "flaky" and len(parts) >= 2 and parts[1].isdigit():
            with self.flaky_lock:
                self.flaky_counts[self.path] += 1
                hit = self.flaky_counts[self.path]
            if hit <= int(parts[1]):
                self._respond(500, b"")
                return

        payload = json.dumps(_request_echo(self, body), separators=(",", ":")).encode()
        self._respond(200, payload)

    do_GET = do_POST = do_PUT = do_DELETE = do_PATCH = do_HEAD = _handle
    do_OPTIONS = do_TRACE = _handle

    def log_message(self, fmt, *args):  # stderr dump only when not silent
        if not self.silent:
            super().log_message(fmt, *args)


class Echoserver:
    """Start/stop wrapper mirroring echoserver.Echoserver's shutdown fn."""

    def __init__(self, port: int = 0, delay_millis: int = 0, silent: bool = True):
        handler = type(
            "BoundEchoHandler",
            (EchoHandler,),
            {"delay_millis": delay_millis, "silent": silent,
             "flaky_counts": defaultdict(int), "hits": defaultdict(int),
             "flaky_lock": threading.Lock()},
        )
        self._handler = handler
        self.server = ThreadingHTTPServer(("127.0.0.1", port), handler)
        self.port = self.server.server_address[1]
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def __enter__(self) -> "Echoserver":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()

    def shutdown(self) -> None:
        self.server.shutdown()
        self.server.server_close()

    def url_for(self, path: str) -> str:
        return f"http://127.0.0.1:{self.port}/{path.lstrip('/')}"

    @property
    def hits(self) -> dict[str, int]:
        """Per-path request counts (test hook: duplicate-request detector)."""
        return dict(self._handler.hits)
