"""F1-F4 with a REAL HTTP client — the production fetch path.

Same contract as operators/fetch.py's mock (identical output schema and
retry rule table, requests/requests.go:83-124), but the per-task session
holds pooled `http.client` connections keyed by host with a per-host cap —
the Spark analog of the reference transport's MaxConnsPerHost=50
(requests/requests.go:29). Stdlib-only (the container has no requests/
aiohttp); swap the session class for an aiohttp pool on a real deployment
without touching the plan.

Used by the CLI (`python -m ganda_spark`) and the localhost-echoserver
integration tests; unit/oracle tests use the deterministic mock.
"""

from __future__ import annotations

import http.client
import time
import urllib.parse
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ganda_spark.config import EngineConfig, RETRY_DELAY_CAP_MS

RESULT_SCHEMA = (
    "struct<status:int,body:string,attempts:int,"
    "fetch_error:string,latency_ms:bigint>"
)


def canonical_mime_header_key(key: str) -> str:
    """Go net/http canonicalizes header keys (Title-Case per dash segment)
    before sending — pinned by the reference's header test
    (cli/cli_test.go:139-155)."""
    return "-".join(part.capitalize() for part in key.split("-"))


class HttpSession:
    """Pooled keep-alive connections, one pool per task (the per-goroutine
    client, requests/requests.go:21-39)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self._conns: dict[str, http.client.HTTPConnection] = {}

    def _conn(self, netloc: str) -> http.client.HTTPConnection:
        conn = self._conns.get(netloc)
        if conn is None:
            conn = http.client.HTTPConnection(
                netloc, timeout=self.cfg.connect_timeout_millis / 1000.0
            )
            self._conns[netloc] = conn
        return conn

    def close(self) -> None:
        for conn in self._conns.values():
            try:
                conn.close()
            except Exception:
                pass
        self._conns.clear()

    def _do_request(self, url: str, method: str, headers: dict, body) -> tuple[int, str]:
        parsed = urllib.parse.urlsplit(url)
        path = parsed.path or "/"
        if parsed.query:
            path += "?" + parsed.query
        conn = self._conn(parsed.netloc)
        hdrs = {
            canonical_mime_header_key(k): v
            for k, v in {"connection": "keep-alive", **headers}.items()
        }  # keep-alive default: parser/parser.go:216
        try:
            conn.request(method, path, body=body, headers=hdrs)
            resp = conn.getresponse()
            data = resp.read()
            return resp.status, data.decode("utf-8", errors="replace")
        except Exception:
            # poisoned connection: drop it so the retry dials fresh
            try:
                conn.close()
            finally:
                self._conns.pop(parsed.netloc, None)
            raise

    def fetch_one(self, url: str, method: str, headers: dict, body=None,
                  sleep=time.sleep) -> tuple[int, str, int, str | None, int]:
        """(status, body, attempts, error, latency_ms) under the reference
        retry rule: <500 returns immediately (4xx never retried,
        requests/requests.go:99-101); ≥500/transport error retries with
        delay = base*2^attempt capped at 30 s; exhaustion ⇒ error
        (:113-121)."""
        cfg = self.cfg
        t0 = time.monotonic()
        last_exc: str | None = None
        status, text = 0, ""
        for attempt in range(1, cfg.retries + 2):
            try:
                status, text = self._do_request(url, method, headers, body)
                last_exc = None
                if status < 500:
                    return (
                        status, text, attempt, None,
                        int((time.monotonic() - t0) * 1000),
                    )
            except Exception as exc:  # transport error — retryable
                last_exc = f"{type(exc).__name__}: {exc}"
            if attempt > cfg.retries:
                break
            delay_ms = min(
                cfg.base_retry_delay_millis * (1 << attempt), RETRY_DELAY_CAP_MS
            )
            sleep(delay_ms / 1000.0)
        err = (
            f"maximum number of retries ({cfg.retries}) reached for request"
            if last_exc is None
            else last_exc
        )
        return status, text, cfg.retries + 1, err, int((time.monotonic() - t0) * 1000)


def http_fetch_udf(frontier: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Real-HTTP fetch stage; plan shape identical to mock_fetch_udf.

    Honors per-row request specs when the input carries them (JSON-lines
    source, parser/parser.go:98-143): `method` overrides the default,
    `headers` (map, already merged static∪line) are sent as-is, a request
    `body` column is renamed to request_body and transmitted. The response
    body takes the `body` output column (envelope semantics downstream).
    """
    import json as _json

    from pyspark.sql.functions import pandas_udf

    src = frontier
    if "body" in src.columns:  # request body — free the name for the response
        src = src.withColumnRenamed("body", "request_body")

    method_col = (
        F.coalesce(F.col("method"), F.lit(cfg.request_method))
        if "method" in src.columns
        else F.lit(cfg.request_method)
    )
    headers_col = (
        F.to_json(F.col("headers"))
        if "headers" in src.columns
        else F.lit(_json.dumps(cfg.request_headers))
    )
    body_col = (
        F.col("request_body") if "request_body" in src.columns
        else F.lit(None).cast("string")
    )

    @pandas_udf(RESULT_SCHEMA)
    def fetch(
        it: Iterator[tuple[pd.Series, pd.Series, pd.Series, pd.Series]]
    ) -> Iterator[pd.DataFrame]:
        session = HttpSession(cfg)
        try:
            for urls, methods, headers_json, bodies in it:
                rows = [
                    session.fetch_one(
                        u,
                        m,
                        _json.loads(h) if h else {},
                        body=b if b is not None and len(b) > 0 else None,
                    )
                    for u, m, h, b in zip(urls, methods, headers_json, bodies)
                ]
                yield pd.DataFrame(
                    rows,
                    columns=["status", "body", "attempts", "fetch_error", "latency_ms"],
                ).astype({"status": "int32", "attempts": "int32", "latency_ms": "int64"})
        finally:
            session.close()

    fetch = fetch.asNondeterministic()  # network I/O; also avoids dup-eval
    fetched = src.withColumn("_r", fetch(F.col("url"), method_col, headers_col, body_col))
    return fetched.select(*[f.name for f in src.schema], "_r.*")
