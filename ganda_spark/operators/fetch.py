"""F1-F5: the fetch stage — Spark's "join with the outside world".

The reference runs N goroutines pulling from a channel, each with a pooled
HTTP client, retrying ≥500/transport errors with capped exponential backoff
and dropping exhausted rows from results
(requests/requests.go:41-124; retry rule :99-101, cap :117-121,
drop :75-79,113-115).

Spark re-expression (SURVEY.md §2.2):
  * worker fan-out  → repartition(P) + mapInPandas — one task = one worker
    pool, parallelism = partitions × cores, not goroutines (F1).
  * pooled client   → ONE session object per partition, created when the
    task starts and reused across the whole Arrow batch stream (F2). In the
    sandbox there is no network, so the "session" is a MockSession whose
    responses are a pure function of md5(url) (ganda_spark/spec.py) —
    swap in an aiohttp/requests session for production.
  * retry loop      → inside the UDF for intra-batch retries (same rule
    table); exhausted rows come back with error set, and the caller routes
    them to an errors DataFrame instead of results (F3/F4). Deferred-row
    re-queue across generations lives in streaming/frontier_loop.py.
  * throttle        → per-partition token budget = throttle/P per batch
    (F5); the driver-side release cap lives in operators/politeness.py.

Two implementations, identical output:
  * mock_fetch_plan — pure Column expressions (whole-stage codegen; this is
    the oracle-matched fast path and an upper bound for the bench).
  * mock_fetch_udf  — the real architecture: mapInPandas with a
    per-partition session, vectorized numpy status draws, a virtual clock
    for latency/backoff accounting (no real sleeps in tests).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ganda_spark import spec
from ganda_spark.config import EngineConfig

FETCH_RESULT_FIELDS = (
    "status INT, body STRING, attempts INT, fetch_error STRING, "
    "latency_ms BIGINT"
)


def _out_schema(df: DataFrame) -> str:
    base = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return base + ", " + FETCH_RESULT_FIELDS


# ---------------------------------------------------------------------------
# Column-expression implementation (oracle-matched fast path)
# ---------------------------------------------------------------------------


def mock_fetch_plan(frontier: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Mock fetch as pure Catalyst expressions.

    Adds: status, body, attempts, fetch_error, latency_ms. Rows whose
    retries exhausted carry fetch_error != NULL — callers exclude them from
    results (requests/requests.go:75-79) but keep them as data (our errors
    superset)."""
    o = spec.fetch_outcome_sql("spark", url_expr="url", retries=cfg.retries)
    body = (
        F.when(
            F.expr(o["status_final"]) == 200,
            F.expr(spec.echo_body_sql("spark", "url", "host", cfg.request_method)),
        )
        .otherwise(F.lit(""))
    )
    err = F.when(
        F.expr(o["dropped"]),
        F.lit(
            f"maximum number of retries ({cfg.retries}) reached for request"
        ),  # requests/requests.go:114
    )
    return (
        frontier.withColumn("status", F.expr(o["status_final"]).cast("int"))
        .withColumn("body", body)
        .withColumn("attempts", F.expr(o["attempts"]).cast("int"))
        .withColumn("fetch_error", err)
        .withColumn("latency_ms", F.expr(o["latency_ms"]).cast("bigint"))
    )


# ---------------------------------------------------------------------------
# mapInPandas implementation (the production architecture)
# ---------------------------------------------------------------------------


class MockSession:
    """Stands in for a pooled HTTP client (reference requests/requests.go:
    21-39: 500 idle conns, 50 conns/host, HTTP/2). Created ONCE per
    partition — the Spark analog of per-goroutine client reuse. Responses
    are a pure function of md5(url), matching ganda_spark.spec exactly.
    """

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.virtual_clock_ms = 0.0  # accumulates simulated latency + backoff

    @staticmethod
    def _draws(urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        d = np.empty(len(urls), dtype=np.int64)
        lat = np.empty(len(urls), dtype=np.int64)
        for i, u in enumerate(urls):
            h = hashlib.md5(u.encode()).hexdigest()
            d[i] = int(h[:4], 16) % 100
            lat[i] = 1 + int(
                h[spec.LATENCY_HEX_OFFSET - 1 : spec.LATENCY_HEX_OFFSET + 2], 16
            ) % spec.LATENCY_MOD
        return d, lat

    def fetch_batch(self, urls: pd.Series, hosts: pd.Series) -> pd.DataFrame:
        """Vectorized fetch-with-retry over one Arrow batch.

        Retry rule table (requests/requests.go:83-124): status <500 returns
        immediately (404 NOT retried, :99-101); ≥500/transport retries with
        delay = base * 2^attempt capped at 30 s (:117-121); attempts >
        retries ⇒ error (:113-115).
        """
        cfg = self.cfg
        d, lat = self._draws(urls)
        n = len(urls)

        status = np.where(
            d < spec.PCT_OK, 200, np.where(d < spec.PCT_NOT_FOUND, 404, 500)
        )
        attempts = np.ones(n, dtype=np.int64)
        # virtual time: every request "takes" its latency
        self.virtual_clock_ms += float(lat.sum())

        retryable = status >= 500  # 4xx never retried
        for attempt in range(1, cfg.retries + 1):
            if not retryable.any():
                break
            delay = min(
                cfg.base_retry_delay_millis * (1 << attempt),
                spec.RETRY_DELAY_CAP_MS,
            )
            self.virtual_clock_ms += delay * int(retryable.sum())
            # transient rows (d in [PCT_NOT_FOUND, PCT_TRANSIENT)) succeed on
            # their second attempt; d == PCT_TRANSIENT.. stay 500 forever
            heals = retryable & (d < spec.PCT_TRANSIENT)
            status = np.where(heals, 200, status)
            attempts = np.where(retryable, attempts + 1, attempts)
            self.virtual_clock_ms += float(lat[retryable].sum())
            retryable = retryable & ~heals

        exhausted = status >= 500
        error = pd.Series([None] * n, dtype=object)
        error[exhausted] = (
            f"maximum number of retries ({cfg.retries}) reached for request"
        )
        body = pd.Series([""] * n, dtype=object)
        ok = status == 200
        if ok.any():
            method = cfg.request_method
            body[ok] = [
                spec.echo_body_py(u, h, method)
                for u, h in zip(urls[ok], hosts[ok])
            ]
        return pd.DataFrame(
            {
                "status": status.astype("int32"),
                "body": body,
                "attempts": attempts.astype("int32"),
                "fetch_error": error,
                "latency_ms": lat,
            }
        )


def mock_fetch_udf(frontier: DataFrame, cfg: EngineConfig) -> DataFrame:
    """F1: repartition to the worker count, then mapInPandas with a
    per-partition MockSession. Output schema = input + fetch columns,
    identical to mock_fetch_plan."""
    out_schema = _out_schema(frontier)
    in_cols = [f.name for f in frontier.schema]

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        session = MockSession(cfg)  # once per task == per-goroutine client
        for pdf in batches:
            res = session.fetch_batch(pdf["url"], pdf["host"])
            yield pd.concat(
                [pdf[in_cols].reset_index(drop=True), res], axis=1
            )

    parts = max(1, cfg.request_workers)
    return frontier.repartition(parts).mapInPandas(fetch_partition, out_schema)


def split_results(fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(results, errors): exhausted-retry rows are excluded from the result
    stream (requests/requests.go:75-79) but kept as an errors DataFrame —
    a deliberate superset of the reference, which only logs them."""
    results = fetched.where(F.col("fetch_error").isNull())
    errors = fetched.where(F.col("fetch_error").isNotNull())
    return results, errors
