"""Fetch-stage semantics: retry rule table (requests/requests.go:83-124),
plan/UDF equivalence, worker-pool set-equality (requests/requests_test.go:
131-165), and ordering contract (tour cell 39: W=1 ⇒ output order = input).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ganda_spark import spec
from ganda_spark.config import EngineConfig
from ganda_spark.operators.fetch import mock_fetch_plan, mock_fetch_udf, split_results
from ganda_spark.sources.frontier import seed_frontier


@pytest.fixture(scope="module")
def frontier(spark, sf_dir):
    return seed_frontier(spark, sf_dir).cache()


def test_frontier_shape(frontier):
    rows = frontier.limit(5).collect()
    assert {r["host"].startswith("host-") for r in rows} == {True}
    hot = frontier.where(F.col("host") == "host-0.test").count()
    total = frontier.count()
    assert hot / total > 0.2  # skewed: hot host ≳ 24%


def test_plan_udf_equivalence(frontier):
    """The Catalyst-expression fetch and the mapInPandas fetch must agree
    row-for-row — this pins the UDF to the shared spec."""
    cfg = EngineConfig(retries=1, request_workers=8)
    a = mock_fetch_plan(frontier, cfg).select(
        "url", "status", "body", "attempts", "fetch_error"
    )
    b = mock_fetch_udf(frontier, cfg).select(
        "url", "status", "body", "attempts", "fetch_error"
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_retry_rule_table(spark):
    """Pin the four outcome classes against hand-computed md5 draws
    (mirrors cli/cli_test.go:51-137 count assertions)."""
    import hashlib

    cfg = EngineConfig(retries=2, request_workers=2)
    # find one url per class deterministically
    classes = {}
    i = 0
    while len(classes) < 4 and i < 200_000:
        url = f"http://host-1.test/order/{i}"
        d = int(hashlib.md5(url.encode()).hexdigest()[:4], 16) % 100
        key = (
            "ok" if d < spec.PCT_OK
            else "notfound" if d < spec.PCT_NOT_FOUND
            else "transient" if d < spec.PCT_TRANSIENT
            else "persistent"
        )
        classes.setdefault(key, url)
        i += 1
    df = spark.createDataFrame(
        [(i, u, "host-1.test", 0) for i, u in enumerate(classes.values())],
        "seq long, url string, host string, priority int",
    )
    out = {r["url"]: r for r in mock_fetch_udf(df, cfg).collect()}
    ok = out[classes["ok"]]
    assert (ok["status"], ok["attempts"], ok["fetch_error"]) == (200, 1, None)
    nf = out[classes["notfound"]]
    # 4xx never retried (requests/requests.go:99-101)
    assert (nf["status"], nf["attempts"], nf["fetch_error"]) == (404, 1, None)
    tr = out[classes["transient"]]
    assert (tr["status"], tr["attempts"], tr["fetch_error"]) == (200, 2, None)
    pe = out[classes["persistent"]]
    # retries exhausted: attempts = retries+1, error set, dropped from results
    assert pe["status"] == 500 and pe["attempts"] == cfg.retries + 1
    assert "maximum number of retries (2)" in pe["fetch_error"]

    results, errors = split_results(mock_fetch_udf(df, cfg))
    assert results.count() == 3 and errors.count() == 1


def test_zero_retries_drops_all_5xx(spark):
    cfg = EngineConfig(retries=0)
    df = spark.createDataFrame(
        [(i, f"http://h.test/{i}", "h.test", 0) for i in range(500)],
        "seq long, url string, host string, priority int",
    )
    fetched = mock_fetch_udf(df, cfg)
    results, errors = split_results(fetched)
    assert results.where(F.col("status") >= 500).count() == 0
    assert errors.count() == fetched.where(F.col("status") >= 500).count()


def test_worker_pool_set_equality(frontier):
    """Same result set at any parallelism (requests/requests_test.go:131-165:
    responses arrive unordered but complete)."""
    sample = frontier.limit(300)
    one = mock_fetch_udf(sample, EngineConfig(request_workers=1, retries=1))
    many = mock_fetch_udf(sample, EngineConfig(request_workers=16, retries=1))
    cols = ["url", "status", "body", "attempts"]
    assert one.select(cols).exceptAll(many.select(cols)).isEmpty()
    assert many.select(cols).exceptAll(one.select(cols)).isEmpty()


def test_w1_ordering_contract(frontier):
    """W=1: output order == input (seq) order after orderBy — the engine's
    ordering contract strengthens ganda's (deterministic at any P via seq)."""
    cfg = EngineConfig(request_workers=1, retries=1)
    out = mock_fetch_udf(frontier.limit(100), cfg)
    seqs = [r["seq"] for r in out.orderBy("seq").collect()]
    assert seqs == sorted(seqs)


def test_context_passthrough(frontier):
    """P4: context rides source→sink untouched (parser/parser.go:83,
    requests/requests.go:94-97)."""
    cfg = EngineConfig(retries=1)
    out = mock_fetch_udf(frontier.limit(50), cfg)
    src = {r["seq"]: r["context"] for r in frontier.limit(50).collect()}
    dst = {r["seq"]: r["context"] for r in out.collect()}
    assert src == dst
