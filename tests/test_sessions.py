"""sessionize: gap-boundary exactness, determinism under parallelism, and
plan shape (every window partitioned by the user key)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from ganda_spark.operators.ranking import assert_no_global_window
from ganda_spark.operators.sessions import sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, e, T0 + dt.timedelta(seconds=s)) for u, e, s in rows],
        "user_id long, event_id long, ts timestamp",
    )


def test_gap_boundary_is_strict(spark):
    # gap == gap_s keeps the session; gap_s + 1 starts a new one
    ev = _ev(
        spark,
        [(1, 1, 0), (1, 2, 600), (1, 3, 1200), (1, 4, 1801 + 1200)],
    )
    out = {r.event_id: r.session_id for r in sessionize(ev, gap_s=600).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 2}


def test_microsecond_payload_does_not_flip_boundary(spark):
    # 600.9 s wall gap truncates to 600 — still the same session, exactly
    # as an engine comparing floor(epoch) would decide
    ev = spark.createDataFrame(
        [
            (1, 1, T0),
            (1, 2, T0 + dt.timedelta(seconds=600, microseconds=900_000)),
        ],
        "user_id long, event_id long, ts timestamp",
    )
    out = {r.event_id: r.session_id for r in sessionize(ev, gap_s=600).collect()}
    assert out == {1: 1, 2: 1}


def test_users_are_independent_and_order_is_total(spark):
    rows = [(u, e, u * 7 + e * 50) for u in (1, 2, 3) for e in range(40)]
    ev = _ev(spark, rows).repartition(16)  # destroy incidental order
    out = sessionize(ev, gap_s=49)
    # gap of 50 s with threshold 49 → every event its own session, per user
    got = {(r.user_id, r.event_id): r.session_id for r in out.collect()}
    for u in (1, 2, 3):
        for e in range(40):
            assert got[(u, e)] == e + 1


def test_sessionize_plan_partitions_by_user(spark):
    ev = _ev(spark, [(1, 1, 0), (2, 1, 5)])
    out = sessionize(ev, gap_s=10)
    assert_no_global_window(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
