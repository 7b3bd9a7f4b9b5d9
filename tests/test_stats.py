"""histogram_quantiles: exact nearest-rank percentiles over a bounded
domain, verified against a direct numpy computation, plus plan-shape
guarantees (the window runs over histogram rows partitioned by group —
never an unpartitioned pass over the data)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from ganda_spark.functions.stats import histogram_quantiles
from ganda_spark.operators.ranking import assert_no_global_window

PCTS = {"p50": 5000, "p95": 9500, "p99": 9900}


def _nearest_rank(values: list[int], bp: int) -> int:
    s = sorted(values)
    target = (len(s) * bp + 9999) // 10000
    return s[max(target, 1) - 1]


def test_histogram_quantiles_match_nearest_rank(spark):
    rng = random.Random(7)
    rows = [
        ("a" if i % 3 else "b", rng.randint(1, 200))
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "grp string, v int")
    got = {
        (r.grp, r.pct): (r.n, r.value)
        for r in histogram_quantiles(df, "v", ["grp"], PCTS).collect()
    }
    by_grp: dict[str, list[int]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        for label, bp in PCTS.items():
            assert got[(g, label)] == (len(vals), _nearest_rank(vals, bp)), (g, label)


def test_histogram_quantiles_tiny_groups_and_ties(spark):
    # group of one row: every percentile is that row; heavy ties resolve
    # to the same nearest-rank answer as the sorted list
    rows = [("solo", 42)] + [("ties", v) for v in [5] * 99 + [6]]
    df = spark.createDataFrame(rows, "grp string, v int")
    got = {
        (r.grp, r.pct): r.value
        for r in histogram_quantiles(df, "v", ["grp"], PCTS).collect()
    }
    assert all(got[("solo", p)] == 42 for p in PCTS)
    assert got[("ties", "p50")] == 5
    assert got[("ties", "p99")] == 5  # ceil(0.99*100)=99 → still the tie value


def test_histogram_quantiles_plan_is_partitioned(spark):
    rows = [("g", i % 50) for i in range(1000)]
    df = spark.createDataFrame(rows, "grp string, v int")
    out = histogram_quantiles(df, "v", ["grp"], PCTS)
    # no unpartitioned Window over data rows anywhere in the plan
    assert_no_global_window(out)
    # exactly one exchange over data (the histogram groupBy); the window
    # exchanges ride on the same hash partitioning of the tiny histogram
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
