"""Host-graph PageRank (operators/graph.py): hand-computed fixed points,
engine-reproducibility, cache hygiene."""

import pyspark.sql.functions as F
import pytest

from ganda_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_star_graph_hand_computed(spark):
    """4 leaves → center, 1 iteration: center = 150000 + 4·(10^6·8500 //
    10^4) = 3,550,000; leaves (no in-edges) = base 150,000."""
    e = _edges(spark, [(f"leaf{i}", "center") for i in range(4)])
    r = {row.node: row.rank_ppm for row in pagerank(e, iterations=1).collect()}
    assert r["center"] == 3_550_000
    assert all(r[f"leaf{i}"] == 150_000 for i in range(4))
    # more iterations keep the center on top
    r3 = {row.node: row.rank_ppm for row in pagerank(e, iterations=3).collect()}
    assert r3["center"] > r3["leaf0"]


def test_ring_is_fixed_point(spark):
    """On a cycle every node has outdeg 1 and one in-edge, so rank stays
    exactly at the initial 1,000,000 ppm: 150000 + 10^6·8500//10^4."""
    n = 5
    e = _edges(spark, [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)])
    for iters in (1, 4):
        ranks = pagerank(e, iterations=iters).collect()
        assert {row.rank_ppm for row in ranks} == {1_000_000}


def test_repartition_invariance_and_determinism(spark):
    """Integer arithmetic makes ranks bit-identical across partitionings
    and reruns — the engine-reproducibility contract."""
    import random

    rng = random.Random(7)
    pairs = list({(f"h{rng.randrange(30)}", f"h{rng.randrange(30)}") for _ in range(200)})
    e = _edges(spark, pairs)
    a = sorted((row.node, row.rank_ppm) for row in pagerank(e, iterations=3).collect())
    b = sorted(
        (row.node, row.rank_ppm)
        for row in pagerank(e.repartition(13), iterations=3).collect()
    )
    assert a == b


def test_dangling_and_source_nodes(spark):
    """A pure sink (no out-edges) still gets ranked; a pure source ends at
    base rank; total node set = src ∪ dst."""
    e = _edges(spark, [("a", "b"), ("b", "c")])  # c dangles, a is a source
    r = {row.node: row.rank_ppm for row in pagerank(e, iterations=2).collect()}
    assert set(r) == {"a", "b", "c"}
    assert r["a"] == 150_000
    assert r["c"] > r["a"]


def test_cache_out_and_jvm_only_plan(spark):
    e = _edges(spark, [("a", "b"), ("b", "a")])
    caches = []
    df = pagerank(e, iterations=2, cache_out=caches)
    df.collect()
    assert len(caches) == 1 and caches[0].is_cached
    caches[0].unpersist()
    assert not caches[0].is_cached
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tiered_pop_composition(spark, sf_dir):
    """Tier crawl: PageRank tiers the 37 frontier hosts 13/12/12, budgets
    6/3/1 bound every host's release count."""
    import __spark_entry__ as entry

    rows = entry.queries()["crawl_tiered_pop"](spark, sf_dir).collect()
    assert len(rows) == 37
    from collections import Counter

    sizes = Counter(r.tier for r in rows)
    assert (sizes[1], sizes[2], sizes[3]) == (13, 12, 12)
    for r in rows:
        assert r.budget == {1: 6, 2: 3, 3: 1}[r.tier]
        assert 0 < r.n_released <= r.budget


def test_validation(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError, match="damping_bp"):
        pagerank(e, damping_bp=0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=0)
