"""F10: URL-seen set — exact anti-join oracle vs bloom candidate filter."""

from __future__ import annotations

import pyspark.sql.functions as F

from ganda_spark.operators.seen import (
    build_bloom,
    filter_unseen_bloom,
    filter_unseen_exact,
)
from ganda_spark.sources.frontier import seed_frontier


def test_exact_antijoin(spark, sf_dir):
    frontier = seed_frontier(spark, sf_dir)
    seen = frontier.where(F.col("seq") % 3 == 0).select("url")
    unseen = filter_unseen_exact(frontier, seen)
    assert unseen.count() == frontier.where(F.col("seq") % 3 != 0).count()
    # no seen url survives
    assert unseen.join(seen, "url", "inner").count() == 0


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom result ⊆ exact result; every withheld row is genuinely seen OR
    a bounded false positive — never a lost unseen row fetched twice."""
    frontier = seed_frontier(spark, sf_dir)
    seen = frontier.where(F.col("seq") % 3 == 0).select("url")
    bloom = build_bloom(seen, n_bits=1 << 20, n_hashes=5)
    exact = filter_unseen_exact(frontier, seen).select("url")
    bloom_out = filter_unseen_bloom(frontier, bloom).select("url")
    # subset: bloom never passes a seen url
    assert bloom_out.exceptAll(exact).count() == 0
    # false-positive rate bounded (m/n generous here → expect ≈0)
    n_exact, n_bloom = exact.count(), bloom_out.count()
    assert n_bloom >= n_exact * 0.98


def test_bloom_arrow_and_tree_builds_agree(spark, sf_dir):
    """The Arrow-collect build and the treeAggregate build must produce
    bit-identical bitmaps (same hashes, same probes)."""
    import numpy as np

    from ganda_spark.operators.seen import build_bloom_tree

    seen = seed_frontier(spark, sf_dir).limit(500).select("url")
    a = build_bloom(seen, n_bits=1 << 18, n_hashes=5)
    b = build_bloom_tree(seen, n_bits=1 << 18, n_hashes=5)
    assert np.array_equal(a.bits, b.bits)


def test_bloom_merge_is_union(spark, sf_dir):
    frontier = seed_frontier(spark, sf_dir).limit(400)
    a = frontier.where(F.col("seq") % 2 == 0).select("url")
    b = frontier.where(F.col("seq") % 2 == 1).select("url")
    bloom_a = build_bloom(a, n_bits=1 << 18)
    bloom_b = build_bloom(b, n_bits=1 << 18)
    merged = bloom_a.union(bloom_b)
    out = filter_unseen_bloom(frontier, merged)
    assert out.count() == 0  # everything is seen in the union


def test_hybrid_equals_exact_even_with_false_positives(spark, sf_dir):
    """filter_unseen_hybrid == filter_unseen_exact by construction: the
    exact join sees every row the bloom could be wrong about. Forced here
    with a DELIBERATELY tiny bitmap (256 bits vs thousands of urls → the
    bloom is almost all ones, nearly every row flagged maybe-seen)."""
    from ganda_spark.operators.seen import build_bloom, filter_unseen_hybrid

    frontier = seed_frontier(spark, sf_dir)
    seen = frontier.where(F.col("seq") % 3 == 0).select("url")
    tiny = build_bloom(seen, n_bits=256, n_hashes=3)
    exact = {r[0] for r in filter_unseen_exact(frontier, seen).select("url").collect()}
    hybrid = [r[0] for r in filter_unseen_hybrid(frontier, seen, tiny).select("url").collect()]
    assert len(hybrid) == len(set(hybrid))  # branches are disjoint
    assert set(hybrid) == exact
    # and with a WELL-SIZED bloom the result is still identical while the
    # shuffle branch carries only the truly-seen + ε rows
    good = build_bloom(seen, n_bits=1 << 20, n_hashes=5)
    hybrid2 = {r[0] for r in filter_unseen_hybrid(frontier, seen, good).select("url").collect()}
    assert hybrid2 == exact


def test_hybrid_empty_bloom_and_empty_seen(spark, sf_dir):
    """Generation 0 shape: empty bloom + empty seen table → everything is
    sure-unseen, nothing shuffles, nothing is lost."""
    from ganda_spark.operators.seen import BloomFilter, filter_unseen_hybrid

    frontier = seed_frontier(spark, sf_dir).limit(200)
    empty_seen = spark.createDataFrame([], "url string")
    bloom = BloomFilter(1 << 16, 5)
    out = filter_unseen_hybrid(frontier, empty_seen, bloom)
    assert out.count() == 200
