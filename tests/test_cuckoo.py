"""Cuckoo-filter seen set: no false negatives (the crawl-loop invariant),
retraction support, treeAggregate merge, bounded false positives."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from ganda_spark.operators.cuckoo import CuckooFilter, build_cuckoo
from ganda_spark.sources.frontier import seed_frontier


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)


def test_no_false_negatives():
    f = CuckooFilter(1 << 12)
    h = _hashes(8000)  # ~50% load at 4 slots
    f.add_hashes(h)
    assert f.might_contain(h).all()


def test_false_positive_rate_bounded():
    f = CuckooFilter(1 << 12)
    f.add_hashes(_hashes(8000, seed=1))
    probe = _hashes(20000, seed=2)
    fp_rate = f.might_contain(probe).mean()
    assert fp_rate < 0.01  # 16-bit fingerprints, 2 buckets × 4 slots


def test_delete_makes_url_fetchable_again():
    f = CuckooFilter(1 << 10)
    h = _hashes(500, seed=3)
    f.add_hashes(h)
    victim = h[:100]
    f.delete_hashes(victim)
    # deleted hashes mostly gone (some may persist as FP of survivors)
    assert f.might_contain(victim).mean() < 0.05
    assert f.might_contain(h[100:]).all()  # survivors untouched


def test_overflow_never_loses_membership():
    f = CuckooFilter(1 << 4)  # 64 slots — force overflow
    h = _hashes(400, seed=4)
    f.add_hashes(h)
    assert len(f.overflow) > 0
    assert f.might_contain(h).all()


def test_merge_is_union():
    a, b = CuckooFilter(1 << 10), CuckooFilter(1 << 10)
    ha, hb = _hashes(1000, seed=5), _hashes(1000, seed=6)
    a.add_hashes(ha)
    b.add_hashes(hb)
    merged = a.merge(b)
    assert merged.might_contain(ha).all()
    assert merged.might_contain(hb).all()


def test_build_cuckoo_from_dataframe(spark, sf_dir):
    frontier = seed_frontier(spark, sf_dir)
    seen = frontier.where(F.col("seq") % 3 == 0).select("url")
    cf = build_cuckoo(seen.repartition(8), n_buckets=1 << 14)
    from ganda_spark.functions.urls import url_hash64

    seen_h = np.array(
        [r[0] for r in seen.select(url_hash64(F.col("url"))).collect()],
        dtype=np.int64,
    )
    unseen_h = np.array(
        [r[0] for r in frontier.where(F.col("seq") % 3 != 0)
         .select(url_hash64(F.col("url"))).collect()],
        dtype=np.int64,
    )
    assert cf.might_contain(seen_h).all()          # no false negatives
    assert cf.might_contain(unseen_h).mean() < 0.01  # bounded FP
