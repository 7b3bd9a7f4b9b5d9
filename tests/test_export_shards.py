"""Ordered shard export (operators/sampling.export_ordered_shards) — the
two-level prefix sum against a naive Python cumsum, bucket-count plan
invariance, key-ordered shard ranges, NULL-size and oversized-row
semantics, empty input, manifest partitioning-invariance, and arg guards."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from ganda_spark.operators.sampling import export_ordered_shards, shard_manifest

ROWS = [
    # (doc_id, size) — deliberately non-contiguous keys, a NULL size,
    # and one row (id 50) bigger than the whole shard budget
    (3, 100), (7, 250), (11, None), (12, 75), (20, 300),
    (21, 10), (35, 120), (50, 900), (51, 40), (90, 60), (91, 5),
]
BUDGET = 400


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, nbytes long")


def _naive(rows, budget):
    out, cum = {}, 0
    for k, sz in sorted(rows):
        out[k] = cum // budget
        cum += sz or 0
    return out


def _got(df, **kw):
    kw.setdefault("shard_bytes", BUDGET)
    sharded = export_ordered_shards(df, size_col="nbytes", **kw)
    return {r.doc_id: r.shard_id for r in sharded.collect()}


def test_matches_naive_cumsum(spark):
    assert _got(_df(spark), buckets=4) == _naive(ROWS, BUDGET)


def test_bucket_count_is_plan_only(spark):
    df = _df(spark)
    a = _got(df, buckets=1)
    for b in (2, 7, 64):
        assert _got(df, buckets=b) == a


def test_shards_are_key_ordered(spark):
    sharded = export_ordered_shards(
        _df(spark), size_col="nbytes", shard_bytes=BUDGET, buckets=3
    )
    rng = {
        r.shard_id: (r.min_key, r.max_key)
        for r in shard_manifest(sharded, size_col="nbytes").collect()
    }
    ids = sorted(rng)
    for a, b in zip(ids, ids[1:]):
        assert rng[a][1] < rng[b][0]  # no key interleaving across shards


def test_oversized_row_owns_following_boundary(spark):
    got = _got(_df(spark), buckets=2)
    # id 50 (900 bytes) starts in some shard s; id 51 must land >= s+2
    assert got[51] - got[50] >= 2


def test_empty_input(spark):
    df = _df(spark).where(F.lit(False))
    sharded = export_ordered_shards(df, size_col="nbytes", shard_bytes=BUDGET)
    assert sharded.count() == 0
    assert "shard_id" in sharded.columns


def test_manifest_partitioning_invariant(spark):
    df = _df(spark)
    base = export_ordered_shards(
        df, size_col="nbytes", shard_bytes=BUDGET, buckets=4
    )
    m1 = {
        r.shard_id: (r.n_docs, r.total_bytes, r.content_fp)
        for r in shard_manifest(base, size_col="nbytes").collect()
    }
    m2 = {
        r.shard_id: (r.n_docs, r.total_bytes, r.content_fp)
        for r in shard_manifest(
            base.repartition(13), size_col="nbytes"
        ).collect()
    }
    assert m1 == m2 and len(m1) >= 2


def test_arg_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="shard_bytes"):
        export_ordered_shards(df, size_col="nbytes", shard_bytes=0)
    with pytest.raises(ValueError, match="buckets"):
        export_ordered_shards(
            df, size_col="nbytes", shard_bytes=BUDGET, buckets=0
        )
