"""Deterministic sampling + packing: reproducibility under repartition,
exact per-group cardinality, monotone sample nesting, bin-size bounds."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ganda_spark.operators.ranking import assert_no_global_window
from ganda_spark.operators.sampling import (
    pack_next_fit,
    sample_hash_col,
    stratified_take,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )


def test_stratified_take_exact_k_and_deterministic(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = stratified_take(docs, ["lang"], k=10, key_col="doc_id")
    per_group = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    sizes = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, n in per_group.items():
        assert n == min(10, sizes[lang])
    # repartitioning must not change the chosen set (hash order is total)
    again = stratified_take(docs.repartition(16), ["lang"], k=10, key_col="doc_id")
    assert {(r.doc_id, r.sample_rank) for r in out.collect()} == {
        (r.doc_id, r.sample_rank) for r in again.collect()
    }


def test_stratified_samples_nest(spark, sf_dir):
    """Rank-based sampling nests: the k=5 sample is a subset of the k=15
    sample — growing a dataset never reshuffles what was already chosen."""
    docs = _docs(spark, sf_dir)
    small = {r.doc_id for r in stratified_take(docs, ["lang"], 5, "doc_id").collect()}
    big = {r.doc_id for r in stratified_take(docs, ["lang"], 15, "doc_id").collect()}
    assert small < big


def test_hash_split_is_stable_and_roughly_sized(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    flagged = docs.select("doc_id", sample_hash_col("doc_id", 2000).alias("ho"))
    n = docs.count()
    k = flagged.where("ho").count()
    assert 0.1 * n < k < 0.3 * n  # 20% ± wide tolerance at sf0.001
    # same rows on re-evaluation from a different partitioning
    k2 = {r.doc_id for r in flagged.where("ho").collect()}
    k3 = {
        r.doc_id
        for r in docs.repartition(8)
        .select("doc_id", sample_hash_col("doc_id", 2000).alias("ho"))
        .where("ho")
        .collect()
    }
    assert k2 == k3


def test_holdout_split_independent_of_sampling_order(spark, sf_dir):
    """The split hash is SALTED, so the holdout rate over the stratified
    sample (rows chosen by the smallest unsalted md5 per group) matches the
    rate over the full population within binomial bounds — the r3 VERDICT
    wrong-by-construction fix. An UNSALTED flag would be evaluated on a
    hash-truncated population."""
    docs = _docs(spark, sf_dir)
    rate_bp = 2000  # 20%
    full = docs.select("doc_id", sample_hash_col("doc_id", rate_bp).alias("ho"))
    n_full = docs.count()
    p_full = full.where("ho").count() / n_full

    take = stratified_take(docs, ["lang"], k=200, key_col="doc_id")
    sampled = take.select("doc_id", sample_hash_col("doc_id", rate_bp).alias("ho"))
    n_samp = sampled.count()
    p_samp = sampled.where("ho").count() / n_samp

    # 4-sigma binomial tolerance on the sampled subset
    sigma = (0.2 * 0.8 / n_samp) ** 0.5
    assert abs(p_samp - p_full) < 4 * sigma

    # independence in the strongest form: the flag of a row does not depend
    # on whether the row sorts early in the UNSALTED hash order. Compare
    # holdout rate in the earliest-decile rows vs overall.
    decile = docs.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.md5(F.col("doc_id").cast("string")))),
    )
    early = decile.where(F.col("r") <= n_full // 10).select(
        "doc_id", sample_hash_col("doc_id", rate_bp).alias("ho")
    )
    n_e = n_full // 10
    p_early = early.where("ho").count() / n_e
    sigma_e = (0.2 * 0.8 / n_e) ** 0.5
    assert abs(p_early - p_full) < 4 * sigma_e


def test_pack_next_fit_bounds_and_coverage(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    budget = 500
    packed = pack_next_fit(docs, "n_tok", budget, ["lang"], key_col="doc_id")
    assert packed.count() == docs.count()  # every row assigned
    bins = packed.groupBy("lang", "bin_id").agg(
        F.sum("n_tok").alias("tot"), F.max("n_tok").alias("mx")
    )
    # next-fit bound: a bin exceeds the budget by less than its largest row
    assert bins.where(F.col("tot") >= budget + F.col("mx")).count() == 0
    # bins are contiguous ordinals 0..max per shard
    for r in bins.groupBy("lang").agg(
        F.min("bin_id").alias("lo"),
        F.max("bin_id").alias("hi"),
        F.countDistinct("bin_id").alias("nb"),
    ).collect():
        assert r.lo == 0 and r.nb == r.hi + 1
    # plan: windows partitioned by shard, nothing global, no python
    assert_no_global_window(packed)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def _mix_docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
    )


def test_mix_to_budget_quota_bounds(spark, sf_dir):
    from ganda_spark.operators.sampling import mix_to_budget

    docs = _mix_docs(spark, sf_dir)
    weights = {"src0": 5000, "src1": 3000, "src2": 2000}
    out = mix_to_budget(docs, weights, budget=1000, size_col="n_tokens")
    rows = out.collect()
    # only weighted sources appear
    assert {r.source for r in rows} <= set(weights)
    mass = {s: 0 for s in weights}
    max_row = {s: 0 for s in weights}
    for r in rows:
        mass[r.source] += r.n_tokens
        max_row[r.source] = max(max_row[r.source], r.n_tokens)
    avail = {
        r.source: r.tot
        for r in docs.groupBy("source").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    for s, bp in weights.items():
        quota = 1000 * bp // 10_000
        # next-fit: reaches the quota (when mass allows), overshoots by
        # less than one document
        assert mass[s] < quota + max_row[s]
        if avail[s] >= quota:
            assert mass[s] >= quota


def test_mix_to_budget_deterministic_under_repartition(spark, sf_dir):
    from ganda_spark.operators.sampling import mix_to_budget

    docs = _mix_docs(spark, sf_dir)
    weights = {"src3": 6000, "src4": 4000}
    a = mix_to_budget(docs, weights, budget=800, size_col="n_tokens")
    b = mix_to_budget(
        docs.repartition(13), weights, budget=800, size_col="n_tokens"
    )
    assert {(r.doc_id, r.mix_prev_cum) for r in a.collect()} == {
        (r.doc_id, r.mix_prev_cum) for r in b.collect()
    }


def test_mix_to_budget_shards_split_quota(spark, sf_dir):
    """shards=k sub-splits each source into k hash shards owning quota
    div k — same determinism, k-way parallel windows, bounded slack."""
    from ganda_spark.operators.sampling import mix_to_budget

    docs = _mix_docs(spark, sf_dir)
    weights = {"src0": 10_000}
    k = 4
    out = mix_to_budget(
        docs, weights, budget=1200, size_col="n_tokens", shards=k
    )
    rows = out.collect()
    shard_quota = 1200 * 10_000 // 10_000 // k
    assert all(r.mix_quota == shard_quota for r in rows)
    assert all(r.mix_prev_cum < shard_quota for r in rows)
    # reruns reproduce the exact shard assignment and mix
    again = mix_to_budget(
        docs, weights, budget=1200, size_col="n_tokens", shards=k
    )
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in again.collect()
    )
    import pytest

    with pytest.raises(ValueError, match="shards"):
        mix_to_budget(docs, weights, budget=10, size_col="n_tokens", shards=0)


def test_mix_auto_shards_equals_explicit(spark, sf_dir):
    """shards=None auto-derives the shard count from a per-source row
    bound (VERDICT r4 #5); auto and an explicitly passed equal count must
    produce IDENTICAL rows, and a generous bound must degenerate to the
    serial shards=1 form."""
    from ganda_spark.operators.sampling import mix_to_budget

    docs = _mix_docs(spark, sf_dir)
    weights = {"src0": 6000, "src1": 4000}
    n_max = max(
        r.n
        for r in docs.where(F.col("source").isin(list(weights)))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    bound = max(1, n_max // 3)
    k = -(-n_max // bound)
    assert k > 1  # the bound actually forces multi-shard
    auto = mix_to_budget(
        docs, weights, budget=1200, size_col="n_tokens",
        shards=None, auto_rows_per_shard=bound,
    )
    explicit = mix_to_budget(
        docs, weights, budget=1200, size_col="n_tokens", shards=k
    )
    assert sorted((r.doc_id, r.mix_quota) for r in auto.collect()) == sorted(
        (r.doc_id, r.mix_quota) for r in explicit.collect()
    )
    # generous bound → one shard → identical to the audit-simple form
    auto1 = mix_to_budget(
        docs, weights, budget=1200, size_col="n_tokens",
        shards=None, auto_rows_per_shard=10**9,
    )
    serial = mix_to_budget(
        docs, weights, budget=1200, size_col="n_tokens", shards=1
    )
    assert sorted((r.doc_id, r.mix_prev_cum) for r in auto1.collect()) == sorted(
        (r.doc_id, r.mix_prev_cum) for r in serial.collect()
    )


def test_take_best_per_group_cap(spark):
    from ganda_spark.operators.sampling import take_best

    rows = [
        # (doc_id, source, score) — src A: 4 docs incl. a score tie,
        # src B: 2 docs (under the cap)
        (1, "a", 50), (2, "a", 90), (3, "a", 70), (4, "a", 90),
        (5, "b", 10), (6, "b", 20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = take_best(
        df, group_cols=["source"], k=2, order_col="score", key_col="doc_id"
    )
    got = {r.doc_id: r.keep_rank for r in out.collect()}
    # src a keeps the two 90s; the tie breaks on doc_id ASC (2 before 4)
    assert got == {2: 1, 4: 2, 6: 1, 5: 2}
    # ascending keeps the WORST instead (holdout-style inversion)
    worst = take_best(
        df, group_cols=["source"], k=1, order_col="score",
        key_col="doc_id", descending=False,
    )
    assert sorted(r.doc_id for r in worst.collect()) == [1, 5]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must be"):
        take_best(df, ["source"], 0, "score", "doc_id")
