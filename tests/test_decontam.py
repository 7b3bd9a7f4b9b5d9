"""Benchmark decontamination (operators/decontam): planted full/partial
overlap, short-doc guards, broadcast-join plan shape."""

import pyspark.sql.functions as F

from ganda_spark.operators.decontam import decontaminate, ngram_col


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_overlap_levels(spark):
    bench = _df(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _df(
        spark,
        [
            # exact copy: every 5-gram hits
            (1, "the quick brown fox jumps over the lazy dog"),
            # shares exactly one 5-gram window ("quick brown fox jumps over")
            (2, "sly quick brown fox jumps over walls daily"),
            (3, "completely unrelated words fill this entire document here"),
        ],
    )
    r = {row.doc_id: row for row in decontaminate(corpus, bench, n=5).collect()}
    assert r[1].contaminated and r[1].hit_bp == 10000
    assert r[1].n_hit_ngrams == r[1].n_doc_ngrams == 5
    # doc 2: 8 words -> 4 distinct 5-grams, 1 hit -> 2500 bp
    assert r[2].contaminated and (r[2].n_hit_ngrams, r[2].hit_bp) == (1, 2500)
    assert not r[3].contaminated and r[3].n_hit_ngrams == 0 and r[3].hit_bp == 0


def test_short_docs_no_ngrams(spark):
    """Docs under n words carry zero n-grams — no sequence(1,0) descending
    trap, no div-by-zero in hit_bp."""
    bench = _df(spark, [(100, "a b c d e")])
    corpus = _df(spark, [(1, "a b c d"), (2, "a")])
    r = {row.doc_id: row for row in decontaminate(corpus, bench, n=5).collect()}
    for i in (1, 2):
        assert (r[i].n_doc_ngrams, r[i].n_hit_ngrams, r[i].hit_bp) == (0, 0, 0)
        assert not r[i].contaminated


def test_repeated_ngrams_count_once(spark):
    """Doc n-grams are DISTINCT before the join — a doc repeating one
    benchmark 5-gram three times still counts a single hit."""
    bench = _df(spark, [(100, "one two three four five")])
    corpus = _df(
        spark,
        [(1, "one two three four five one two three four five one two three four five")],
    )
    row = decontaminate(corpus, bench, n=5).collect()[0]
    # 15 words -> 11 gram windows but only 5 DISTINCT (cyclic shifts of
    # the phrase); exactly one of them is the benchmark gram, counted once
    assert (row.n_doc_ngrams, row.n_hit_ngrams) == (5, 1)
    assert row.hit_bp == 2000


def test_ngram_col_values(spark):
    out = spark.range(1).select(
        ngram_col("'a b c d'", 3).alias("g")
    ).collect()[0].g
    assert out == ["a b c", "b c d"]


def test_bench_side_broadcast_plan(spark):
    bench = _df(spark, [(100, "a b c d e")])
    corpus = _df(spark, [(1, "a b c d e f")])
    out = decontaminate(corpus, bench, n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus never shuffles to meet bench
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_variant_equals_exact(spark, sf_dir):
    """decontaminate_bloom must equal decontaminate row-for-row — even
    with a DELIBERATELY tiny bitmap (high false-positive rate) the exact
    verify join removes every FP, and no-false-negatives means no hit is
    ever lost."""
    from ganda_spark.operators.decontam import decontaminate_bloom

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("doc_id", F.col("doc_id").cast("long"))
    )
    bench = docs.filter("doc_id % 7 = 0")
    corpus = docs.filter("doc_id % 7 != 0")
    cols = ["doc_id", "n_doc_ngrams", "n_hit_ngrams", "hit_bp", "contaminated"]
    exact = decontaminate(corpus, bench, n=3).select(*cols)
    # 2^10 bits for thousands of grams -> FP rate near 1: worst case
    tiny = decontaminate_bloom(
        corpus, bench, n=3, n_bits=1 << 10, n_hashes=2
    ).select(*cols)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, tiny.collect())
    )
    # and with a realistic bitmap
    real = decontaminate_bloom(corpus, bench, n=3, n_bits=1 << 20).select(*cols)
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, real.collect())
    )


def test_bloom_variant_planted(spark):
    from ganda_spark.operators.decontam import decontaminate_bloom

    bench = _df(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words fill this entire document here"),
        ],
    )
    r = {
        row.doc_id: row
        for row in decontaminate_bloom(corpus, bench, n=5).collect()
    }
    assert r[1].contaminated and r[1].hit_bp == 10000
    assert not r[2].contaminated
