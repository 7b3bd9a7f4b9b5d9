"""Gopher-style repetition filters (functions/text.repetition_metrics):
hand-computed fractions, degenerate shorts, gate semantics, JVM-only plan."""

import pyspark.sql.functions as F

from ganda_spark.functions.text import repetition_metrics


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_computed_fractions(spark):
    df = repetition_metrics(
        _docs(
            spark,
            [
                "a a a a",          # 0: fully repetitive
                "w x y z q r",      # 1: all distinct
                "a b a b a b",      # 2: alternating
            ],
        )
    )
    r = {row.doc_id: row for row in df.collect()}
    # doc 0: 4 words 1 distinct → (4-1)*1e4//4 = 7500; bigrams all 'a a'
    # (3/3 → 10000); trigrams 2, distinct 1 → 5000; under the gate floor
    assert (r[0].dup_word_bp, r[0].top_bigram_bp, r[0].dup_trigram_bp) == (
        7500, 10000, 5000,
    )
    assert r[0].keep_repetition  # 4 words < min_gate_words
    # doc 1: 6 distinct words → 5 bigrams each once: TRUE top coverage is
    # 1/5 = 2000 bp; under the 8-word gate floor it is kept regardless
    assert (r[1].dup_word_bp, r[1].top_bigram_bp, r[1].dup_trigram_bp) == (0, 2000, 0)
    assert r[1].keep_repetition
    # doc 2: 6 words 2 distinct → 4*1e4//6 = 6666; bigrams
    # [ab,ba,ab,ba,ab] top 'a b' 3/5 → 6000; trigrams 4, distinct 2 → 5000
    assert (r[2].dup_word_bp, r[2].top_bigram_bp, r[2].dup_trigram_bp) == (
        6666, 6000, 5000,
    )


def test_short_docs_pass_gate(spark):
    """Docs under min_gate_words pass unconditionally even when their raw
    fraction is saturated (a 2-word doc's one bigram covers 100%) — the
    fraction has no evidential weight at that length."""
    df = repetition_metrics(_docs(spark, ["solo", "two words", "a a a a"]))
    r = {row.doc_id: row for row in df.collect()}
    assert r[0].top_bigram_bp == 0 and r[0].dup_trigram_bp == 0
    assert r[1].top_bigram_bp == 10000  # true fraction, reported honestly
    assert all(row.keep_repetition for row in r.values())
    # ...but a LONG saturated doc is discarded
    long_rep = repetition_metrics(_docs(spark, ["a " * 19 + "a"])).collect()[0]
    assert long_rep.top_bigram_bp == 10000 and not long_rep.keep_repetition


def test_thresholds_are_parameters(spark):
    df = repetition_metrics(
        _docs(spark, ["a b a b c d e f g h"]), top_bigram_max_bp=10_000,
        dup_trigram_max_bp=10_000,
    )
    assert df.collect()[0].keep_repetition


def test_plan_is_jvm_only(spark):
    df = repetition_metrics(_docs(spark, ["a b c"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # shuffle-free projection: no Exchange in the plan
    assert "Exchange" not in plan


# -- chunk_tokens (overlapping token windows) -------------------------------

import pytest

from ganda_spark.functions.text import chunk_tokens


def test_chunk_tokens_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(10))
    rows = chunk_tokens(
        _docs(spark, [words]), window=4, stride=3
    ).orderBy("chunk_id").collect()
    # 10 words, window 4, stride 3 -> 1 + ceil(6/3) = 3 chunks
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w3 w4 w5 w6"   # 1-token overlap
    assert rows[2].chunk_text == "w6 w7 w8 w9"
    assert all(r.n_chunk_tokens == 4 for r in rows)


def test_chunk_tokens_short_doc_and_ragged_tail(spark):
    rows = {
        (r.doc_id, r.chunk_id): r
        for r in chunk_tokens(
            _docs(spark, ["a b", "a b c d e f g"]), window=4, stride=4
        ).collect()
    }
    assert rows[(0, 0)].chunk_text == "a b"          # <= window: one chunk
    assert rows[(0, 0)].n_chunk_tokens == 2
    assert rows[(1, 1)].chunk_text == "e f g"        # short last chunk
    assert rows[(1, 1)].n_chunk_tokens == 3
    assert len([k for k in rows if k[0] == 1]) == 2


def test_chunk_tokens_coverage_no_shuffle(spark):
    """Every word index is covered by at least one chunk; the plan has no
    Exchange and no Python nodes."""
    words = " ".join(f"t{i}" for i in range(50))
    out = chunk_tokens(_docs(spark, [words]), window=8, stride=5)
    seen = set()
    for r in out.collect():
        seen.update(r.chunk_text.split(" "))
    assert seen == {f"t{i}" for i in range(50)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_tokens_bad_stride(spark):
    with pytest.raises(ValueError, match="stride"):
        chunk_tokens(_docs(spark, ["a"]), window=4, stride=5)


# -- top_terms (integer-exact keyword extraction) ---------------------------

from ganda_spark.operators.keywords import top_terms


def test_top_terms_ranking(spark):
    out = top_terms(
        _docs(
            spark,
            [
                "apple apple apple banana banana cherry",
                "banana cherry cherry dates dates dates",
            ],
        ),
        k=2,
    )
    r = {(row.doc_id, row.term_rank): row for row in out.collect()}
    # doc 0: apple tf=3 (df=1) then banana tf=2 (df=2)
    assert (r[(0, 1)].term, r[(0, 1)].tf, r[(0, 1)].df) == ("apple", 3, 1)
    assert (r[(0, 2)].term, r[(0, 2)].tf) == ("banana", 2)
    # doc 1: dates tf=3, then cherry tf=2
    assert r[(1, 1)].term == "dates" and r[(1, 2)].term == "cherry"


def test_top_terms_df_breaks_ties_and_screens(spark):
    out = top_terms(
        _docs(
            spark,
            [
                "the a rare common x",   # stopwords + 1-char screened out
                "common words here",
            ],
        ),
        k=3,
    )
    rows = [r for r in out.collect() if r.doc_id == 0]
    # 'rare' (df=1) outranks 'common' (df=2) at equal tf=1
    assert [r.term for r in sorted(rows, key=lambda r: r.term_rank)] == [
        "rare", "common",
    ]
    assert all(r.term not in ("the", "a", "x") for r in out.collect())


def test_top_terms_deterministic_under_repartition(spark):
    docs = _docs(spark, ["w1 w2 w3 w1 w2 w1", "w2 w3 w4 w5 w2"])
    a = sorted(map(tuple, top_terms(docs, k=3).collect()))
    b = sorted(map(tuple, top_terms(docs.repartition(7), k=3).collect()))
    assert a == b
