"""Greedy longest-match wordpiece tokenizer (functions/subword):
hand-verified segmentations, fallback behavior, hop-budget tail,
case-folding, and the shuffle-free plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from ganda_spark.functions.subword import (
    MAX_WORD,
    SUBWORD_VOCAB,
    token_counts_subword,
)


def _greedy_py(word: str, vocab=SUBWORD_VOCAB, max_word: int = MAX_WORD) -> int:
    """Independent reference implementation of the fold's contract."""
    w = word.lower()
    pos, n = 0, 0  # 0-indexed
    for _ in range(max_word):
        if pos >= len(w):
            break
        best = max(
            (len(v) for v in vocab if w.startswith(v, pos)), default=1
        )
        pos += best
        n += 1
    if pos < len(w):
        n += -((len(w) - pos) // -4)  # ceil
    return n


def _counts(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: r.n_subword_tokens
        for r in token_counts_subword(df).collect()
    }


def test_hand_verified_segmentations(spark):
    # 'the' is one vocab word; 'retraining' = re+train? 'train' not in
    # vocab → re|t|r|a|in|ing... trust the reference impl for exact counts
    texts = [
        "the",            # 1 piece
        "understanding",  # under|st|and|ing = 4
        "zzz",            # no pieces beyond single chars... z|z|z = 3
        "the query scan", # 1 + 2 + 1
    ]
    got = _counts(spark, texts)
    assert got[0] == 1
    assert got[1] == _greedy_py("understanding") == 4
    assert got[2] == 3
    assert got[3] == (
        _greedy_py("the") + _greedy_py("query") + _greedy_py("scan")
    )


def test_matches_reference_impl_on_word_salad(spark):
    import random

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcdefgh ") for _ in range(rng.randrange(1, 60)))
        for _ in range(30)
    ]
    got = _counts(spark, words)
    for i, t in enumerate(words):
        expect = sum(_greedy_py(w) for w in t.split(" "))
        assert got[i] == expect, t


def test_fallback_and_casefold(spark):
    got = _counts(spark, ["THE Query", "@@##", "日本語テスト"])
    # case-folds to vocab: 'the'=1, 'query'=2
    assert got[0] == 1 + _greedy_py("query")
    # punctuation not in vocab: one token per char
    assert got[1] == 4
    # non-ASCII: single-char fallback per codepoint
    assert got[2] == 6


def test_hop_budget_tail_estimate(spark):
    """A word longer than MAX_WORD single-char hops gets the 4-chars/token
    tail estimate instead of an unbounded fold."""
    long_word = "z" * 40  # 24 hops then ceil(16/4)=4 → 28
    got = _counts(spark, [long_word])
    assert got[0] == MAX_WORD + 4 == _greedy_py(long_word)


def test_plan_no_shuffle(spark):
    """Tokenization is a broadcast-join projection: no Exchange."""
    df = spark.range(10).withColumn("text", F.lit("the query scan"))
    plan = (
        token_counts_subword(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final.replace("BroadcastExchange", "BX")


def test_by_type_memoized_equals_inline(spark):
    """The type-memoized (distinct words → fold per type → broadcast join
    back) path must count identically to the inline projection."""
    texts = [
        "the query scan understanding retraining",
        "THE the ThE repeated repeated words words words",
        "zzz @@ 日本語 mixed bag",
        "z" * 40 + " short",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    inline = {
        r.doc_id: (r.n_subword_tokens, r.n_ws_tokens)
        for r in token_counts_subword(df).collect()
    }
    typed = {
        r.doc_id: (r.n_subword_tokens, r.n_ws_tokens)
        for r in token_counts_subword(df, by_type=True).collect()
    }
    assert inline == typed
