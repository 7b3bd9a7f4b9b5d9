"""Gopher-rule quality gate (functions/quality): one hand-built document
per rule that fails EXACTLY that rule (all other facets passing), NULL /
empty semantics, the Spark↔DuckDB facet parity on the adversarial set,
and the shuffle-free plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from ganda_spark.functions.quality import (
    GOPHER_THRESHOLDS,
    gopher_quality,
    duck_gopher_sql,
)

# a base document that passes every Gopher rule: >=50 words, mean word
# length in [3,10], no symbols/bullets/ellipses, all-alpha words, >=2
# stopwords, unique lines
_GOOD = (
    "the quick brown fox jumps over that lazy dog and we have gone with "
    "them to be sure of it all day long\n"
    "another line keeps the word count honest and the lines distinct here\n"
    "a third line continues the prose with more plain ordinary words now\n"
    "final line closes the paragraph with nothing unusual about it at all"
)


def _facets(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r.asDict() for r in gopher_quality(df).collect()}


def test_good_document_passes(spark):
    out = _facets(spark, [_GOOD])[0]
    assert out["keep_gopher"] is True
    assert out["n_words"] >= GOPHER_THRESHOLDS["min_words"]
    assert out["stop_hits"] >= 2
    assert out["dup_line_bp"] == 0 and out["dup_line_char_bp"] == 0


def test_each_rule_fails_alone(spark):
    cases = {
        # too few words
        "short": "the dog and that have with all here now be",
        # mean word length > 10 (long tokens), padded with stopwords
        "longwords": ("the of " + "supercalifragilisticexpialidocious " * 60),
        # symbol ratio > 0.1: hashes sprinkled through the good text
        "symbols": _GOOD + ("\n# " * 30),
        # >90% bullet lines (many bullets, one prose line with the words)
        "bullets": "\n".join(["- item"] * 60) + "\n" + _GOOD.replace("\n", " "),
        # >30% ellipsis-terminated lines
        "ellipsis": _GOOD + "\n" + "\n".join(["trailing thought..."] * 4),
        # alpha-word ratio < 0.8: number blocks
        "numeric": _GOOD + ("\n" + "12345 " * 40),
        # <2 distinct Gopher stopwords
        "nostops": "plain words without any common function tokens " * 8,
        # duplicate lines > 30%
        "duplines": _GOOD + ("\n" + "repeated filler line" * 1)
        + "\nrepeated filler line" * 3,
    }
    out = _facets(spark, list(cases.values()))
    verdicts = {k: out[i]["keep_gopher"] for i, k in enumerate(cases)}
    assert all(v is False for v in verdicts.values()), verdicts
    # and each intended facet is the one out of bounds
    t = GOPHER_THRESHOLDS
    o = {k: out[i] for i, k in enumerate(cases)}
    assert o["short"]["n_words"] < t["min_words"]
    assert o["longwords"]["mean_word_len_bp"] > t["max_mean_word_len_bp"]
    assert o["symbols"]["symbol_word_bp"] > t["max_symbol_word_bp"]
    assert o["bullets"]["bullet_line_bp"] > t["max_bullet_line_bp"]
    assert o["ellipsis"]["ellipsis_line_bp"] > t["max_ellipsis_line_bp"]
    assert o["numeric"]["alpha_word_bp"] < t["min_alpha_word_bp"]
    assert o["nostops"]["stop_hits"] < t["min_stop_hits"]
    assert o["duplines"]["dup_line_bp"] > t["max_dup_line_bp"]


def test_null_and_empty_semantics(spark):
    out = _facets(spark, [None, "", "   \n  \n"])
    for i in range(3):
        assert out[i]["keep_gopher"] is False  # coalesced, never NULL
    assert out[0]["n_words"] is None  # NULL text → NULL facets
    assert out[1]["n_words"] == 0 and out[1]["mean_word_len_bp"] is None
    # whitespace-only lines are non-empty strings: they count as (unique)
    # lines, so the line facets are 0 while the word facets stay NULL
    assert out[2]["n_words"] == 0 and out[2]["dup_line_bp"] == 0
    assert out[2]["mean_word_len_bp"] is None


def test_duckdb_parity_adversarial(spark):
    texts = [
        None, "", "   ", _GOOD,
        "- a\n- b\n- c\n- d",
        "word…\nmore...\nplain line",
        "#### ## # tags " * 20,
        "dup line\ndup line\ndup line\nunique",
        "12345 67890 " * 30,
        "a b c " * 40,
        "tab\tsep words\r\nwindows line\nthe be of and that",
        "…\n…\n…",
    ]
    pdf = pd.DataFrame(
        [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute(duck_gopher_sql() + " ORDER BY doc_id").fetchdf()
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = gopher_quality(sdf).orderBy("doc_id").toPandas()
    for c in [c for c in oracle.columns if c != "text"]:
        a = [None if pd.isna(x) else x for x in oracle[c]]
        b = [None if pd.isna(x) else x for x in got[c]]
        if c == "keep_gopher":
            a, b = [bool(x) if x is not None else x for x in a], [
                bool(x) if x is not None else x for x in b
            ]
        else:
            a = [int(x) if x is not None else x for x in a]
            b = [int(x) if x is not None else x for x in b]
        assert a == b, (c, a, b)


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, _GOOD)], "doc_id long, text string")
    plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
