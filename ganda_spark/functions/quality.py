"""Gopher-rule document quality facets + gate — the heuristic filter set
from the Gopher/MassiveText data pipeline (Rae et al. 2021, §A.1.1), the
de-facto public baseline every LLM corpus pipeline starts from. Extends
functions/text.quality_metrics (length / stopword facets) with the
structural rules: symbol-to-word ratio, bullet / ellipsis line fractions,
alphabetic-word fraction, duplicate-line fractions, and the ≥2-distinct-
stopwords requirement.

Reference context: the reference engine emits raw bodies and leaves
filtering to the Unix pipe (responses/responses.go:91-103); a corpus
pipeline needs the gate engine-side, between extract/normalize and dedup.

Same one-table/two-compilers design as functions/normalize.py: each
list-ratio facet is (name, base list, regex) data compiled to BOTH a
Spark Column and the DuckDB oracle expression, and every regex stays in
the Java-regex ∩ RE2 dialect (literal chars + [.]-style dot escaping —
no backslash-metachar forms, which Spark's SQL literal processing would
eat). Ratios are integer BASIS POINTS (floor), the exact-parity form the
repo's other quality oracles use.

Scale shape: one pure-Column projection over two precomputed arrays
(words, non-empty lines) — zero Python, zero shuffle, codegen'd; at
100 TB it rides the parquet scan like normalize/extract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# whitespace word split (real-escape forms survive both dialects: Spark
# SQL literal processing turns \t/\n/\r into the chars, Java regex accepts
# them in a class; DuckDB passes them through for RE2 to interpret)
_WS_SPLIT = "[ \\t\\n\\r]+"

# Gopher's "must contain >=2 of" stop set (NOT the repo-wide STOPWORDS
# table — Gopher pins its own 8-word list)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

# (facet, base list, regex) → bp = floor(1e4 * matching / total)
_RATIO_FACETS: tuple[tuple[str, str, str], ...] = (
    # words containing at least one ASCII letter
    ("alpha_word_bp", "words", "[A-Za-z]"),
    # lines starting with a bullet glyph then horizontal space
    ("bullet_line_bp", "lines", "^[ \\t]*[-*•‣▪][ \\t]"),
    # lines ending with an ellipsis (ASCII or typographic)
    ("ellipsis_line_bp", "lines", "([.][.][.]|…)[ \\t]*$"),
)

# hash/ellipsis symbols counted over the whole text for symbol_word_bp
_SYMBOL_RE = "#|[.][.][.]|…"

# gate thresholds (basis points unless counted): Gopher §A.1.1 values
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len_bp": 30_000,   # mean word length in [3, 10] chars
    "max_mean_word_len_bp": 100_000,
    "max_symbol_word_bp": 1_000,      # '#'/'…' to words <= 0.1
    "max_bullet_line_bp": 9_000,      # <=90% bullet lines
    "max_ellipsis_line_bp": 3_000,    # <=30% ellipsis-terminated lines
    "min_alpha_word_bp": 8_000,       # >=80% words contain a letter
    "min_stop_hits": 2,               # >=2 distinct Gopher stopwords
    "max_dup_line_bp": 3_000,         # <=30% duplicate lines
    "max_dup_line_char_bp": 2_000,    # <=20% chars in duplicate lines
}


def _bp(num: str, den: str) -> str:
    """floor(1e4 * num / den) as BIGINT — the repo's exact-parity ratio
    form (magnitudes stay well under 2^53, so the double floor is exact
    and identical across engines)."""
    return f"CAST(floor({num} * 10000 / {den}) AS BIGINT)"


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the Gopher facet columns and `keep_gopher`.

    NULL semantics: a NULL text yields NULL facets and keep_gopher=false;
    a zero-word text yields NULL ratio facets and keep_gopher=false (the
    gate coalesces to false — never NULL — so it filters cleanly).
    """
    words = f"filter(split({text_col}, '{_WS_SPLIT}'), x -> x != '')"
    lines = f"filter(split({text_col}, '\\n'), x -> x != '')"
    d = df.withColumn("_qw", F.expr(words)).withColumn("_ql", F.expr(lines))

    n_words = "size(_qw)"
    n_lines = "size(_ql)"
    sum_len = "aggregate({0}, 0L, (a, x) -> a + length(x))"
    facets: dict[str, str] = {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len_bp": _bp(sum_len.format("_qw"), n_words),
        "symbol_word_bp": _bp(
            f"size(regexp_extract_all({text_col}, '{_SYMBOL_RE}', 0))", n_words
        ),
        "stop_hits": (
            "CAST(size(array_intersect(array_distinct(transform(_qw, "
            "x -> lower(x))), array("
            + ", ".join(f"'{s}'" for s in GOPHER_STOPS)
            + "))) AS BIGINT)"
        ),
    }
    for name, base, pat in _RATIO_FACETS:
        lst = "_qw" if base == "words" else "_ql"
        den = n_words if base == "words" else n_lines
        facets[name] = _bp(f"size(filter({lst}, x -> x rlike '{pat}'))", den)
    dist = "array_distinct(_ql)"
    facets["dup_line_bp"] = _bp(f"({n_lines} - size({dist}))", n_lines)
    facets["dup_line_char_bp"] = _bp(
        f"({sum_len.format('_ql')} - {sum_len.format(dist)})",
        sum_len.format("_ql"),
    )

    word_guard = {"n_words"}
    line_guard = {"bullet_line_bp", "ellipsis_line_bp", "dup_line_bp"}
    char_guard = {"dup_line_char_bp"}
    for name, expr in facets.items():
        if name in word_guard:
            guarded = expr
        elif name in line_guard:
            guarded = f"CASE WHEN {n_lines} > 0 THEN {expr} END"
        elif name in char_guard:
            guarded = f"CASE WHEN {sum_len.format('_ql')} > 0 THEN {expr} END"
        else:
            guarded = f"CASE WHEN {n_words} > 0 THEN {expr} END"
        d = d.withColumn(name, F.expr(guarded))

    t = GOPHER_THRESHOLDS
    keep = (
        (F.col("n_words") >= t["min_words"])
        & (F.col("n_words") <= t["max_words"])
        & F.col("mean_word_len_bp").between(
            t["min_mean_word_len_bp"], t["max_mean_word_len_bp"]
        )
        & (F.col("symbol_word_bp") <= t["max_symbol_word_bp"])
        & (F.col("bullet_line_bp") <= t["max_bullet_line_bp"])
        & (F.col("ellipsis_line_bp") <= t["max_ellipsis_line_bp"])
        & (F.col("alpha_word_bp") >= t["min_alpha_word_bp"])
        & (F.col("stop_hits") >= t["min_stop_hits"])
        & (F.col("dup_line_bp") <= t["max_dup_line_bp"])
        & (F.col("dup_line_char_bp") <= t["max_dup_line_char_bp"])
    )
    return d.withColumn("keep_gopher", F.coalesce(keep, F.lit(False))).drop(
        "_qw", "_ql"
    )


def duck_gopher_sql(source: str = "documents", text_col: str = "text") -> str:
    """The SAME facet set as a DuckDB query (oracle mirror): identical
    regexes, identical floor-bp arithmetic, identical NULL guards."""
    words = (
        f"list_filter(regexp_split_to_array({text_col}, '{_WS_SPLIT}'), "
        "x -> x <> '')"
    )
    lines = f"list_filter(string_split({text_col}, chr(10)), x -> x <> '')"
    n_words = "len(_qw)"
    n_lines = "len(_ql)"
    sum_len = (
        "CAST(coalesce(list_sum(list_transform({0}, x -> length(x))), 0)"
        " AS BIGINT)"
    )
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    facets: dict[str, str] = {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len_bp": _bp(sum_len.format("_qw"), n_words),
        "symbol_word_bp": _bp(
            f"len(regexp_extract_all({text_col}, '{_SYMBOL_RE}', 0))", n_words
        ),
        "stop_hits": (
            "CAST(len(list_intersect(list_distinct(list_transform(_qw, "
            f"x -> lower(x))), [{stops}])) AS BIGINT)"
        ),
    }
    for name, base, pat in _RATIO_FACETS:
        lst = "_qw" if base == "words" else "_ql"
        den = n_words if base == "words" else n_lines
        facets[name] = _bp(
            f"len(list_filter({lst}, x -> regexp_matches(x, '{pat}')))", den
        )
    dist = "list_distinct(_ql)"
    facets["dup_line_bp"] = _bp(f"({n_lines} - len({dist}))", n_lines)
    facets["dup_line_char_bp"] = _bp(
        f"({sum_len.format('_ql')} - {sum_len.format(dist)})",
        sum_len.format("_ql"),
    )

    word_guard = {"n_words"}
    line_guard = {"bullet_line_bp", "ellipsis_line_bp", "dup_line_bp"}
    char_guard = {"dup_line_char_bp"}
    cols = []
    for name, expr in facets.items():
        if name in word_guard:
            guarded = expr
        elif name in line_guard:
            guarded = f"CASE WHEN {n_lines} > 0 THEN {expr} END"
        elif name in char_guard:
            guarded = f"CASE WHEN {sum_len.format('_ql')} > 0 THEN {expr} END"
        else:
            guarded = f"CASE WHEN {n_words} > 0 THEN {expr} END"
        cols.append(f"{guarded} AS {name}")

    t = GOPHER_THRESHOLDS
    keep = (
        f"coalesce(n_words >= {t['min_words']} AND n_words <= {t['max_words']}"
        f" AND mean_word_len_bp BETWEEN {t['min_mean_word_len_bp']} AND"
        f" {t['max_mean_word_len_bp']}"
        f" AND symbol_word_bp <= {t['max_symbol_word_bp']}"
        f" AND bullet_line_bp <= {t['max_bullet_line_bp']}"
        f" AND ellipsis_line_bp <= {t['max_ellipsis_line_bp']}"
        f" AND alpha_word_bp >= {t['min_alpha_word_bp']}"
        f" AND stop_hits >= {t['min_stop_hits']}"
        f" AND dup_line_bp <= {t['max_dup_line_bp']}"
        f" AND dup_line_char_bp <= {t['max_dup_line_char_bp']}, false)"
    )
    return f"""
WITH _base AS (
  SELECT *, {words} AS _qw, {lines} AS _ql FROM {source}
),
_facets AS (
  SELECT * EXCLUDE (_qw, _ql), {", ".join(cols)} FROM _base
)
SELECT *, {keep} AS keep_gopher FROM _facets
"""
