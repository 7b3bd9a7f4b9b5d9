"""Unicode text normalization + mojibake detection — the first hop of a
training-data cleaning pipeline (run before quality/dedup so that curly
quotes, zero-width characters and stray control bytes don't fragment
n-gram/shingle/token statistics downstream).

The reference engine transforms response BYTES (sha256/base64/escape,
transforms/transforms.go) and leaves text canonicalization to the Unix
pipeline; a corpus pipeline needs it engine-side. Same design as
functions/html.py: the normalization chain is declared ONCE as data
(`NORM_STEPS`) and compiled to either a Spark Column or a DuckDB SQL
expression, so the correctness oracle runs the IDENTICAL chain. Every
regex stays in the common Java-regex ∩ RE2 dialect: inline `(?m)` flags,
`\\x`-hex classes, literal Unicode characters (NEVER `\\uXXXX` — Java
accepts it, RE2 does not).

Scale shape: both operators are pure-Column projections — zero Python,
zero shuffle, whole-stage codegen; at 100 TB they ride the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Unicode space separators beyond ASCII (en/em/thin/ideographic…) — as
# LITERAL characters so the class parses identically in Java and RE2.
_UNI_SPACES = "".join(chr(c) for c in (*range(0x2000, 0x200B), 0x202F, 0x205F, 0x3000))

# (kind, pattern/search, replacement) executed IN ORDER.
#   "lit" — exact string replace; "re" — regex replace (global both sides)
NORM_STEPS: tuple[tuple[str, str, str], ...] = (
    # line endings first so later newline logic sees one convention
    ("lit", "\r\n", "\n"),
    ("lit", "\r", "\n"),
    # zero-width characters (ZWSP/ZWNJ/ZWJ/BOM): typographically invisible,
    # but they split tokens and poison exact/near dedup
    ("lit", "​", ""),
    ("lit", "‌", ""),
    ("lit", "‍", ""),
    ("lit", "﻿", ""),
    # exotic spaces → ASCII space
    ("lit", " ", " "),
    ("re", f"[{_UNI_SPACES}]", " "),
    # typographic quotes/dashes/ellipsis → ASCII equivalents
    ("lit", "‘", "'"),
    ("lit", "’", "'"),
    ("lit", "‚", "'"),
    ("lit", "“", '"'),
    ("lit", "”", '"'),
    ("lit", "„", '"'),
    ("lit", "–", "-"),
    ("lit", "—", "-"),
    ("lit", "―", "-"),
    ("lit", "…", "..."),
    # control bytes (keep \t and \n; strip the rest incl. DEL) → space
    ("re", r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", " "),
    # horizontal whitespace runs collapse; then per-line edge trim
    ("re", "[ \t]+", " "),
    ("re", "(?m)^ +| +$", ""),
    # ≥3 blank-separated newlines → one paragraph break (keep structure,
    # unlike html.py's full collapse — normalization must not destroy
    # paragraph boundaries that chunkers rely on)
    ("re", r"\n{3,}", "\n\n"),
    # full-string trim (default ^/$ anchor the whole string in BOTH
    # Java regex and RE2 — no (?s) needed for anchors)
    ("re", r"^\s+|\s+$", ""),
)

# Mojibake signatures, counted on the RAW input (before normalization):
#   � (U+FFFD)                      — a decoder already gave up
#   Ã/Â + U+0080..U+00BF            — UTF-8 read as Latin-1 (é → Ã©)
#   â followed by € (U+20AC)        — UTF-8 read as Windows-1252 (’ → â€™)
_MOJIBAKE_RE = "�" + f"|[ÂÃ][{chr(0x80)}-{chr(0xBF)}]" + "|â€"


def normalize_col(col: F.Column) -> F.Column:
    """The NORM_STEPS chain compiled to one nested Column expression."""
    c = col
    for kind, pat, rep in NORM_STEPS:
        if kind == "re":
            c = F.regexp_replace(c, pat, rep)
        else:
            c = F.replace(c, F.lit(pat), F.lit(rep))
    return c


def duck_normalize_sql(expr: str) -> str:
    """The SAME chain as DuckDB SQL — the oracle mirror."""
    c = expr
    for kind, pat, rep in NORM_STEPS:
        if kind == "re":
            pat_sql = pat.replace("'", "''")
            rep_sql = "'" + rep.replace("'", "''") + "'"
            c = f"regexp_replace({c}, '{pat_sql}', {rep_sql}, 'g')"
        else:
            frm = pat.replace("'", "''")
            to = rep.replace("'", "''")
            c = f"replace({c}, '{frm}', '{to}')"
    return c


def duck_mojibake_sql(expr: str) -> str:
    """DuckDB mirror of the mojibake hit count (on the raw column)."""
    pat = _MOJIBAKE_RE.replace("'", "''")
    return f"CAST(len(regexp_extract_all({expr}, '{pat}', 0)) AS BIGINT)"


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Adds `out_col` (the normalized text; NULL stays NULL — a missing
    doc is missing, not empty) and `mojibake_hits` (count of encoding-
    damage signatures in the RAW text — normalization cannot repair
    mojibake, so the count is a routing signal: re-decode or drop)."""
    return df.withColumn(out_col, normalize_col(F.col(text_col))).withColumn(
        "mojibake_hits",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_MOJIBAKE_RE), 0)).cast(
            "long"
        ),
    )
