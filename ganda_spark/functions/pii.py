"""PII detection + redaction for training-data curation (north-rule
generalization — the reference pipes response bodies verbatim,
reference README.md:28-30; a 100 TB corpus build must scrub them).

Detection counts and redaction are pure Column regexp expressions —
shuffle-free, codegen'd, zero Python. Patterns are deliberately written
in the common subset of Java regex (Spark) and RE2 (DuckDB): no
backreferences, no lookaround — so an external oracle reproduces both
the counts and the redacted text byte-for-byte.

Redaction order is fixed (EMAIL, SSN, IPV4, PHONE) and replacement
tokens contain no digits, so later patterns can never match into an
earlier replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kind -> (pattern, replacement token); ORDER IS THE REDACTION ORDER.
# SSN (3-2-4) and PHONE (3-3-4) are disjoint shapes; \b anchors keep a
# phone's 4-digit tail from matching as an SSN tail.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_email / n_ssn / n_ipv4 / n_phone match counts (long), all
    measured on the ORIGINAL text (before any redaction)."""
    out = df
    for kind, (pat, _) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).cast(
                "long"
            ),
        )
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Replace every PII match with its token, in PII_PATTERNS order."""
    col = F.col(text_col)
    for pat, token in PII_PATTERNS.values():
        col = F.regexp_replace(col, pat, token)
    return df.withColumn(out_col, col)


def duckdb_pii_sql(text_expr: str) -> dict[str, str]:
    """DuckDB fragments computing the identical counts + redaction —
    the oracle mirror of pii_metrics/redact_pii (RE2 dialect; 'g' flag
    because DuckDB's regexp_replace is first-match-only by default)."""
    frags = {
        f"n_{kind}": f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
        for kind, (pat, _) in PII_PATTERNS.items()
    }
    red = text_expr
    for pat, token in PII_PATTERNS.values():
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    frags["redacted"] = red
    return frags
