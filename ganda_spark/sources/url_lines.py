"""S1-S4: URL + ragged-TSV-context input.

The reference reads stdin lines as RFC-4180 TSV with a variable field count:
field 0 is the URL, the rest ride along as context
(parser/parser.go:53-87; Comma='\\t', FieldsPerRecord=-1 at :59-61; ragged
semantics pinned by parser/parser_test.go:70-105). Context is nil when
absent (parser/parser.go:77-83); blank records are skipped (:71); a
malformed quote fails the stream (parser/parser_test.go:107-119).

Spark-first: one `text` scan (line-splittable at 100 TB) + a quote-aware
split expression — split on tabs with an even number of quotes ahead, then
unquote. All JVM regex, whole-stage codegen, no Python. Spark's csv reader
is NOT used because its fixed-width schema cannot express ganda's ragged
FieldsPerRecord=-1 contract (from_csv marks short rows corrupt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# split on tabs that are OUTSIDE quoted fields (even number of '"' ahead)
_TAB_OUTSIDE_QUOTES = '\t(?=(?:[^"]*"[^"]*")*[^"]*$)'


def _unquote(field: Column) -> Column:
    """RFC-4180 field unquote: strip surrounding quotes, '""' → '"'."""
    quoted = field.startswith('"') & field.endswith('"') & (F.length(field) >= 2)
    return F.when(
        quoted,
        F.regexp_replace(
            F.substring(field, F.lit(2), F.length(field) - 2), '""', '"'
        ),
    ).otherwise(field)


def parse_url_lines(
    spark: SparkSession,
    path_or_df,
) -> DataFrame:
    """text path (or DataFrame with a `value` string column) →
    DataFrame(seq, url, context: array<string>).

    `seq` is the input-line ordinal — the W=1 ordering contract key
    (reference tour cell 39; single response worker
    execcontext/execcontext.go:63-64).
    """
    if isinstance(path_or_df, DataFrame):
        lines = path_or_df
    else:
        lines = spark.read.text(path_or_df)
    lines = lines.select(F.monotonically_increasing_id().alias("seq"), "value")

    # fail-fast on malformed quoting: odd number of quote chars in the line
    # (Go csv returns an error and the whole stream stops,
    # parser/parser_test.go:107-119)
    n_quotes = F.length(F.col("value")) - F.length(
        F.regexp_replace(F.col("value"), '"', "")
    )
    from ganda_spark.config import MAX_LINE_BYTES

    # Guards live in a FILTER, not inlined under every projected field: an
    # expression wrapping `value` would be re-inlined into url/context/
    # where (3-5 copies of the raise_error+regex subtree per row), which
    # pushed wide consumers of this parse past janino's 64 KB method limit
    # and dropped the whole stage out of codegen. As a filter predicate the
    # guard compiles once and evaluates once per row.
    guard = (
        F.when(
            # 1 MB max-line guard (reference bufio buffer, parser/parser.go:105)
            F.length("value") > MAX_LINE_BYTES,
            F.raise_error(
                F.concat(
                    F.lit(f"input line exceeds {MAX_LINE_BYTES} bytes: "),
                    F.substring("value", 1, 80),
                )
            ),
        )
        .when(
            n_quotes % 2 == 1,
            F.raise_error(F.concat(F.lit("malformed TSV record: "), F.col("value"))),
        )
        .otherwise(F.lit(0))
    )

    fields = F.split(F.col("value"), _TAB_OUTSIDE_QUOTES)
    url = _unquote(F.element_at(fields, 1))
    rest = F.slice(fields, 2, F.greatest(F.size(fields) - 1, F.lit(0)))
    context = F.transform(rest, _unquote)
    context = F.when(F.size(context) > 0, context)  # nil when absent

    return (
        lines.where(guard >= 0)
        .select(
            "seq",
            url.alias("url"),
            context.alias("context"),
        )
        # P1: blank records skipped (parser/parser.go:71)
        .where(F.col("url").isNotNull() & (F.length("url") > 0))
    )
