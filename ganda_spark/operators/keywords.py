"""Per-document keyword extraction — the TF-IDF signal in an
integer-exact form: rank a document's terms by (tf DESC, df ASC, term)
instead of multiplying tf by a float idf. The ordering is what TF-IDF's
monotone transform buys anyway (higher tf up, common-everywhere terms
down), and staying in integers keeps the result reproducible by an
external SQL engine bit-for-bit (the repo's basis-points discipline).

Scale shape: doc→term explode is a projection; tf is a (doc, term)
groupBy with map-side partial aggregation; df is a term groupBy over the
DISTINCT doc-term pairs; the df join is term-keyed (AQE broadcasts it
for bounded vocabularies — natural-language vocabularies are Zipf-small
relative to any corpus); the final top-k is a per-document window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# minimal function-word screen: keyword lists are noise without it
DEFAULT_STOPWORDS = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
)


def top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 2,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Top-k keywords per document: (doc_id, term, tf, df, term_rank).

    tf = occurrences in the document, df = number of documents containing
    the term; rank orders by tf DESC then df ASC (rarer-corpus-wide wins
    ties) then term ASC (total order — deterministic under any
    partitioning). Stopwords and terms under min_len are screened before
    counting."""
    quoted = ", ".join(f"'{w}'" for w in stopwords)
    words = F.expr(
        f"filter(split(lower({text_col}), ' '), "
        f"w -> length(w) >= {min_len} AND NOT w IN ({quoted}))"
    )
    pairs = docs.select(F.col(id_col), F.explode(words).alias("term"))
    tf = pairs.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_counts = (
        pairs.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    scored = tf.join(df_counts, "term")
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .where(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "df", "term_rank")
    )
