"""S10/T10: interleaved text+media span documents — the north-rule corpus
(BASELINE.json `input_hint`): (doc_id: string,
spans: array<struct<kind:string, text:string, media_ref:string, offset:int>>).

No ganda counterpart: this is the 10^10-frontier generalization — URLs are
*extracted from* span docs and fetched pages are *assembled back into* span
docs, preserving span-sequence equality (kind, text, media_ref, order) per
doc_id.

Everything here is built-ins (split/slice/transform/explode/collect_list) —
zero Python. The synthetic derivation is a pure function of the driver's
`documents` table so the DuckDB oracle can reproduce the exploded form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_LINK_HOSTS = 37   # link spans point at the same host space as the frontier
N_IMG_HOSTS = 11
VIDEO_MOD = 3       # every 3rd doc gets a video span


def synth_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → interleaved span docs (deterministic).

    Layout per doc (offsets strictly increasing — the invariant key):
      0 text   first half of the words
      1 link   'see <url>' — URL embedded in text (extraction target)
      2 text   second half of the words
      3 image  media_ref URL
      4 video  media_ref URL (only when doc_id % 3 == 0)
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    half = (F.size(words) / 2).cast("int")
    first_half = F.array_join(F.slice(words, 1, F.greatest(half, F.lit(1))), " ")
    second_half = F.array_join(
        F.slice(words, half + 1, F.greatest(F.size(words) - half, F.lit(1))), " "
    )
    link_url = F.concat(
        F.lit("http://host-"),
        (F.col("doc_id") % N_LINK_HOSTS).cast("string"),
        F.lit(".test/doc/"),
        F.col("doc_id").cast("string"),
    )
    img_url = F.concat(
        F.lit("http://img-"),
        (F.col("doc_id") % N_IMG_HOSTS).cast("string"),
        F.lit(".test/i/"),
        F.col("doc_id").cast("string"),
        F.lit(".jpg"),
    )
    vid_url = F.concat(
        F.lit("http://vid-0.test/v/"), F.col("doc_id").cast("string"), F.lit(".mp4")
    )

    def span(kind, text, media_ref, offset):
        return F.struct(
            F.lit(kind).alias("kind") if isinstance(kind, str) else kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            F.lit(offset).cast("int").alias("offset"),
        )

    null_s = F.lit(None).cast("string")
    spans = F.array(
        span("text", first_half, null_s, 0),
        span("link", F.concat(F.lit("see "), link_url), null_s, 1),
        span("text", second_half, null_s, 2),
        span("image", F.lit(""), img_url, 3),
    )
    spans_with_video = F.concat(
        spans, F.array(span("video", F.lit(""), vid_url, 4))
    )
    return docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.when(F.col("doc_id") % VIDEO_MOD == 0, spans_with_video)
        .otherwise(spans)
        .alias("spans"),
    )


def extract_urls(span_docs: DataFrame) -> DataFrame:
    """S10: candidate frontier from span docs — URLs out of link-span text
    (regexp) ∪ media_ref of media spans. Returns
    (doc_id, url, kind, span_offset)."""
    exploded = span_docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("span_offset"),
    )
    from_text = (
        exploded.where(F.col("kind") == "link")
        .select(
            "doc_id",
            "kind",
            "span_offset",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(r"https?://[^\s]+"), 0)
            ).alias("url"),
        )
    )
    from_media = exploded.where(
        F.col("media_ref").isNotNull() & (F.length("media_ref") > 0)
    ).select("doc_id", "kind", "span_offset", F.col("media_ref").alias("url"))
    return from_text.unionByName(from_media)


def assemble_spans(flat: DataFrame) -> DataFrame:
    """T10: (doc_id, kind, text, media_ref, offset) rows → span docs,
    order restored by offset inside the array (array_sort on the leading
    struct field). One shuffle on doc_id; Arrow-backed collect_list."""
    return flat.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ),
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans")
    )


def assemble_response_spans(results: DataFrame) -> DataFrame:
    """T10 proper: fetched responses → interleaved span docs.

    results: (doc_id, kind, span_offset, url, status, body) — the output of
    extract_urls → fetch. Each fetched URL becomes a media/link span whose
    text carries the response body (200s) and whose media_ref is the URL;
    order is restored by span_offset, NOT by arrival order — the
    span-sequence-equality invariant (kind, text, media_ref, order) per
    doc_id survives any fetch parallelism."""
    flat = results.select(
        "doc_id",
        F.col("kind"),
        F.when(F.col("status") == 200, F.col("body")).otherwise(F.lit("")).alias("text"),
        F.col("url").alias("media_ref"),
        F.col("span_offset").cast("int").alias("offset"),
    )
    return assemble_spans(flat)


def explode_spans(span_docs: DataFrame) -> DataFrame:
    """Flat view (the invariant-comparison shape)."""
    return span_docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def span_canon(s) -> F.Column:
    """Canonical string of one span struct — kind␟text␟media_ref␟offset
    (unit separators; NULL media_ref renders as ''). This is the exact
    per-row invariant the reference contract pins (span-sequence equality
    on kind, text, media_ref, order), as a comparable string."""
    return F.concat_ws(
        "\x1f",
        # every field coalesced: concat_ws SKIPS null arguments rather
        # than rendering an empty field, so an un-coalesced NULL kind or
        # offset would drop a separator and let a 3-field string collide
        # with a different span's 4-field form (ADVICE r5)
        F.coalesce(s["kind"], F.lit("")),
        F.coalesce(s["text"], F.lit("")),
        F.coalesce(s["media_ref"], F.lit("")),
        F.coalesce(s["offset"].cast("string"), F.lit("")),
    )


def span_fingerprint(
    span_docs: DataFrame, id_col: str = "doc_id", fp_col: str = "span_fp"
) -> DataFrame:
    """md5 over the ordered canonical span sequence — one 32-char identity
    per document, equal iff the (kind, text, media_ref, order) sequence is
    equal. A pure projection (transform + concat_ws + md5, zero shuffle),
    so exact dedup over interleaved span docs is hash-groupBy on this
    column: the 100 TB span table never shuffles its span arrays, only
    the 16-byte fingerprints."""
    return span_docs.withColumn(
        fp_col,
        F.md5(
            F.concat_ws(
                "\x1e", F.transform(F.col("spans"), span_canon)
            ).cast("binary")
        ),
    )


def with_span_shingles(span_docs: DataFrame) -> DataFrame:
    """`shingles` = the canonical span strings — each SPAN is a shingle,
    so the unchanged MinHash/LSH/Jaccard stack (operators/dedup.py) finds
    NEAR-duplicate span documents: same doc re-crawled with one media
    span swapped, a trailing span dropped, an inserted ad block. The
    third reuse of the stack after word n-grams (text) and payload
    chunks (media) — one candidate-pair engine, three shingle domains."""
    return span_docs.withColumn(
        "shingles", F.transform(F.col("spans"), span_canon)
    )
