"""S10/T10: interleaved span docs — extraction and the span-sequence
equality invariant (BASELINE.json input_hint: kind, text, media_ref, order
per doc_id)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ganda_spark.sources.spans import (
    assemble_spans,
    explode_spans,
    extract_urls,
    synth_span_docs,
)


def test_span_docs_shape(spark, sf_dir):
    docs = synth_span_docs(spark, sf_dir)
    assert docs.schema.simpleString() == (
        "struct<doc_id:string,spans:array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>>"
    )
    row = docs.where(F.col("doc_id") == "doc-0").collect()[0]
    kinds = [s["kind"] for s in row["spans"]]
    assert kinds == ["text", "link", "text", "image", "video"]  # 0 % 3 == 0
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == sorted(offsets) == [0, 1, 2, 3, 4]


def test_extract_urls(spark, sf_dir):
    docs = synth_span_docs(spark, sf_dir)
    urls = extract_urls(docs)
    n_docs = docs.count()
    # every doc yields 1 link + 1 image; every 3rd a video
    expected = n_docs * 2 + docs.where(F.size("spans") == 5).count()
    assert urls.count() == expected
    kinds = {r["kind"] for r in urls.select("kind").distinct().collect()}
    assert kinds == {"link", "image", "video"}
    assert urls.where(~F.col("url").rlike("^http://")).count() == 0


def test_span_roundtrip_invariant(spark, sf_dir):
    """explode → assemble → explode is the identity on
    (doc_id, kind, text, media_ref, offset) — per-row invariant vs the
    reference output (input_hint)."""
    docs = synth_span_docs(spark, sf_dir)
    flat = explode_spans(docs)
    rebuilt = assemble_spans(flat)
    flat2 = explode_spans(rebuilt)
    cols = ["doc_id", "kind", "text", "media_ref", "offset"]
    assert flat.select(cols).exceptAll(flat2.select(cols)).isEmpty()
    assert flat2.select(cols).exceptAll(flat.select(cols)).isEmpty()
    # and the array order is exactly offset order per doc
    sample = rebuilt.limit(20).collect()
    for r in sample:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == sorted(offs)


def test_response_span_assembly_invariant(spark, sf_dir):
    """extract → fetch (any parallelism) → assemble: span sequence per
    doc_id is (kind, text, media_ref, order)-identical to the seq computed
    at W=1 — BASELINE.json input_hint invariant."""
    import pyspark.sql.functions as F2

    from ganda_spark.config import EngineConfig
    from ganda_spark.functions.urls import url_host
    from ganda_spark.operators.fetch import mock_fetch_udf
    from ganda_spark.sources.spans import assemble_response_spans

    docs = synth_span_docs(spark, sf_dir).limit(200)
    urls = extract_urls(docs).withColumn("host", url_host(F2.col("url")))
    one = assemble_response_spans(
        mock_fetch_udf(urls, EngineConfig(retries=1, request_workers=1))
    )
    many = assemble_response_spans(
        mock_fetch_udf(
            urls.repartition(16), EngineConfig(retries=1, request_workers=16)
        )
    )
    joined = one.alias("a").join(many.alias("b"), "doc_id")
    assert joined.where(F2.col("a.spans") != F2.col("b.spans")).count() == 0
    assert one.count() == 200
    # offsets strictly increasing inside every assembled doc
    bad = one.where(
        F2.exists(
            F2.zip_with(
                F2.slice("spans", 1, F2.size("spans") - 1),
                F2.slice("spans", 2, F2.size("spans") - 1),
                lambda x, y: x["offset"] >= y["offset"],
            ),
            lambda v: v,
        )
    )
    assert bad.count() == 0


def test_assembly_order_under_shuffle(spark, sf_dir):
    """Shuffling the flat rows must not change assembled order —
    array_sort, not arrival order, defines the sequence."""
    docs = synth_span_docs(spark, sf_dir).limit(100)
    flat = explode_spans(docs).orderBy(F.rand(seed=7)).repartition(16)
    rebuilt = assemble_spans(flat)
    joined = docs.alias("a").join(rebuilt.alias("b"), "doc_id")
    mismatch = joined.where(F.col("a.spans") != F.col("b.spans"))
    assert mismatch.count() == 0


def test_span_fingerprint_null_fields_do_not_collide(spark):
    """ADVICE r5: concat_ws skips NULL args, so an un-coalesced NULL kind
    would render 3 fields and could collide with a genuinely different
    4-field span. All four fields coalesce — these two docs must differ."""
    from ganda_spark.sources.spans import span_fingerprint

    rows = [
        ("a", [(None, "x\x1fy", None, 0)]),   # NULL kind
        ("b", [("x", "y", None, 0)]),          # kind='x', text='y'
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    fps = {r.doc_id: r.span_fp for r in span_fingerprint(df).collect()}
    assert fps["a"] != fps["b"]
