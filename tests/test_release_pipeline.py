"""corpus_release_pipeline composition (normalize → Gopher facet gate →
exact dedup on normalized text → ordered export): a hand corpus where
each stage's survivors are known exactly."""

from __future__ import annotations

import pyspark.sql.functions as F

from ganda_spark.functions.normalize import normalize_text
from ganda_spark.functions.quality import gopher_quality
from ganda_spark.operators.dedup import exact_dup_groups
from ganda_spark.operators.sampling import export_ordered_shards

_PROSE = (
    "the quick brown fox jumps over that lazy dog and we have gone with "
    "them to be sure of it all day long while more plain words follow"
)


def test_stage_survivors(spark):
    rows = [
        (1, _PROSE),                                # keeper
        (2, _PROSE.replace("the quick", "the quick").replace(
            "to be", "to be")),                 # styled dup of 1 — only
                                                     # normalization collapses it
        (3, "12345 " * 30),                          # fails alpha-word gate
        (4, "three short words"),                    # fails n_words >= 20
        (5, _PROSE + " unique tail keeps this one distinct"),  # keeper
        (6, None),                                   # NULL text drops
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    normed = normalize_text(docs).select("doc_id", "text_norm")

    gated = (
        gopher_quality(normed, text_col="text_norm")
        .where(
            (F.col("alpha_word_bp") >= 8000)
            & (F.col("stop_hits") >= 1)
            & (F.col("n_words") >= 20)
            & (F.col("dup_line_bp") <= 3000)
        )
        .select("doc_id", "text_norm")
    )
    assert sorted(r.doc_id for r in gated.collect()) == [1, 2, 5]

    # the styled rendition hashes identically ONLY because normalize ran
    keep = exact_dup_groups(gated, id_col="doc_id", text_col="text_norm")
    keepers = sorted(r.keep_id for r in keep.collect())
    assert keepers == [1, 5]
    raw_groups = exact_dup_groups(
        docs.where(F.col("doc_id").isin(1, 2)), text_col="text"
    )
    assert raw_groups.count() == 2  # un-normalized texts do NOT collapse

    kept = gated.join(
        keep.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    ).withColumn("norm_bytes", F.length("text_norm").cast("long"))
    sharded = export_ordered_shards(
        kept, size_col="norm_bytes", shard_bytes=100, buckets=2
    )
    got = {r.doc_id: r.shard_id for r in sharded.collect()}
    assert set(got) == {1, 5}
    assert got[1] <= got[5]  # export preserves key order


def test_release_plan_has_no_global_exchange(spark):
    """The property that makes the pipeline survive 100 TB: no stage may
    funnel through a single partition (the naive global-window export
    would). Executed plan at sf0.001 via the driver entry."""
    import __spark_entry__ as entry

    df = entry.queries()["corpus_release_pipeline"](
        spark, "/root/testdata/sf0.001"
    )
    df.collect()  # AQE finalizes the plan only after execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
