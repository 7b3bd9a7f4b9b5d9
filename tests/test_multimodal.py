"""Multimodal plumbing: binary table shape, Arrow decode/resize/frame-sample
passes (deterministic fake decode — real pixel work is honestly gated on
PIL/ffmpeg which this container lacks)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ganda_spark.operators.multimodal import (
    _decode_real,
    binary_meta,
    decode_meta,
    resize_meta,
    sample_frames,
    to_binary_table,
)


def _bin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return to_binary_table(docs)


def test_real_decoder_is_gated(spark):
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        _decode_real(b"xx", "image/jpeg")


def test_decode_deterministic_across_partitioning(spark, sf_dir):
    b = _bin(spark, sf_dir)
    one = decode_meta(b.repartition(1)).orderBy("doc_id").collect()
    many = decode_meta(b.repartition(16)).orderBy("doc_id").collect()
    assert one == many
    assert all(64 <= r["width"] < 64 + 1920 for r in one)


def test_resize_never_upscales_and_fits_box(spark, sf_dir):
    out = resize_meta(_bin(spark, sf_dir), max_w=512, max_h=512)
    rows = out.collect()
    for r in rows:
        assert r["out_w"] <= 512 and r["out_h"] <= 512
        assert r["scale_bp"] <= 10000  # never upscale
        assert r["out_w"] <= r["src_w"] and r["out_h"] <= r["src_h"]
    # small sources pass through untouched
    small = [r for r in rows if r["src_w"] <= 512 and r["src_h"] <= 512]
    assert all(
        r["scale_bp"] == 10000 and (r["out_w"], r["out_h"]) == (r["src_w"], r["src_h"])
        for r in small
    )


def test_frame_sample_video_only_k_rows(spark, sf_dir):
    b = _bin(spark, sf_dir)
    frames = sample_frames(b, k=4)
    n_videos = b.where(F.col("media_type") == "video/mp4").count()
    assert frames.count() == n_videos * 4
    per_doc = frames.groupBy("doc_id").count()
    assert per_doc.where(F.col("count") != 4).count() == 0
    # offsets strictly increasing within a doc, first frame at t=0
    firsts = frames.where(F.col("frame_idx") == 0)
    assert firsts.where(F.col("offset_ms") != 0).count() == 0
    bad = (
        frames.alias("a")
        .join(frames.alias("b"), (F.col("a.doc_id") == F.col("b.doc_id"))
              & (F.col("b.frame_idx") == F.col("a.frame_idx") + 1))
        .where(F.col("b.offset_ms") <= F.col("a.offset_ms"))
    )
    assert bad.count() == 0


def test_binary_meta_pure_expressions(spark, sf_dir):
    out = binary_meta(_bin(spark, sf_dir))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "EvalPython" not in plan
