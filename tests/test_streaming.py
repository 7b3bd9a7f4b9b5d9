"""Structured Streaming ingest: URL files arriving in a directory are
crawled exactly once per file, results append per micro-batch."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from ganda_spark.config import EngineConfig
from ganda_spark.streaming.stream_source import start_streaming_crawl


def _write_url_file(path, start, n):
    with open(path, "w") as f:
        for i in range(start, start + n):
            f.write(f"http://host-{i % 5}.test/stream/{i}\tctx{i}\n")


def test_streaming_stateful_dedup(spark, tmp_path):
    """dropDuplicates state store: a url arriving in TWO files (across
    micro-batches, one file per trigger) is fetched exactly once."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_url_file(os.path.join(in_dir, "a.txt"), 0, 40)
    _write_url_file(os.path.join(in_dir, "b.txt"), 20, 40)  # 20..39 overlap

    cfg = EngineConfig(retries=1, request_workers=4)
    q = start_streaming_crawl(
        spark, in_dir, out_dir, ckpt, cfg, mock=True,
        max_files_per_trigger=1, dedupe_stream=True,
    )
    q.awaitTermination(120)
    results = spark.read.parquet(os.path.join(out_dir, "results"))
    errors = spark.read.parquet(os.path.join(out_dir, "errors"))
    assert results.count() + errors.count() == 60  # not 80
    assert results.select("url").distinct().count() == results.count()


def test_streaming_live_fetch_once_per_url(spark, tmp_path):
    """Regression (same class as the frontier-loop one): the results and
    errors writes each re-ran the fetch — with a live fetcher every URL was
    requested twice per micro-batch. Echoserver hit counter pins 1×."""
    from ganda_spark.echoserver import Echoserver

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    with Echoserver() as srv:
        with open(os.path.join(in_dir, "a.txt"), "w") as f:
            for i in range(30):
                f.write(srv.url_for(f"s/{i}") + "\n")
        cfg = EngineConfig(retries=0, request_workers=2)
        q = start_streaming_crawl(
            spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
            cfg, mock=False,
        )
        q.awaitTermination(120)
        hits = srv.hits
        dupes = {p: n for p, n in hits.items() if n != 1}
        assert len(hits) == 30 and not dupes, dupes


def test_streaming_crawl_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_url_file(os.path.join(in_dir, "a.txt"), 0, 50)
    _write_url_file(os.path.join(in_dir, "b.txt"), 50, 30)

    cfg = EngineConfig(retries=1, request_workers=4)
    q = start_streaming_crawl(spark, in_dir, out_dir, ckpt, cfg, mock=True)
    q.awaitTermination(120)

    results = spark.read.parquet(os.path.join(out_dir, "results"))
    errors = spark.read.parquet(os.path.join(out_dir, "errors"))
    assert results.count() + errors.count() == 80
    assert results.select("url").distinct().count() == results.count()
    # context rode through the stream (P4)
    assert results.where(F.col("context").isNull()).count() == 0

    # restart with a NEW file: only the new rows are processed
    _write_url_file(os.path.join(in_dir, "c.txt"), 100, 20)
    q2 = start_streaming_crawl(spark, in_dir, out_dir, ckpt, cfg, mock=True)
    q2.awaitTermination(120)
    results2 = spark.read.parquet(os.path.join(out_dir, "results"))
    errors2 = spark.read.parquet(os.path.join(out_dir, "errors"))
    assert results2.count() + errors2.count() == 100  # +20, not re-crawled
    assert results2.select("url").distinct().count() == results2.count()
