"""Release-pipeline scale rehearsal (r6): normalize → Gopher facet gate →
exact dedup on normalized text → ordered shard export, at ~24× the sf0.1
documents table (120k docs, ~7M words), with planted exact duplicates,
STYLED duplicates (NBSP-ized — only normalization collapses them), and
junk documents the gate must drop.

Synthesis is pure Column (spark.range + hash-indexed vocab — no driver
data), mirroring tools/rehearse_semdedup.py. Each stage is timed by a
noop materialize; the end-to-end run materializes the release manifest.

Usage: python tools/rehearse_release.py [--docs N] [--cores K]
Prints a markdown table + one JSON line (for BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ganda_spark.session import get_spark  # noqa: E402
from ganda_spark.functions.normalize import normalize_text  # noqa: E402
from ganda_spark.functions.quality import gopher_quality  # noqa: E402
from ganda_spark.operators.dedup import exact_dup_groups  # noqa: E402
from ganda_spark.operators.sampling import (  # noqa: E402
    export_ordered_shards,
    shard_manifest,
)

VOCAB = (
    "the of and to in that have with for was not are but this from they "
    "word corpus line page host crawl token shard"
).split()


def synth(spark, n: int):
    """n docs: ids 0..n-1; every 10th doc is an EXACT dup of the block
    head, every 20th a STYLED dup (spaces → NBSP); every 17th is junk
    (numeric words — fails the alpha gate). ~40-120 words each, a newline
    every 12 words. Pure projection at any scale."""
    elt = ", ".join(f"'{w}'" for w in VOCAB)
    src = (
        "CASE WHEN id % 20 = 19 THEN id - 19 "
        "WHEN id % 10 = 9 THEN id - 9 ELSE id END"
    )
    words = (
        f"transform(sequence(1, 40 + pmod({src}, 81)), i -> "
        f"concat(elt(1 + pmod(hash({src} * 1000 + i), {len(VOCAB)}), {elt}), "
        f"CASE WHEN i % 12 = 0 THEN '\\n' ELSE ' ' END))"
    )
    text = (
        f"CASE WHEN id % 17 = 3 THEN repeat('12345 67890 ', 20) "
        f"ELSE array_join({words}, '') END"
    )
    styled = "CASE WHEN id % 20 = 19 THEN replace(_t, ' ', ' ') ELSE _t END"
    return (
        spark.range(n)
        .withColumn("_t", F.expr(text))
        .select(
            F.col("id").alias("doc_id"),
            F.expr(styled).alias("text"),
        )
    )


def _mat(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> int:
    docs_n = 120_000
    cores = 32
    args = sys.argv[1:]
    if "--docs" in args:
        docs_n = int(args[args.index("--docs") + 1])
    if "--cores" in args:
        cores = int(args[args.index("--cores") + 1])
    spark = get_spark("rehearse-release", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth(spark, docs_n)
    docs.write.mode("overwrite").parquet("/tmp/rehearse_release_docs")
    docs = spark.read.parquet("/tmp/rehearse_release_docs")

    normed = normalize_text(docs).select("doc_id", "text_norm")
    t_norm = _mat(normed)

    faceted = gopher_quality(normed, text_col="text_norm")
    t_facets = _mat(faceted)

    t0 = time.time()
    gated = faceted.where(
        (F.col("alpha_word_bp") >= 8000)
        & (F.col("stop_hits") >= 1)
        & (F.col("n_words") >= 20)
        & (F.col("dup_line_bp") <= 10_000)
    ).select("doc_id", "text_norm")
    keep = exact_dup_groups(gated, id_col="doc_id", text_col="text_norm").select(
        F.col("keep_id").alias("doc_id")
    )
    kept = gated.join(keep, "doc_id", "left_semi").select(
        "doc_id", F.length("text_norm").cast("long").alias("norm_bytes")
    )
    sharded = export_ordered_shards(
        kept, size_col="norm_bytes", shard_bytes=1_000_000, buckets=64
    )
    manifest = shard_manifest(sharded, size_col="norm_bytes").collect()
    t_e2e = round(time.time() - t0, 2)

    n_kept = sum(r.n_docs for r in manifest)
    n_bytes = sum(r.total_bytes for r in manifest)
    out = {
        "docs": docs_n,
        "normalize_sec": t_norm,
        "normalize_docs_per_sec": round(docs_n / t_norm),
        "facets_sec": t_facets,
        "facets_docs_per_sec": round(docs_n / t_facets),
        "gate_dedup_export_sec": t_e2e,
        "released_docs": n_kept,
        "released_bytes": n_bytes,
        "shards": len(manifest),
    }
    print("| stage | wall | docs/s |")
    print("|---|---|---|")
    print(f"| normalize (projection) | {t_norm} s | {out['normalize_docs_per_sec']} |")
    print(f"| gopher facets (projection) | {t_facets} s | {out['facets_docs_per_sec']} |")
    print(f"| gate→dedup→export→manifest | {t_e2e} s | — |")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
