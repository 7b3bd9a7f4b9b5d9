"""Per-query isolation bench (guide §1.1/§1.4) — ADDITIVE harness; bench.py
is frozen for the driver's measurement and is deliberately untouched.

Times individual declared queries through the noop sink (all columns
computed, no sink cost), labels each job, and can dump
`.explain("formatted")` for the plan-audit artifacts under plans/r07/.

Usage:
  python bench_extra.py --queries corpus_clean_pipeline,curate_semantic
  python bench_extra.py --queries all --repeat 2
  python bench_extra.py --explain plans/r07 --tag before --queries a,b
  SPARK_GRAFT_SF_DIR=/tmp/sfbig python bench_extra.py --queries ...

Prints one JSON line: {"queries": {name: best_sec}, "samples": {...}}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# the bench.py throughput/headline names worth isolating, in bench order
DEFAULT_QUERIES = [
    "corpus_clean_pipeline",
    "curate_semantic",
    "dedup_semantic_media",
    "corpus_release_pipeline",
    "curate_keep_best",
    "dedup_semantic",
    "dedup_minhash_incremental",
    "text_decontam",
    "sim_ivf_kmeans_topk",
    "crawl_trap_filter",
    "f8_rfc_robots",
    "dedup_semantic_capped",
    "sim_recall_report",
    "dedup_semantic_incremental",
    "crawl_pagerank_normalized",
    "curate_corpus",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "t6_envelope",
    "text_fingerprint",
    "mm_embed",
    "mm_decode_real",
    "dedup_media_minhash",
    "dedup_spans_minhash",
    "text_extract_html",
    "text_boilerplate_removal",
    "text_normalize",
    "text_quality_gopher",
    "corpus_export_shards",
    "k1_crawl_pipeline",
    "f10_bloom_filter",
    "f5_throttle_waves",
    "s10_span_extract",
    "f9_priority_pop",
    "sim_topk_brute",
    "sim_ann_topk",
    "mm_decode_stub",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="all")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None, help="dir to write plans into")
    ap.add_argument("--tag", default="before", help="plan filename suffix")
    ap.add_argument("--no-time", action="store_true", help="explain only")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from ganda_spark.session import get_spark

    spark = get_spark("ganda-bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qreg = entry.queries()
    names = DEFAULT_QUERIES if args.queries == "all" else args.queries.split(",")
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = qreg[name]
        if args.explain:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            os.makedirs(args.explain, exist_ok=True)
            with open(f"{args.explain}/{name}_{args.tag}.txt", "w") as f:
                f.write(buf.getvalue())
        if args.no_time:
            continue
        best = None
        runs = []
        for _ in range(max(1, args.repeat)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            runs.append(dt)
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        timings[name] = best
        samples[name] = runs
        print(f"## {name}: {best:.3f}s {runs}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cores": CPUS, "queries": timings,
                      "samples": samples}))


if __name__ == "__main__":
    main()
