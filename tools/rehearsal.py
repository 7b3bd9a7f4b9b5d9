"""Multi-generation scale rehearsal (VERDICT r2 next #8).

Runs CrawlDriver for ≥6 generations over a ~10^6-URL frontier (the sf0.1
seed replicated 7× with distinct seq/url suffixes), paced by
global_budget=150k/generation — constant work per generation, so the
wall-time series directly evidences that:

  * committed read-back truncates lineage (plans stay flat — no
    generation-over-generation plan growth),
  * the seen-set delta union holds up as seen grows by 150k rows/gen,
  * the scale-safe global rank's persist handle is released per
    generation (executor cache stays flat — persistent-RDD count is
    printed each generation).

Discover fan-out: ~10% of fetched pages link to one depth-1 child, so the
frontier also GROWS mid-run (the realistic shape).

Usage: python tools/rehearsal.py [--generations N] [--sf-dir DIR]
                                 [--seen-strategy exact|hybrid|cuckoo]
                                 [--replicas K]  (K x 150k seed URLs)
                                 [--checkpoint-mode full|delta]
                                 [--compact-every K]  (delta compaction interval)
Prints one markdown table + one JSON line (for BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ganda_spark.config import EngineConfig  # noqa: E402
from ganda_spark.session import get_spark  # noqa: E402
from ganda_spark.sources.frontier import seed_frontier  # noqa: E402
from ganda_spark.streaming.frontier_loop import CrawlDriver  # noqa: E402

REPLICAS = 7  # 150k × 7 = 1.05M seed URLs (--replicas overrides: 70 → 10.5M)
GLOBAL_BUDGET = 150_000


def build_seed(spark, sf_dir: str, replicas: int = REPLICAS):
    base = seed_frontier(spark, sf_dir)
    parts = []
    for r in range(replicas):
        parts.append(
            base.select(
                (F.col("seq") + F.lit(r * 10_000_000)).alias("seq"),
                F.concat(F.col("url"), F.lit(f"?r={r}")).alias("url"),
                "host",
                "priority",
                "context",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def discover(results):
    # ~10% of fetched pages link one depth-1 child (bounded fan-out);
    # the 1e9 offset stays clear of every replica's seed-seq range
    return results.where(
        (F.col("seq") % 10 == 0) & (~F.col("url").contains("/next"))
    ).select(
        (F.col("seq") + 1_000_000_000).alias("seq"),
        F.concat(F.col("url"), F.lit("/next")).alias("url"),
        "host",
        "priority",
        "context",
    )


def main() -> int:
    gens = 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--generations" in sys.argv:
        gens = int(sys.argv[sys.argv.index("--generations") + 1])
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    strategy = "exact"
    if "--seen-strategy" in sys.argv:
        strategy = sys.argv[sys.argv.index("--seen-strategy") + 1]
    replicas = REPLICAS
    if "--replicas" in sys.argv:
        replicas = int(sys.argv[sys.argv.index("--replicas") + 1])
    ckpt_mode = "full"
    if "--checkpoint-mode" in sys.argv:
        ckpt_mode = sys.argv[sys.argv.index("--checkpoint-mode") + 1]
    compact_every = 8
    if "--compact-every" in sys.argv:
        compact_every = int(sys.argv[sys.argv.index("--compact-every") + 1])
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark("rehearsal", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = tempfile.mkdtemp(prefix="rehearsal-ckpt-")
    cfg = EngineConfig(
        retries=1,
        request_workers=cores,
        per_host_budget=1 << 30,  # pacing comes from the global budget
        fetch_cpu_work=5,  # light CPU realism; the loop is what's measured
    )
    driver = CrawlDriver(
        spark, cfg, ckpt, discover=discover, global_budget=GLOBAL_BUDGET,
        seen_strategy=strategy, checkpoint_mode=ckpt_mode,
        compact_every=compact_every,
    )
    seed = build_seed(spark, sf_dir, replicas)

    gen, frontier, seen = driver.load_state(seed)
    rows = []
    for g in range(gen, gen + gens):
        if frontier.isEmpty():
            break
        t0 = time.time()
        frontier, seen, m = driver.run_generation(g, frontier, seen)
        wall = time.time() - t0
        n_persist = spark.sparkContext._jsc.getPersistentRDDs().size()
        rows.append(
            {
                "gen": g,
                "wall_s": round(wall, 2),
                "eligible": m["eligible"],
                "released": m["released"],
                "results": m["results"],
                "errors": m["errors"],
                "dedup_dropped": m["dedup_dropped"],
                "hosts": m["released_hosts"],
                "persistent_rdds": n_persist,
            }
        )
        print(
            f"gen {g}: wall={wall:.2f}s released={m['released']} "
            f"results={m['results']} persistentRDDs={n_persist}",
            file=sys.stderr,
        )

    print("| gen | wall s | eligible | released | results | errors | dedup dropped | hosts | persistent RDDs |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['gen']} | {r['wall_s']} | {r['eligible']} | {r['released']} "
            f"| {r['results']} | {r['errors']} | {r['dedup_dropped']} "
            f"| {r['hosts']} | {r['persistent_rdds']} |"
        )
    steady = [r["wall_s"] for r in rows[1:]]
    flat = max(steady) / min(steady) if steady else 0.0
    summary = {
        "metric": f"rehearsal per-generation wall ({replicas * 150_000}-URL frontier, global_budget=150k)",
        "generations": len(rows),
        "walls_s": [r["wall_s"] for r in rows],
        "steady_spread": round(flat, 3),
        "persistent_rdds": [r["persistent_rdds"] for r in rows],
        "cores": cores,
        "sf": sf_dir.rsplit("sf", 1)[-1],
        "seen_strategy": strategy,
        "checkpoint_mode": ckpt_mode,
        "compact_every": compact_every if ckpt_mode == "delta" else None,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
