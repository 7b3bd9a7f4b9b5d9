"""The iterative crawl driver — ganda's channel cascade re-expressed as a
micro-batch generation loop (SURVEY.md §3.1 step 5).

Per generation:
  frontier → anti-join(seen) → robots → politeness pop → fetch →
  results/errors; deferred rows + newly-discovered URLs become the next
  generation's frontier; seen set grows by the released URLs; everything
  commits to the CheckpointStore (Iceberg-snapshot stand-in) so a killed
  run resumes exactly where the last manifest committed.

Retry deferral across generations (F4's deferred-row re-queue): rows that
exhausted in-UDF retries re-enter the frontier with attempt+1 and a
not_before generation; they are withheld from pop until then — the
scale-safe version of per-task backoff sleeps.

Metrics (north rule: fetch/dedup/defer per partition) come from
df.observe() accumulators — no extra actions.
"""

from __future__ import annotations

import itertools
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession

# Observation names must be session-unique; a bare "gen0" collides when two
# drivers run in one SparkSession (tests, notebooks)
_OBS_COUNTER = itertools.count()
from pyspark.sql import functions as F

from ganda_spark.config import EngineConfig
from ganda_spark.operators.fetch import mock_fetch_udf, split_results
from ganda_spark.operators.politeness import partition_for_fetch, pop_batch, robots_gate
from ganda_spark.operators.seen import filter_unseen_exact
from ganda_spark.streaming.checkpoint import CheckpointStore

FRONTIER_SCHEMA = (
    "seq long, url string, host string, priority int, context array<string>, "
    "attempt int, not_before int"
)


def _with_retry_cols(frontier: DataFrame) -> DataFrame:
    out = frontier
    if "attempt" not in out.columns:
        out = out.withColumn("attempt", F.lit(0))
    if "not_before" not in out.columns:
        out = out.withColumn("not_before", F.lit(0))
    return out


class CrawlDriver:
    def __init__(
        self,
        spark: SparkSession,
        cfg: EngineConfig,
        checkpoint_dir: str,
        robots: DataFrame | None = None,
        discover: Callable[[DataFrame], DataFrame] | None = None,
        max_redelivery: int = 2,
        fetcher: Callable[[DataFrame, EngineConfig], DataFrame] | None = None,
        global_budget: int | None = None,
        seen_strategy: str = "exact",
    ):
        """discover: results DataFrame → new frontier rows
        (seq, url, host, priority, context) — e.g. extract_urls over span
        docs keyed by the fetched URL.

        fetcher: the fetch stage (frontier, cfg) → fetched DataFrame;
        defaults to the deterministic mock. Pass
        operators.http_fetch.http_fetch_udf for a live crawl.

        global_budget: optional per-generation release cap across ALL hosts
        (F5 at frontier scale) — the scale-safe rank inside pop_batch
        persists one intermediate per generation; this loop owns those
        handles and unpersists them after each generation commits, so the
        executor cache stays flat over arbitrarily many generations
        (VERDICT r2 #1).

        seen_strategy: 'exact' (anti-join the full eligible frontier — the
        correctness oracle), 'hybrid' (the 10^10 path: a driver-held
        Bloom filter, grown per generation via a treeAggregate over just
        that generation's newly-seen delta, splits the frontier so only
        bloom-positive rows shuffle against the seen table; result is
        identical to 'exact' by construction — see
        operators.seen.filter_unseen_hybrid), or 'cuckoo' (same split with
        a CuckooFilter prefilter — choose it when the crawl needs
        RETRACTION, e.g. re-crawl scheduling deletes a url to make it
        fetchable again; merge spills to an overflow set so membership
        stays no-false-negative). On resume the prefilter is rebuilt once
        from the committed seen table."""
        self.spark = spark
        self.cfg = cfg
        self.store = CheckpointStore(checkpoint_dir)
        self.robots = robots
        self.discover = discover
        self.max_redelivery = max_redelivery
        self.fetcher = fetcher or mock_fetch_udf
        self.global_budget = global_budget
        if seen_strategy not in ("exact", "hybrid", "cuckoo"):
            raise ValueError(f"unknown seen_strategy {seen_strategy!r}")
        self.seen_strategy = seen_strategy
        self._bloom = None  # lazily built/grown prefilter (bloom OR cuckoo)

    # -- resume -------------------------------------------------------------

    def load_state(self, seed: DataFrame) -> tuple[int, DataFrame, DataFrame]:
        """(next_gen, frontier, seen) — from the latest committed snapshot,
        or generation 0 with the seed frontier."""
        snap = self.store.latest()
        if snap is None:
            empty_seen = self.spark.createDataFrame([], "url string")
            return 0, _with_retry_cols(seed), empty_seen
        frontier = self.store.read(self.spark, snap.generation, "frontier")
        seen = self.store.read(self.spark, snap.generation, "seen")
        if self.seen_strategy == "hybrid":
            # resume: rebuild the bloom ONCE from the committed seen table
            # (treeAggregate — sqrt(P) driver ingress, operators/seen.py)
            from ganda_spark.operators.seen import build_bloom_tree

            self._bloom = build_bloom_tree(
                seen, n_bits=self.cfg.seen_bloom_bits,
                n_hashes=self.cfg.seen_bloom_hashes,
            )
        elif self.seen_strategy == "cuckoo":
            from ganda_spark.operators.cuckoo import build_cuckoo

            self._bloom = build_cuckoo(seen, n_buckets=self.cfg.seen_cuckoo_buckets)
        return snap.generation + 1, frontier, seen

    # -- one generation -------------------------------------------------------

    def run_generation(
        self, gen: int, frontier: DataFrame, seen: DataFrame
    ) -> tuple[DataFrame, DataFrame, dict]:
        """Returns (next_frontier, next_seen, metrics) and commits the
        snapshot. All accounting happens through observe() — one pass."""
        cfg = self.cfg
        eligible = frontier.where(F.col("not_before") <= gen)
        held = frontier.where(F.col("not_before") > gen)

        # metrics without extra actions: observe() accumulators fill when
        # the committed writes execute the plan (north rule: fetch/dedup/
        # defer metrics per generation)
        uid = next(_OBS_COUNTER)
        obs_eligible = Observation(f"g{gen}-{uid}-eligible")
        eligible = eligible.observe(obs_eligible, F.count(F.lit(1)).alias("n"))
        if self.seen_strategy in ("hybrid", "cuckoo"):
            from ganda_spark.operators.seen import BloomFilter, filter_unseen_hybrid

            if self._bloom is None:
                if self.seen_strategy == "cuckoo":
                    from ganda_spark.operators.cuckoo import CuckooFilter

                    self._bloom = CuckooFilter(cfg.seen_cuckoo_buckets)
                else:
                    self._bloom = BloomFilter(
                        cfg.seen_bloom_bits, cfg.seen_bloom_hashes
                    )
            unseen = filter_unseen_hybrid(eligible, seen, self._bloom)
        else:
            unseen = filter_unseen_exact(eligible, seen)
        obs_unseen = Observation(f"g{gen}-{uid}-unseen")
        unseen = unseen.observe(obs_unseen, F.count(F.lit(1)).alias("n"))
        if self.robots is not None:
            allowed, _blocked = robots_gate(unseen, self.robots)
            # F7×F8: robots crawl-delay caps each host's per-generation pop
            from ganda_spark.operators.robots import crawl_delay_budgets

            budgets = crawl_delay_budgets(
                self.robots, window_ms=1000, default_budget=cfg.per_host_budget
            )
        else:
            allowed = unseen
            budgets = None
        gen_caches: list[DataFrame] = []
        released, deferred = pop_batch(
            allowed,
            cfg,
            global_budget=self.global_budget,
            host_budgets=budgets,
            cache_out=gen_caches,
        )

        obs = Observation(f"g{gen}-{uid}-released")
        placed = partition_for_fetch(released, cfg).observe(
            obs,
            F.count(F.lit(1)).alias("released_rows"),
            # politeness fan-out metric: distinct hosts this generation
            # touches (approx — rides the same pass, no extra action)
            F.approx_count_distinct("host").alias("released_hosts"),
        )
        # persist the WHOLE fetch output: results, errors, redeliver and
        # perma_failed are all derived from it, and without the persist each
        # downstream action re-executes the nondeterministic fetch stage —
        # wasted CPU with the mock, duplicate live HTTP requests and
        # split-inconsistency (a URL seen AND redelivered) with a real
        # fetcher (VERDICT r1 #4 / ADVICE r1)
        fetched = self.fetcher(placed, cfg).persist()
        results, errors = split_results(fetched)

        # F4: exhausted rows re-enter with attempt+1 and a backoff horizon
        redeliver = (
            errors.where(F.col("attempt") + 1 <= self.max_redelivery)
            .select(
                "seq", "url", "host", "priority", "context",
                (F.col("attempt") + 1).alias("attempt"),
                F.lit(gen + 2).alias("not_before"),  # skip one generation
            )
        )

        next_frontier = deferred.select(*redeliver.columns).unionByName(
            held.select(*redeliver.columns)
        ).unionByName(redeliver)

        if self.discover is not None:
            discovered = _with_retry_cols(self.discover(results)).select(
                *redeliver.columns
            )
            next_frontier = next_frontier.unionByName(discovered)

        # seen = fetched OK ∪ permanently failed. NOT the redelivered rows —
        # they must survive the next generation's anti-join.
        # Scale shape: distinct() ONLY the generation's new URLs (they may
        # repeat within a generation), never the accumulated seen set — the
        # released rows passed the anti-join, so new ∩ seen = ∅ by
        # construction and the union needs no re-shuffle of 10^10 old rows.
        perma_failed = errors.where(F.col("attempt") + 1 > self.max_redelivery)
        newly_seen = (
            results.select("url").unionByName(perma_failed.select("url")).distinct()
        )
        next_seen = seen.unionByName(newly_seen)

        # materialize the fetch ONCE: every metric/write below reads the
        # persisted `fetched`
        fetched.count()
        n_results = results.count()

        def _obs_or(observation, key, fallback_df):
            # AQE's empty-relation propagation can eliminate a CollectMetrics
            # node outright (empty generation) — fall back to a direct count
            try:
                return int(observation.get[key])
            except Exception:
                return fallback_df.count()

        n_eligible = _obs_or(obs_eligible, "n", eligible)
        n_unseen = _obs_or(obs_unseen, "n", unseen)
        metrics = {
            "generation": gen,
            "eligible": n_eligible,
            "dedup_dropped": n_eligible - n_unseen,
            "released": _obs_or(obs, "released_rows", released),
            "released_hosts": _obs_or(
                obs, "released_hosts", released.select("host").distinct()
            ),
            "results": n_results,
            "errors": errors.count(),
        }
        self.store.commit(
            gen,
            {
                "results": results,
                "errors": errors,
                "frontier": next_frontier,
                "seen": next_seen,
            },
            metrics,
        )
        # read back the committed state: truncates lineage, keeps plans flat
        committed_frontier = self.store.read(self.spark, gen, "frontier")
        committed_seen = self.store.read(self.spark, gen, "seen")
        if self.seen_strategy == "hybrid":
            # grow the bloom by THIS generation's delta only — a
            # treeAggregate over newly_seen (released-count rows), never a
            # rescan of the accumulated seen table
            from ganda_spark.operators.seen import build_bloom_tree

            delta = build_bloom_tree(
                newly_seen, n_bits=self.cfg.seen_bloom_bits,
                n_hashes=self.cfg.seen_bloom_hashes,
            )
            self._bloom = self._bloom.union(delta)
        elif self.seen_strategy == "cuckoo":
            # same delta-only discipline; fingerprint re-insertion merge
            # spills to the overflow set rather than ever dropping a member
            from ganda_spark.operators.cuckoo import build_cuckoo

            delta = build_cuckoo(
                newly_seen, n_buckets=self.cfg.seen_cuckoo_buckets
            )
            self._bloom = self._bloom.merge(delta)
        fetched.unpersist()
        for handle in gen_caches:  # scale-safe-rank intermediates: release
            handle.unpersist()  # after the generation's writes committed
        return committed_frontier, committed_seen, metrics

    # -- full loop -------------------------------------------------------------

    def run(self, seed: DataFrame, max_generations: int = 10) -> list[dict]:
        gen, frontier, seen = self.load_state(seed)
        all_metrics = []
        for g in range(gen, gen + max_generations):
            if frontier.isEmpty():
                break
            frontier, seen, metrics = self.run_generation(g, frontier, seen)
            all_metrics.append(metrics)
        return all_metrics
